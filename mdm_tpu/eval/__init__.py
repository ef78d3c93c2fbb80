"""Evaluation: frozen evaluator nets, metrics, harnesses, classifiers."""
from . import classifiers, harness, metrics, networks, stgcn  # noqa: F401
from .evaluator import EvaluatorWrapper  # noqa: F401
from .harness import EvalConfig, GeneratedMotionLoader, MMGeneratedLoader, evaluation  # noqa: F401
