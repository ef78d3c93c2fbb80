"""Evaluation: frozen evaluator nets, metrics, harnesses, classifiers."""
from . import (  # noqa: F401
    classifiers,
    harness,
    metrics,
    networks,
    stgcn,
    t2m_generator,
    train_evaluators,
)
from .evaluator import EvaluatorWrapper  # noqa: F401
from .harness import EvalConfig, GeneratedMotionLoader, MMGeneratedLoader, evaluation  # noqa: F401
from .t2m_generator import T2MBaselineGenerator, T2MBaselineLoader, T2MBaselineMMLoader  # noqa: F401
