"""Pallas TPU kernels for hot ops.

`enable_pallas_attention()` flips the model's attention layers to the fused
VMEM-resident kernel (mdm_tpu.ops.attention); the pure-XLA path remains the
default and the fallback on non-TPU backends.
"""
from . import attention, attention_block, attention_dropout, attention_v2  # noqa: F401
from .attention import fused_attention, xla_attention  # noqa: F401
from .attention_dropout import fused_dropout_attention  # noqa: F401

_PALLAS_ATTENTION = False
_PALLAS_TRAIN_ATTENTION = False


def enable_pallas_attention(enabled: bool = True):
    global _PALLAS_ATTENTION
    _PALLAS_ATTENTION = enabled


def pallas_attention_enabled() -> bool:
    return _PALLAS_ATTENTION


def enable_pallas_train_attention(enabled: bool = True):
    """Route TRAINING self-attention (softmax-dropout-PV) through the
    fused Pallas kernel with in-kernel PRNG dropout + flash-style custom
    VJP (ops/attention_dropout.py). Opt-in; measured in docs/BENCHMARKS.md."""
    global _PALLAS_TRAIN_ATTENTION
    _PALLAS_TRAIN_ATTENTION = enabled


def pallas_train_attention_enabled() -> bool:
    return _PALLAS_TRAIN_ATTENTION
