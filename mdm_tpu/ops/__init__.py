"""Pallas TPU kernels for hot ops.

`enable_pallas_attention()` flips the model's attention layers to the fused
VMEM-resident kernel (mdm_tpu.ops.attention); the pure-XLA path remains the
default and the fallback on non-TPU backends.
"""
from . import (  # noqa: F401
    attention,
    attention_block,
    attention_dropout,
    attention_train_block,
    attention_v2,
)
from .attention import fused_attention, xla_attention  # noqa: F401
from .attention_dropout import fused_dropout_attention  # noqa: F401
from .attention_train_block import fused_train_attention_block  # noqa: F401

_PALLAS_ATTENTION = False
_PALLAS_TRAIN_ATTENTION = False
_PALLAS_TRAIN_BLOCK = False


def tpu_backend() -> bool:
    """True when the default backend is TPU hardware (the Pallas kernels
    need the TPU PRNG/VMEM model). The dev tunnel registers the chip under
    the experimental 'axon' platform name — still a TPU v5e."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


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


def enable_pallas_train_block(enabled: bool = True):
    """Route the WHOLE training self-attention block — q/k/v/out projections
    + attention + in-kernel PRNG dropout — through the single fused Pallas
    kernel with a flash-style seed-replay custom VJP
    (ops/attention_train_block.py). Supersedes enable_pallas_train_attention
    when both are on. Opt-in; measured in docs/BENCHMARKS.md."""
    global _PALLAS_TRAIN_BLOCK
    _PALLAS_TRAIN_BLOCK = enabled


def pallas_train_block_enabled() -> bool:
    return _PALLAS_TRAIN_BLOCK
