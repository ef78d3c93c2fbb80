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
    encoder_tail,
)
from .attention import fused_attention, xla_attention  # noqa: F401
from .attention_dropout import fused_dropout_attention  # noqa: F401
from .attention_train_block import fused_train_attention_block  # noqa: F401
from .encoder_tail import (  # noqa: F401
    fused_encoder_tail,
    fused_encoder_tail_inference,
)

_PALLAS_ATTENTION = False
_PALLAS_TRAIN_ATTENTION = False
# None = auto: make_train_step turns the fused train-block kernel ON for
# single-device steps (it beats XLA by ~9% at the flagship shape, measured
# in docs/BENCHMARKS.md) AND for multi-device pure-DP meshes, where the
# step wraps the loss+grad in `jax.shard_map` over the batch axes so each
# shard runs its own pallas_call (a bare pallas_call has no SPMD
# partitioning rule — the shard_map wrapper is what carries the kernel win
# onto meshes; r5). Only tensor-parallel ('model'-axis) meshes keep the
# XLA path, where Megatron sharding splits the very matmuls the kernel
# fuses. An explicit enable_pallas_train_block(True/False) always wins.
_PALLAS_TRAIN_BLOCK = None
_AUTO_TRAIN_BLOCK = False
# Same tri-state as the train block: None = auto (MotionGenerator turns it
# on for single-device sampling — it wins at both measured batch sizes,
# docs/BENCHMARKS.md — and for DP-mesh sampling via the same shard_map
# wrapper; off for TP sampling).
_PALLAS_SAMPLE_BLOCK = None
_AUTO_SAMPLE_BLOCK = False


def tpu_backend() -> bool:
    """True when the default backend is TPU hardware (the Pallas kernels
    need the TPU PRNG/VMEM model). The dev tunnel registers the chip under
    the experimental 'axon' platform name — still a TPU v5e."""
    import jax

    return jax.default_backend() in ("tpu", "axon")


# --------------------------------------------------------------------------
# Interpret mode (tests): run the kernels through the Pallas CPU interpreter
# end to end THROUGH the model layers, so the shard_map kernel path can be
# numerics-tested on the virtual 8-device CPU mesh. The TPU PRNG has no
# interpret lowering, so interpret runs are only valid where no bits are
# drawn (rate-0 / inference kernels) — exactly what the parity tests use.
_PALLAS_INTERPRET = False


def enable_pallas_interpret(enabled: bool = True):
    global _PALLAS_INTERPRET
    _PALLAS_INTERPRET = enabled


def pallas_interpret() -> bool:
    return _PALLAS_INTERPRET


def kernel_backend_ok() -> bool:
    """Layer gate: kernels need real TPU hardware, or interpret mode."""
    return tpu_backend() or _PALLAS_INTERPRET


# --------------------------------------------------------------------------
# shard_map support: when the train step / sampler wraps the model in a
# `jax.shard_map` over the mesh's batch axes, each shard runs its own
# pallas_call (a pallas_call has no SPMD partitioning rule, but per-shard
# programs need none). The wrapping code declares the batch axis names here
# at trace time; the layers then offset the kernels' PRNG seeds by
# (linear shard index) * local_batch. Both fused kernels seed per batch
# cell as `seed + program_id(0)`, so shard k's cell b seeds with
# seed + k*B_local + b == seed + b_global — the sharded kernel path is
# BITWISE identical to the single-device kernel path, and shards are
# decorrelated for free.
_SHARD_BATCH_AXES = None


def _set_shard_batch_axes(axes) -> None:
    """Declared by the shard_map body (trace time only); None clears."""
    global _SHARD_BATCH_AXES
    _SHARD_BATCH_AXES = tuple(axes) if axes else None


def shard_batch_axes():
    return _SHARD_BATCH_AXES


def shard_seed_offset(local_batch: int):
    """PRNG seed offset for the current shard: linear_shard_index * B_local
    (0 outside shard_map). int32 wraparound matches the kernels' own
    per-cell `seed + b` arithmetic, so parity with the single-device run
    survives overflow too."""
    import jax
    import jax.numpy as jnp

    axes = _SHARD_BATCH_AXES
    if not axes:
        return jnp.int32(0)
    idx = jnp.int32(0)
    for name in axes:
        size = jax.lax.psum(1, name)  # axis size, available on any backend
        idx = idx * size + jax.lax.axis_index(name)
    return idx * jnp.int32(local_batch)


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


def enable_pallas_train_block(enabled=True):
    """Route the WHOLE training self-attention block — q/k/v/out projections
    + attention + in-kernel PRNG dropout — through the single fused Pallas
    kernel with a flash-style seed-replay custom VJP
    (ops/attention_train_block.py). Supersedes enable_pallas_train_attention
    when both are on.

    Default (`None`) is AUTO: on for single-device train steps, off under a
    multi-device mesh (see the module-level note). Pass True/False to pin it
    either way; pass None to restore auto. Measured in docs/BENCHMARKS.md:
    39.7 vs XLA's 43.5 ms/step at B=128 bf16 flagship."""
    global _PALLAS_TRAIN_BLOCK
    _PALLAS_TRAIN_BLOCK = enabled


def pallas_train_block_enabled() -> bool:
    if _PALLAS_TRAIN_BLOCK is None:
        return _AUTO_TRAIN_BLOCK
    return _PALLAS_TRAIN_BLOCK


def enable_pallas_sample_block(enabled=True):
    """Route DETERMINISTIC (sampling/eval) self-attention through the
    forward-only whole-block kernel (projections + attention + out
    projection in one Pallas program, rate=0, no PRNG —
    ops/attention_train_block.py::fused_block_attention_inference).

    Default (`None`) is AUTO: on for single-device MotionGenerator
    sampling, off on a multi-device mesh (pallas_call is not
    SPMD-partitionable). Pass True/False to pin; None restores auto.
    Measured in docs/BENCHMARKS.md: 7.19/7.88 ms/sample at B=32/128 vs
    XLA's 7.65/8.88 in the 50-step CFG scan."""
    global _PALLAS_SAMPLE_BLOCK
    _PALLAS_SAMPLE_BLOCK = enabled


def pallas_sample_block_enabled() -> bool:
    if _PALLAS_SAMPLE_BLOCK is None:
        return _AUTO_SAMPLE_BLOCK
    return _PALLAS_SAMPLE_BLOCK


def _set_auto_sample_block(enabled: bool) -> None:
    """MotionGenerator's auto decision; only read while the explicit flag
    is None. Re-asserted before every sampling call (tracing is deferred),
    mirroring _set_auto_train_block."""
    global _AUTO_SAMPLE_BLOCK
    _AUTO_SAMPLE_BLOCK = enabled


def _set_auto_train_block(enabled: bool) -> None:
    """make_train_step's auto decision; only read while the explicit flag
    is None. Re-asserted before every step call so interleaved single- and
    multi-device steps in one process each trace with their own setting."""
    global _AUTO_TRAIN_BLOCK
    _AUTO_TRAIN_BLOCK = enabled


# Tri-state like the block kernels; auto (None) rides the SAME
# single-device signals make_train_step / MotionGenerator already assert.
# Shipped ON (auto): slope-measured wins over block-kernel-only at the
# flagship shape — train 39.9 -> 33.2 ms/step at B=128 bf16; sampling
# 7.19 -> 5.91 (B=32) and 7.88 -> 6.22 (B=128) ms/sample
# (docs/BENCHMARKS.md round-4 shootouts).
_PALLAS_ENCODER_TAIL = None


def enable_pallas_encoder_tail(enabled=True):
    """Route the encoder-layer TAIL — dropout(attn) + residual + LN1 +
    linear1/GELU/dropout/linear2/dropout + residual + LN2 — through one
    fused Pallas program per batch cell (ops/encoder_tail.py; seed-replay
    custom VJP in training, forward-only at rate 0 for sampling). The
    decoder's cross-attn->FFN half (norm2/linear1/linear2/norm3) uses the
    same kernel.

    `None` is AUTO, following the train/sample block signals: on for
    single-device steps/sampling, off under a multi-device mesh. Pass
    True/False to pin either way."""
    global _PALLAS_ENCODER_TAIL
    _PALLAS_ENCODER_TAIL = enabled


def pallas_encoder_tail_enabled(deterministic: bool) -> bool:
    if _PALLAS_ENCODER_TAIL is None:
        return _AUTO_SAMPLE_BLOCK if deterministic else _AUTO_TRAIN_BLOCK
    return _PALLAS_ENCODER_TAIL


# Tri-state; auto (None) = on whenever BOTH deterministic kernels it fuses
# (sample block + encoder tail) are on, i.e. it rides MotionGenerator's
# single-device / shard_map-DP auto signal. Sampling/eval only — the whole
# encoder layer (projections + attention + out proj + LN1 + FFN + LN2) runs
# as ONE Pallas program per batch cell, removing the per-layer [B,S,D] HBM
# round-trip at the block/tail boundary (ops/layer_inference.py).
_PALLAS_LAYER_INFERENCE = None


def enable_pallas_layer_inference(enabled=True):
    """Route deterministic self-attention ENCODER LAYERS through the fused
    whole-layer kernel (ops/layer_inference.py). `None` is AUTO (follows
    the sample-block + encoder-tail signals); True/False pins. False
    restores the round-4 two-kernel (block + tail) path for benchmarking."""
    global _PALLAS_LAYER_INFERENCE
    _PALLAS_LAYER_INFERENCE = enabled


def pallas_layer_inference_enabled() -> bool:
    if _PALLAS_LAYER_INFERENCE is None:
        return pallas_sample_block_enabled() and pallas_encoder_tail_enabled(True)
    return _PALLAS_LAYER_INFERENCE
