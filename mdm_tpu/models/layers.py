"""Flax building blocks with PyTorch-checkpoint-compatible semantics.

The published MDM checkpoints were trained with `torch.nn.TransformerEncoder
/Decoder` (post-LayerNorm, GELU, specific dropout placement) and
`torch.nn.GRU`. These modules reproduce that math exactly — weight-for-weight
— so converted checkpoints produce identical outputs, while the layout is
TPU-friendly: batch-major `[B, S, D]`, masks as additive attention bias, all
heads in one fused projection feeding the MXU.

Reference behavior: torch.nn.TransformerEncoderLayer (post-norm), consumed at
/root/reference/model/mdm.py:75-98.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = jnp.dtype


def gelu_exact(x):
    """erf-based GELU — torch's F.gelu default, needed for checkpoint parity
    (jax.nn.gelu defaults to the tanh approximation)."""
    return jax.nn.gelu(x, approximate=False)


def sinusoidal_table(max_len: int, d_model: int) -> np.ndarray:
    """Classic sin/cos positional table [max_len, d_model] (f32 host const)."""
    position = np.arange(max_len, dtype=np.float64)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float64) * (-np.log(10000.0) / d_model))
    pe = np.zeros((max_len, d_model), dtype=np.float64)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe.astype(np.float32)


class DenseParams(nn.Module):
    """nn.Dense-identical param tree ({kernel, bias}) WITHOUT the matmul.

    Lets a fused Pallas kernel consume projection weights directly while
    keeping the checkpoint layout bit-compatible with nn.Dense (same scope
    name, same leaf names/shapes/initializers, and flax derives per-param
    init RNG from the path, so init values match too).
    """

    d_in: int
    d_out: int

    @nn.compact
    def __call__(self):
        return (
            self.param("kernel", nn.initializers.lecun_normal(),
                       (self.d_in, self.d_out)),
            self.param("bias", nn.initializers.zeros, (self.d_out,)),
        )


class LayerNormParams(nn.Module):
    """nn.LayerNorm-identical param tree ({scale, bias}) WITHOUT the math —
    same trick as DenseParams: a fused Pallas kernel consumes the weights
    while the checkpoint layout stays bit-compatible with nn.LayerNorm."""

    dim: int

    @nn.compact
    def __call__(self):
        return (
            self.param("scale", nn.initializers.ones, (self.dim,)),
            self.param("bias", nn.initializers.zeros, (self.dim,)),
        )


class MultiHeadAttention(nn.Module):
    """Scaled-dot-product attention matching torch.nn.MultiheadAttention.

    Params: q/k/v projections (converted from torch's packed in_proj) and an
    output projection. `attn_bias` is additive (`-inf` = masked), already
    broadcast to [B, 1|H, Sq, Sk].
    """

    num_heads: int
    d_model: int
    dropout: float = 0.0
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # [B, Sq, D]
        key: jnp.ndarray,  # [B, Sk, D]
        value: jnp.ndarray,  # [B, Sk, D]
        attn_bias: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        D, H = self.d_model, self.num_heads
        head_dim = D // H
        cdt = self.compute_dtype or query.dtype

        from ..ops import (
            kernel_backend_ok,
            pallas_attention_enabled,
            pallas_interpret,
            pallas_sample_block_enabled,
            pallas_train_attention_enabled,
            pallas_train_block_enabled,
            shard_seed_offset,
        )

        interp = pallas_interpret()

        # Deterministic whole-block path (sampling/eval): projections +
        # attention + out projection in one forward-only Pallas program
        # (ops/attention_train_block.py::fused_block_attention_inference).
        use_sample_block = (
            pallas_sample_block_enabled()
            and kernel_backend_ok()
            and deterministic  # forward-only kernel: no VJP, sampling/eval only
            and query is key and key is value  # self-attention only
            and (attn_bias is None or attn_bias.shape[-2] == 1)
            and D % 128 == 0
        )
        if use_sample_block:
            from ..ops.attention_train_block import (
                fused_block_attention_inference,
            )

            wq, bq = DenseParams(D, D, name="q_proj")()
            wk, bk = DenseParams(D, D, name="k_proj")()
            wv, bv = DenseParams(D, D, name="v_proj")()
            wo, bo = DenseParams(D, D, name="out_proj")()
            kpm = None
            if attn_bias is not None:
                kpm = attn_bias.reshape(attn_bias.shape[0], -1)[
                    :, -key.shape[1]:].astype(jnp.float32)
            return fused_block_attention_inference(
                query.astype(cdt), wq, bq, wk, bk, wv, bv, wo, bo,
                H, key_padding_mask=kpm, interpret=interp,
            )

        # Whole-block training path: q/k/v/out projections + attention +
        # in-kernel dropout as ONE Pallas program — q/k/v and the [B,H,S,S]
        # probabilities never round-trip HBM in either direction
        # (ops/attention_train_block.py, flash-style seed-replay VJP).
        use_train_block = (
            pallas_train_block_enabled()
            and kernel_backend_ok()  # kernel uses the TPU PRNG (except rate 0)
            and not deterministic
            # rate 0 is allowed under interpret: it draws no bits, which is
            # what makes the shard_map kernel path CPU-testable end to end.
            and (self.dropout > 0.0 or interp)
            and query is key and key is value  # self-attention only
            and (attn_bias is None or attn_bias.shape[-2] == 1)
            and D % 128 == 0
        )
        if use_train_block:
            from ..ops.attention_train_block import fused_train_attention_block

            wq, bq = DenseParams(D, D, name="q_proj")()
            wk, bk = DenseParams(D, D, name="k_proj")()
            wv, bv = DenseParams(D, D, name="v_proj")()
            wo, bo = DenseParams(D, D, name="out_proj")()
            kpm = None
            if attn_bias is not None:
                kpm = attn_bias.reshape(attn_bias.shape[0], -1)[
                    :, -key.shape[1]:].astype(jnp.float32)
            # Under shard_map the offset makes the per-cell kernel seeds
            # equal to the single-device run's (see ops.shard_seed_offset).
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            ) + shard_seed_offset(query.shape[0])
            return fused_train_attention_block(
                query.astype(cdt), wq, bq, wk, bk, wv, bv, wo, bo,
                H, self.dropout, seed, key_padding_mask=kpm, interpret=interp,
            )

        q = nn.Dense(D, name="q_proj", dtype=cdt)(query)
        k = nn.Dense(D, name="k_proj", dtype=cdt)(key)
        v = nn.Dense(D, name="v_proj", dtype=cdt)(value)

        # Training path: fused attention with in-kernel dropout (no
        # [B,H,S,S] prob/mask tensors in HBM, flash-style custom VJP).
        use_dropout_kernel = (
            pallas_train_attention_enabled()
            and kernel_backend_ok()  # kernel uses the TPU PRNG
            and not deterministic
            and self.dropout > 0.0
            and query.shape[1] == key.shape[1]
            and (attn_bias is None or attn_bias.shape[-2] == 1)
            and D % 128 == 0
        )
        if use_dropout_kernel:
            from ..ops.attention_dropout import fused_dropout_attention

            kpm = None
            if attn_bias is not None:
                kpm = attn_bias.reshape(attn_bias.shape[0], -1)[
                    :, -key.shape[1]:].astype(jnp.float32)
            seed = jax.random.randint(
                self.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
                dtype=jnp.int32,
            ) + shard_seed_offset(query.shape[0])
            out = fused_dropout_attention(
                q, k, v, H, self.dropout, seed, key_padding_mask=kpm,
                interpret=interp,
            )
            return nn.Dense(D, name="out_proj", dtype=cdt)(out.astype(cdt))

        use_v2 = (
            pallas_attention_enabled()
            and deterministic  # the fused kernel has no attention dropout
            and query.shape[1] == key.shape[1]
            # v2 handles row-broadcast (key padding) biases; full [.., Sq, Sk]
            # biases fall through to the einsum path.
            and (attn_bias is None or attn_bias.shape[-2] == 1)
            and D % 128 == 0
        )
        if use_v2:
            from ..ops.attention_v2 import fused_attention_v2

            kpm = None
            if attn_bias is not None:
                kpm = attn_bias.reshape(attn_bias.shape[0], -1)[
                    :, -key.shape[1]:].astype(jnp.float32)
            out = fused_attention_v2(q, k, v, H, key_padding_mask=kpm,
                                     interpret=interp)
            out = out.astype(cdt)
            return nn.Dense(D, name="out_proj", dtype=cdt)(out)

        split = lambda x: x.reshape(x.shape[0], x.shape[1], H, head_dim)
        q, k, v = split(q), split(k), split(v)
        # [B, H, Sq, Sk]
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(
            jnp.asarray(head_dim, dtype=cdt)
        )
        if attn_bias is not None:
            logits = logits + attn_bias.astype(logits.dtype)
        weights = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(cdt)
        if self.dropout > 0.0 and not deterministic:
            weights = nn.Dropout(rate=self.dropout)(weights, deterministic=False)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights, v)
        out = out.reshape(out.shape[0], out.shape[1], D)
        return nn.Dense(D, name="out_proj", dtype=cdt)(out)


def key_padding_bias(padding_mask: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """[B, Sk] bool (True = ignore) -> additive bias [B, 1, 1, Sk]."""
    if padding_mask is None:
        return None
    neg = jnp.asarray(-1e9, dtype=jnp.float32)
    return jnp.where(padding_mask, neg, 0.0)[:, None, None, :]


def _fused_tail(d_model, ff_size, dropout, activation, deterministic,
                module, names):
    """Fused-kernel layer tail (ops/encoder_tail.py) or None to fall back.

    Declares the norm/linear params through LayerNormParams/DenseParams so
    the checkpoint tree is bit-identical to the XLA branch; the returned
    callable maps (x, attn_out) -> layer output. Covers the encoder tail
    (norm1/linear1/linear2/norm2) and the decoder's cross-attn->FFN half
    (norm2/linear1/linear2/norm3)."""
    from ..ops import (
        kernel_backend_ok,
        pallas_encoder_tail_enabled,
        pallas_interpret,
        shard_seed_offset,
    )

    interp = pallas_interpret()
    if activation is not gelu_exact:  # kernel hardcodes exact-erf GELU
        return None
    if not (pallas_encoder_tail_enabled(deterministic) and kernel_backend_ok()):
        return None
    if d_model % 128 != 0 or ff_size % 128 != 0:
        return None
    if not deterministic and dropout <= 0.0 and not interp:
        return None  # the train variant exists for its in-kernel dropout;
        # rate 0 is allowed under interpret (draws no bits — CPU-testable)
    n1, l1, l2, n2 = names
    g1, bl1 = LayerNormParams(d_model, name=n1)()
    w1, b1 = DenseParams(d_model, ff_size, name=l1)()
    w2, b2 = DenseParams(ff_size, d_model, name=l2)()
    g2, bl2 = LayerNormParams(d_model, name=n2)()

    if deterministic:
        from ..ops.encoder_tail import fused_encoder_tail_inference

        return lambda x, attn: fused_encoder_tail_inference(
            x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, interpret=interp)

    from ..ops.encoder_tail import fused_encoder_tail

    seed = jax.random.randint(
        module.make_rng("dropout"), (), 0, jnp.iinfo(jnp.int32).max,
        dtype=jnp.int32,
    )
    # shard_map offset applied at call time (local batch known then); see
    # ops.shard_seed_offset — makes sharded kernel dropout bitwise equal to
    # the single-device run.
    return lambda x, attn: fused_encoder_tail(
        x, attn, g1, bl1, w1, b1, w2, b2, g2, bl2, dropout,
        seed + shard_seed_offset(x.shape[0]), interpret=interp)


class _SelfAttnParams(nn.Module):
    """MultiHeadAttention's exact param tree (q/k/v/out DenseParams) WITHOUT
    the math, so the fused whole-layer kernel can consume the weights while
    the checkpoint layout stays bit-identical to the MHA module."""

    d_model: int

    @nn.compact
    def __call__(self):
        D = self.d_model
        return (DenseParams(D, D, name="q_proj")(),
                DenseParams(D, D, name="k_proj")(),
                DenseParams(D, D, name="v_proj")(),
                DenseParams(D, D, name="out_proj")())


class TransformerEncoderLayer(nn.Module):
    """Post-LN encoder layer (torch default semantics)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    activation: Callable = gelu_exact
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x, padding_bias=None, deterministic: bool = True):
        from ..ops import (
            kernel_backend_ok,
            pallas_interpret,
            pallas_layer_inference_enabled,
        )

        # Whole-layer sampling/eval kernel: the ENTIRE post-LN layer as one
        # Pallas program per batch cell (ops/layer_inference.py) — bitwise
        # equal to the block+tail two-kernel path it supersedes, minus the
        # per-layer [B,S,D] HBM round-trip at their boundary.
        use_layer = (
            pallas_layer_inference_enabled()
            and kernel_backend_ok()
            and deterministic  # forward-only kernel
            and self.activation is gelu_exact  # kernel hardcodes exact GELU
            and (padding_bias is None or padding_bias.shape[-2] == 1)
            and self.d_model % 128 == 0 and self.ff_size % 128 == 0
        )
        if use_layer:
            from ..ops.layer_inference import fused_layer_inference

            ((wq, bq), (wk, bk), (wv, bv), (wo, bo)) = _SelfAttnParams(
                self.d_model, name="self_attn")()
            g1, bl1 = LayerNormParams(self.d_model, name="norm1")()
            w1, b1 = DenseParams(self.d_model, self.ff_size, name="linear1")()
            w2, b2 = DenseParams(self.ff_size, self.d_model, name="linear2")()
            g2, bl2 = LayerNormParams(self.d_model, name="norm2")()
            kpm = None
            if padding_bias is not None:
                kpm = padding_bias.reshape(padding_bias.shape[0], -1)[
                    :, -x.shape[1]:].astype(jnp.float32)
            cdt = self.compute_dtype or x.dtype
            return fused_layer_inference(
                x.astype(cdt), wq, bq, wk, bk, wv, bv, wo, bo,
                g1, bl1, w1, b1, w2, b2, g2, bl2,
                self.num_heads, key_padding_mask=kpm,
                interpret=pallas_interpret(),
            )

        attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout,
            compute_dtype=self.compute_dtype, name="self_attn",
        )(x, x, x, attn_bias=padding_bias, deterministic=deterministic)
        tail = _fused_tail(
            self.d_model, self.ff_size, self.dropout, self.activation,
            deterministic, self, ("norm1", "linear1", "linear2", "norm2"),
        )
        if tail is not None:
            return tail(x.astype(attn.dtype), attn)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        # dtype threads compute_dtype through LN + FFN: without it the f32
        # params promote activations back to f32 and the FFN matmuls (half
        # the layer's FLOPs) silently miss the bf16 MXU path.
        cdt = self.compute_dtype
        x = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=cdt)(x + attn)

        h = nn.Dense(self.ff_size, name="linear1", dtype=cdt)(x)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2", dtype=cdt)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=cdt)(x + h)


class TransformerDecoderLayer(nn.Module):
    """Post-LN decoder layer: self-attn, cross-attn, FFN (torch semantics)."""

    d_model: int
    num_heads: int
    ff_size: int
    dropout: float = 0.1
    activation: Callable = gelu_exact
    compute_dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(
        self, tgt, memory, tgt_bias=None, memory_bias=None, deterministic: bool = True
    ):
        attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout,
            compute_dtype=self.compute_dtype, name="self_attn",
        )(tgt, tgt, tgt, attn_bias=tgt_bias, deterministic=deterministic)
        attn = nn.Dropout(self.dropout)(attn, deterministic=deterministic)
        cdt = self.compute_dtype  # see encoder layer: keep LN+FFN in bf16
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm1", dtype=cdt)(tgt + attn)

        cross = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout,
            compute_dtype=self.compute_dtype, name="multihead_attn",
        )(tgt, memory, memory, attn_bias=memory_bias, deterministic=deterministic)
        tail = _fused_tail(
            self.d_model, self.ff_size, self.dropout, self.activation,
            deterministic, self, ("norm2", "linear1", "linear2", "norm3"),
        )
        if tail is not None:
            return tail(tgt.astype(cross.dtype), cross)
        cross = nn.Dropout(self.dropout)(cross, deterministic=deterministic)
        tgt = nn.LayerNorm(epsilon=1e-5, name="norm2", dtype=cdt)(tgt + cross)

        h = nn.Dense(self.ff_size, name="linear1", dtype=cdt)(tgt)
        h = self.activation(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, name="linear2", dtype=cdt)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5, name="norm3", dtype=cdt)(tgt + h)


class TransformerEncoder(nn.Module):
    d_model: int
    num_heads: int
    ff_size: int
    num_layers: int
    dropout: float = 0.1
    activation: Callable = gelu_exact
    compute_dtype: Optional[Dtype] = None
    remat: bool = False  # jax.checkpoint each layer (memory <-> flops)

    @nn.compact
    def __call__(self, x, padding_mask=None, deterministic: bool = True):
        bias = key_padding_bias(padding_mask)
        layer_cls = TransformerEncoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerEncoderLayer, static_argnums=(3,))
        for i in range(self.num_layers):
            x = layer_cls(
                self.d_model, self.num_heads, self.ff_size, self.dropout,
                self.activation, self.compute_dtype, name=f"layers_{i}",
            )(x, bias, deterministic)
        return x


class TransformerDecoder(nn.Module):
    d_model: int
    num_heads: int
    ff_size: int
    num_layers: int
    dropout: float = 0.1
    activation: Callable = gelu_exact
    compute_dtype: Optional[Dtype] = None
    remat: bool = False

    @nn.compact
    def __call__(
        self, tgt, memory, tgt_padding_mask=None, memory_padding_mask=None,
        deterministic: bool = True,
    ):
        tgt_bias = key_padding_bias(tgt_padding_mask)
        mem_bias = key_padding_bias(memory_padding_mask)
        layer_cls = TransformerDecoderLayer
        if self.remat:
            layer_cls = nn.remat(TransformerDecoderLayer, static_argnums=(5,))
        for i in range(self.num_layers):
            tgt = layer_cls(
                self.d_model, self.num_heads, self.ff_size, self.dropout,
                self.activation, self.compute_dtype, name=f"layers_{i}",
            )(tgt, memory, tgt_bias, mem_bias, deterministic)
        return tgt


class GRU(nn.Module):
    """Multi-layer GRU with torch.nn.GRU gate math and weight layout.

    Input [B, S, D] -> output [B, S, D]. The time recurrence is a
    `lax.scan`; all gates for a step are one fused [D, 3D] matmul.
    """

    d_model: int
    num_layers: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        D = self.d_model
        for layer in range(self.num_layers):
            w_ih = self.param(f"w_ih_l{layer}", nn.initializers.lecun_normal(), (x.shape[-1], 3 * D))
            w_hh = self.param(f"w_hh_l{layer}", nn.initializers.lecun_normal(), (D, 3 * D))
            b_ih = self.param(f"b_ih_l{layer}", nn.initializers.zeros, (3 * D,))
            b_hh = self.param(f"b_hh_l{layer}", nn.initializers.zeros, (3 * D,))

            # Precompute input contributions for the whole sequence: one big
            # MXU matmul instead of S small ones.
            gates_x = x @ w_ih + b_ih  # [B, S, 3D]

            def step(h, gx):
                gh = h @ w_hh + b_hh
                xr, xz, xn = jnp.split(gx, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1.0 - z) * n + z * h
                return h_new, h_new

            h0 = jnp.zeros((x.shape[0], D), dtype=x.dtype)
            _, ys = jax.lax.scan(step, h0, jnp.swapaxes(gates_x, 0, 1))
            x = jnp.swapaxes(ys, 0, 1)
        return x


class TimestepEmbedder(nn.Module):
    """PE-table lookup + 2-layer SiLU MLP (reference mdm.py:316-330)."""

    latent_dim: int
    max_len: int = 5000

    @nn.compact
    def __call__(self, timesteps: jnp.ndarray) -> jnp.ndarray:
        table = jnp.asarray(sinusoidal_table(self.max_len, self.latent_dim))
        h = table[timesteps]  # [B, D]
        h = nn.Dense(self.latent_dim, name="time_embed_0")(h)
        h = jax.nn.silu(h)
        return nn.Dense(self.latent_dim, name="time_embed_2")(h)
