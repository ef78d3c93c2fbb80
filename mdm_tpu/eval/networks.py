"""Frozen T2M evaluator networks in Flax (+ torch weight converters).

These reproduce the pretrained metric encoders the eval protocol depends on
(/root/reference/data_loaders/humanml/networks/modules.py:79-438): the
strided-conv movement encoder and the bidirectional-GRU text/motion encoders
with learned initial hidden states. FID / R-precision parity requires
weight-faithful ports — conversion is tested against randomly-initialized
torch originals.

Variable-length handling: instead of pack_padded_sequence (which needs
length-sorted batches), the biGRU is computed densely with per-sample
gathers at `len-1` — identical math, static shapes, any batch order.
"""
from __future__ import annotations

from typing import Dict, Mapping, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


class MovementConvEncoder(nn.Module):
    """[B, T, input_size] -> [B, T//4, output_size] (two stride-2 convs)."""

    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch Conv1d(k=4, s=2, p=1) == flax Conv with padding (1, 1).
        x = nn.Conv(self.hidden_size, (4,), strides=(2,), padding=[(1, 1)], name="conv1")(x)
        x = leaky_relu(x)
        x = nn.Conv(self.output_size, (4,), strides=(2,), padding=[(1, 1)], name="conv2")(x)
        x = leaky_relu(x)
        return nn.Dense(self.output_size, name="out_net")(x)


class MovementConvDecoder(nn.Module):
    """[B, T//4, input_size] -> [B, T, output_size] (two stride-2 transposed
    convs + linear head; reference modules.py:101-120). Trained by the
    decomposition stage of the evaluator-training pipeline."""

    hidden_size: int = 512
    output_size: int = 263

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # torch ConvTranspose1d(k=4, s=2, p=1) == flax ConvTranspose with
        # padding (2, 2) and transpose_kernel=True (verified numerically).
        x = nn.ConvTranspose(self.hidden_size, (4,), strides=(2,),
                             padding=[(2, 2)], transpose_kernel=True,
                             name="deconv1")(x)
        x = leaky_relu(x)
        x = nn.ConvTranspose(self.output_size, (4,), strides=(2,),
                             padding=[(2, 2)], transpose_kernel=True,
                             name="deconv2")(x)
        x = leaky_relu(x)
        return nn.Dense(self.output_size, name="out_net")(x)


class _BiGRUCore(nn.Module):
    """Bidirectional GRU over padded [B, T, H]; returns [h_fw_last, h_bw_last]."""

    hidden_size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
        H = self.hidden_size
        B, T, _ = x.shape
        h0 = self.param("hidden", nn.initializers.normal(1.0), (2, 1, H))

        w_ih_f = self.param("w_ih_f", nn.initializers.lecun_normal(), (x.shape[-1], 3 * H))
        w_hh_f = self.param("w_hh_f", nn.initializers.lecun_normal(), (H, 3 * H))
        b_ih_f = self.param("b_ih_f", nn.initializers.zeros, (3 * H,))
        b_hh_f = self.param("b_hh_f", nn.initializers.zeros, (3 * H,))
        w_ih_b = self.param("w_ih_b", nn.initializers.lecun_normal(), (x.shape[-1], 3 * H))
        w_hh_b = self.param("w_hh_b", nn.initializers.lecun_normal(), (H, 3 * H))
        b_ih_b = self.param("b_ih_b", nn.initializers.zeros, (3 * H,))
        b_hh_b = self.param("b_hh_b", nn.initializers.zeros, (3 * H,))

        def run(x_seq, h_init, w_ih, w_hh, b_ih, b_hh):
            gates_x = x_seq @ w_ih + b_ih  # [B, T, 3H]

            def step(h, gx):
                gh = h @ w_hh + b_hh
                xr, xz, xn = jnp.split(gx, 3, axis=-1)
                hr, hz, hn = jnp.split(gh, 3, axis=-1)
                r = jax.nn.sigmoid(xr + hr)
                z = jax.nn.sigmoid(xz + hz)
                n = jnp.tanh(xn + r * hn)
                h_new = (1 - z) * n + z * h
                return h_new, h_new

            _, hs = jax.lax.scan(step, h_init, jnp.swapaxes(gates_x, 0, 1))
            return jnp.swapaxes(hs, 0, 1)  # [B, T, H]

        # Forward pass; last valid hidden per sample.
        hs_f = run(x, jnp.broadcast_to(h0[0], (B, H)), w_ih_f, w_hh_f, b_ih_f, b_hh_f)
        idx = (lengths - 1)[:, None, None]
        h_f = jnp.take_along_axis(hs_f, jnp.broadcast_to(idx, (B, 1, H)), axis=1)[:, 0]

        # Backward pass over the reversed *valid* prefix (packing semantics).
        t_idx = jnp.arange(T)[None, :]
        rev_idx = jnp.clip(lengths[:, None] - 1 - t_idx, 0, T - 1)
        x_rev = jnp.take_along_axis(x, rev_idx[..., None], axis=1)
        hs_b = run(x_rev, jnp.broadcast_to(h0[1], (B, H)), w_ih_b, w_hh_b, b_ih_b, b_hh_b)
        h_b = jnp.take_along_axis(hs_b, jnp.broadcast_to(idx, (B, 1, H)), axis=1)[:, 0]

        return jnp.concatenate([h_f, h_b], axis=-1)


class OutputNet(nn.Module):
    hidden_size: int
    output_size: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden_size, name="fc1")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="ln")(x)
        x = leaky_relu(x)
        return nn.Dense(self.output_size, name="fc2")(x)


class TextEncoderBiGRUCo(nn.Module):
    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        h = _BiGRUCore(self.hidden_size, name="gru")(inputs, cap_lens)
        return OutputNet(self.hidden_size, self.output_size, name="output_net")(h)


class MotionEncoderBiGRUCo(nn.Module):
    input_size: int = 512
    hidden_size: int = 1024
    output_size: int = 512

    @nn.compact
    def __call__(self, inputs, m_lens):
        x = nn.Dense(self.hidden_size, name="input_emb")(inputs)
        h = _BiGRUCore(self.hidden_size, name="gru")(x, m_lens)
        return OutputNet(self.hidden_size, self.output_size, name="output_net")(h)


class MotionLenEstimatorBiGRU(nn.Module):
    """Sentence -> motion-length distribution (reference modules.py:389+).

    Used by the T2M pipeline to sample generation lengths from text.
    Output is logits over length buckets (units of unit_length frames).
    """

    word_size: int = 300
    pos_size: int = 15
    hidden_size: int = 512
    output_size: int = 50  # length buckets
    nd: int = 512

    @nn.compact
    def __call__(self, word_embs, pos_onehot, cap_lens):
        pos = nn.Dense(self.word_size, name="pos_emb")(pos_onehot)
        inputs = nn.Dense(self.hidden_size, name="input_emb")(word_embs + pos)
        h = _BiGRUCore(self.hidden_size, name="gru")(inputs, cap_lens)
        h = nn.Dense(self.nd, name="fc1")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln1")(h)
        h = leaky_relu(h)
        h = nn.Dense(self.nd // 2, name="fc2")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln2")(h)
        h = leaky_relu(h)
        h = nn.Dense(self.nd // 4, name="fc3")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="ln3")(h)
        h = leaky_relu(h)
        return nn.Dense(self.output_size, name="out")(h)


# ---------------------------------------------------------------------------
# Torch -> Flax converters
# ---------------------------------------------------------------------------

def _t(w):
    return np.ascontiguousarray(np.asarray(w).T)


def _lin(sd, p):
    return {"kernel": _t(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}


def _conv1d(sd, p):
    w = np.asarray(sd[f"{p}.weight"])  # [out, in, k]
    return {"kernel": np.transpose(w, (2, 1, 0)), "bias": np.asarray(sd[f"{p}.bias"])}


def _bigru(sd, p):
    # torch stores the learned h0 as a sibling parameter named `hidden`.
    return {
        "hidden": np.asarray(sd["hidden"]),
        "w_ih_f": _t(sd[f"{p}.weight_ih_l0"]),
        "w_hh_f": _t(sd[f"{p}.weight_hh_l0"]),
        "b_ih_f": np.asarray(sd[f"{p}.bias_ih_l0"]),
        "b_hh_f": np.asarray(sd[f"{p}.bias_hh_l0"]),
        "w_ih_b": _t(sd[f"{p}.weight_ih_l0_reverse"]),
        "w_hh_b": _t(sd[f"{p}.weight_hh_l0_reverse"]),
        "b_ih_b": np.asarray(sd[f"{p}.bias_ih_l0_reverse"]),
        "b_hh_b": np.asarray(sd[f"{p}.bias_hh_l0_reverse"]),
    }


def convert_movement_encoder(sd: Mapping) -> Dict:
    return {
        "params": {
            "conv1": _conv1d(sd, "main.0"),
            "conv2": _conv1d(sd, "main.3"),
            "out_net": _lin(sd, "out_net"),
        }
    }


def _convtranspose1d(sd, p):
    w = np.asarray(sd[f"{p}.weight"])  # torch: [in, out, k]
    # flax transpose_kernel=True layout: [k, out, in]
    return {"kernel": np.transpose(w, (2, 1, 0)), "bias": np.asarray(sd[f"{p}.bias"])}


def convert_movement_decoder(sd: Mapping) -> Dict:
    return {
        "params": {
            "deconv1": _convtranspose1d(sd, "main.0"),
            "deconv2": _convtranspose1d(sd, "main.2"),
            "out_net": _lin(sd, "out_net"),
        }
    }


def _output_net(sd, p):
    return {
        "fc1": _lin(sd, f"{p}.0"),
        "ln": {"scale": np.asarray(sd[f"{p}.1.weight"]), "bias": np.asarray(sd[f"{p}.1.bias"])},
        "fc2": _lin(sd, f"{p}.3"),
    }


def convert_text_encoder(sd: Mapping) -> Dict:
    return {
        "params": {
            "pos_emb": _lin(sd, "pos_emb"),
            "input_emb": _lin(sd, "input_emb"),
            "gru": _bigru(sd, "gru"),
            "output_net": _output_net(sd, "output_net"),
        }
    }


def convert_motion_encoder(sd: Mapping) -> Dict:
    return {
        "params": {
            "input_emb": _lin(sd, "input_emb"),
            "gru": _bigru(sd, "gru"),
            "output_net": _output_net(sd, "output_net"),
        }
    }


def convert_len_estimator(sd: Mapping) -> Dict:
    ln = lambda p: {"scale": np.asarray(sd[f"{p}.weight"]), "bias": np.asarray(sd[f"{p}.bias"])}
    return {
        "params": {
            "pos_emb": _lin(sd, "pos_emb"),
            "input_emb": _lin(sd, "input_emb"),
            "gru": _bigru(sd, "gru"),
            "fc1": _lin(sd, "output.0"), "ln1": ln("output.1"),
            "fc2": _lin(sd, "output.3"), "ln2": ln("output.4"),
            "fc3": _lin(sd, "output.6"), "ln3": ln("output.7"),
            "out": _lin(sd, "output.9"),
        }
    }
