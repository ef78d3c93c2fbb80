"""The original T2M (Guo et al. 2022) baseline generator, inference-only.

This is the `CompV6` VAE generator the reference eval harness can score
alongside MDM (reference `data_loaders/humanml/networks/trainers.py:382-451`
`CompTrainerV6.generate`, built from the modules in
`data_loaders/humanml/networks/modules.py:123-310`, and driven by
`data_loaders/humanml/motion_loaders/comp_v6_model_dataset.py:53-121`
`CompV6GeneratedDataset`). Porting it closes the last harness-capability gap:
our evaluation protocol can now score the published T2M baseline checkpoints,
not just MDM-family models.

TPU-native design: the reference generates ONE sample at a time with a
Python loop of GRUCell calls; here the whole generation — biGRU text
encoding, the movement-by-movement attention/prior/decoder recurrence, and
the transposed-conv upsampler — is a single jittable function over a
fixed-shape batch, with the recurrence as one `lax.scan`. Weights are
consumed as converted frozen torch checkpoints (never trained here), so the
networks are pure functions over a plain parameter pytree rather than flax
modules.

Batched-vs-reference equivalence: the reference runs exactly
``m_len/unit_length`` steps per sample (batch 1); we run ``mov_len_max``
steps for every sample and mask. Because the recurrence is causal and the
movement latents beyond each sample's own length are zeroed before the
(non-causal) transposed-conv decoder — including between its two layers —
the valid frames are bit-identical to a per-sample exact-length run.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _leaky(x, slope=0.2):
    return jnp.where(x >= 0, x, slope * x)


# ---------------------------------------------------------------------------
# Primitive cells
# ---------------------------------------------------------------------------

def gru_cell(p: Mapping, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.GRUCell step (gate order r,z,n)."""
    gx = x @ p["w_ih"] + p["b_ih"]
    gh = h @ p["w_hh"] + p["b_hh"]
    xr, xz, xn = jnp.split(gx, 3, axis=-1)
    hr, hz, hn = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(xr + hr)
    z = jax.nn.sigmoid(xz + hz)
    n = jnp.tanh(xn + r * hn)
    return (1 - z) * n + z * h


def _linear(p: Mapping, x: jnp.ndarray) -> jnp.ndarray:
    y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _layernorm(p: Mapping, x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    mu = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mu) / jnp.sqrt(var + eps) * p["scale"] + p["bias"]


def _emb_block(p: Mapping, x: jnp.ndarray) -> jnp.ndarray:
    """Linear -> LayerNorm -> LeakyReLU(0.2) (reference modules.py:130-133)."""
    return _leaky(_layernorm(p["ln"], _linear(p["fc"], x)))


def positional_table(d_model: int, max_len: int = 300) -> np.ndarray:
    """Sinusoidal table of reference modules.py:62-77 (PositionalEncoding)."""
    pe = np.zeros((max_len, d_model), np.float32)
    position = np.arange(max_len, dtype=np.float32)[:, None]
    div_term = np.exp(np.arange(0, d_model, 2, dtype=np.float32)
                      * (-np.log(10000.0) / d_model))
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return pe


# ---------------------------------------------------------------------------
# Sub-networks (reference modules.py)
# ---------------------------------------------------------------------------

def text_encoder_bigru(p: Mapping, word_embs, pos_onehot, cap_lens):
    """TextEncoderBiGRU (modules.py:267-310): per-token bidirectional
    hiddens (padding zeroed, backward half re-aligned) + final hidden.

    Dense equivalent of pack_padded_sequence: the backward GRU runs over the
    reversed *valid prefix*; outputs are scattered back so position t holds
    the backward hidden for original position t, and positions >= cap_len
    are zero — exactly what pad_packed_sequence yields. The zeroing matters:
    AttLayer attends over all 22 positions unmasked, so padded keys must be
    exactly zero for parity.
    """
    B, T, _ = word_embs.shape
    H = p["gru"]["w_hh_f"].shape[0]
    inputs = _linear(p["input_emb"], word_embs + _linear(p["pos_emb"], pos_onehot))
    h0 = p["gru"]["hidden"]  # [2, 1, H] learned initial hidden

    def run(x_seq, h_init, sfx):
        g = p["gru"]
        cell = {"w_ih": g[f"w_ih_{sfx}"], "w_hh": g[f"w_hh_{sfx}"],
                "b_ih": g[f"b_ih_{sfx}"], "b_hh": g[f"b_hh_{sfx}"]}

        def step(h, x_t):
            h_new = gru_cell(cell, x_t, h)
            return h_new, h_new

        _, hs = jax.lax.scan(step, h_init, jnp.swapaxes(x_seq, 0, 1))
        return jnp.swapaxes(hs, 0, 1)  # [B, T, H]

    t_idx = jnp.arange(T)[None, :]
    valid = t_idx < cap_lens[:, None]
    last = (cap_lens - 1)[:, None, None]

    hs_f = run(inputs, jnp.broadcast_to(h0[0], (B, H)), "f")
    h_f = jnp.take_along_axis(hs_f, jnp.broadcast_to(last, (B, 1, H)), axis=1)[:, 0]

    rev_idx = jnp.clip(cap_lens[:, None] - 1 - t_idx, 0, T - 1)
    x_rev = jnp.take_along_axis(inputs, rev_idx[..., None], axis=1)
    hs_b = run(x_rev, jnp.broadcast_to(h0[1], (B, H)), "b")
    h_b = jnp.take_along_axis(hs_b, jnp.broadcast_to(last, (B, 1, H)), axis=1)[:, 0]
    # Reference quirk (modules.py:305-308): the backward half is FLIPPED, so
    # position t holds the reverse hidden for original position len-1-t —
    # which is exactly hs_b[t] (our backward run is over the reversed valid
    # prefix), no realignment gather.
    word_hids = jnp.concatenate([hs_f, hs_b], axis=-1)
    word_hids = jnp.where(valid[..., None], word_hids, 0.0)
    gru_last = jnp.concatenate([h_f, h_b], axis=-1)
    return word_hids, gru_last


def att_layer(p: Mapping, query, key_mat, valid_len=None):
    """AttLayer (modules.py:232-266): single-query attention over word hids.

    The reference has no padding mask, but pack_padded_sequence upstream
    *removes* positions beyond the (batch-1) sample's cap_len before the
    softmax. Our fixed-shape batch keeps them, so `valid_len` [B] masks the
    softmax to t < cap_len — matching the reference's per-sample runs
    exactly (a zero key still gets softmax weight e^0 otherwise).
    """
    dim = p["w_q"]["kernel"].shape[1]
    q = _linear(p["w_q"], query)            # [B, V]
    keys = _linear(p["w_k"], key_mat)       # [B, L, V]
    vals = _linear(p["w_v"], key_mat)       # [B, L, V]
    logits = jnp.einsum("blv,bv->bl", keys, q) / np.sqrt(dim)
    if valid_len is not None:
        t = jnp.arange(key_mat.shape[1])[None, :]
        logits = jnp.where(t < valid_len[:, None], logits, -jnp.inf)
    w = jax.nn.softmax(logits, axis=1)
    return jnp.einsum("blv,bl->bv", vals, w), w


def init_hidden(p: Mapping, latent: jnp.ndarray, n_layers: int) -> jnp.ndarray:
    """z2init + split (modules.py:167-170, :211-216) -> [n_layers, B, H]."""
    h = _linear(p["z2init"], latent)
    return jnp.stack(jnp.split(h, n_layers, axis=-1), axis=0)


def prior_step(p: Mapping, pe, inputs, hidden, tta, eps):
    """TextDecoder step (modules.py:218-230): GRUCell stack -> (z, mu, logvar).

    Parity quirk kept on purpose: the reference feeds the SAME embedded
    input to every layer of this stack (modules.py:225-227 reassigns
    ``hidden[i] = gru[i](x_in, ...)`` without chaining), unlike
    TextVAEDecoder which chains layer outputs.
    """
    x = _emb_block(p["emb"], inputs) + pe[jnp.clip(tta, 0, pe.shape[0] - 1)]
    new_hidden = []
    for i in range(hidden.shape[0]):
        new_hidden.append(gru_cell(p[f"gru_{i}"], x, hidden[i]))
    h = new_hidden[-1]
    mu = _linear(p["mu_net"], h)
    logvar = _linear(p["logvar_net"], h)
    z = mu + jnp.exp(0.5 * logvar) * eps
    return z, mu, logvar, jnp.stack(new_hidden, axis=0)


def vae_decoder_step(p: Mapping, pe, inputs, hidden, tta):
    """TextVAEDecoder step (modules.py:172-186): GRUCell stack -> movement."""
    x = _emb_block(p["emb"], inputs) + pe[jnp.clip(tta, 0, pe.shape[0] - 1)]
    new_hidden = []
    for i in range(hidden.shape[0]):
        x = gru_cell(p[f"gru_{i}"], x, hidden[i])
        new_hidden.append(x)
    out = _linear(p["out_fc1"], x)
    out = _leaky(_layernorm(p["out_ln"], out))
    return _linear(p["out_fc2"], out), jnp.stack(new_hidden, axis=0)


def _conv_transpose1d(p: Mapping, x: jnp.ndarray) -> jnp.ndarray:
    """torch ConvTranspose1d(k=4, s=2, p=1) on [B, T, C] -> [B, 2T, C'].

    Equivalent dense form: dilate the input by the stride, pad k-1-p on both
    sides, correlate with the flipped kernel.
    """
    w = jnp.flip(p["kernel"], axis=0)  # stored [k, in, out]
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=[(2, 2)], lhs_dilation=(2,),
        dimension_numbers=("NHC", "HIO", "NHC"),
    )
    return out + p["bias"]


def movement_conv_encoder(p: Mapping, x: jnp.ndarray) -> jnp.ndarray:
    """MovementConvEncoder (modules.py:79-99): two stride-2 convs + linear."""
    def conv(cp, x):
        out = jax.lax.conv_general_dilated(
            x, cp["kernel"], window_strides=(2,), padding=[(1, 1)],
            dimension_numbers=("NHC", "HIO", "NHC"),
        )
        return out + cp["bias"]

    x = _leaky(conv(p["conv1"], x))
    x = _leaky(conv(p["conv2"], x))
    return _linear(p["out_net"], x)


def movement_conv_decoder(
    p: Mapping, x: jnp.ndarray, valid_mov_len: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """MovementConvDecoder (modules.py:101-122): two ConvTranspose1d(4,2,1)
    with LeakyReLU, then a position-wise linear. [B, M, latent] -> [B, 4M, pose].

    When `valid_mov_len` [B] is given, activations beyond each sample's
    valid length are zeroed before each layer, making the batched result
    bit-identical to running each sample at its exact length (absent inputs
    contribute exactly zero to a transposed conv).
    """
    def mask_to(h, n_valid):
        t = jnp.arange(h.shape[1])[None, :, None]
        return jnp.where(t < n_valid[:, None, None], h, 0.0)

    if valid_mov_len is not None:
        x = mask_to(x, valid_mov_len)
    h = _leaky(_conv_transpose1d(p["deconv1"], x))
    if valid_mov_len is not None:
        h = mask_to(h, 2 * valid_mov_len)
    h = _leaky(_conv_transpose1d(p["deconv2"], h))
    return _linear(p["out_net"], h)


# ---------------------------------------------------------------------------
# Full generator (CompTrainerV6.generate, trainers.py:382-451)
# ---------------------------------------------------------------------------

# Comp_v6_KLD01 hyperparameters (the published T2M baseline config).
DEFAULTS = dict(
    dim_word=300, dim_pos_ohot=15, dim_text_hidden=512, dim_att_vec=512,
    dim_z=128, dim_pri_hidden=1024, dim_dec_hidden=1024,
    dim_movement_latent=512, unit_length=4,
    n_layers_pri=1, n_layers_dec=1,
)


def t2m_generate(
    params: Mapping,
    word_embs: jnp.ndarray,    # [B, L, 300]
    pos_onehot: jnp.ndarray,   # [B, L, 15]
    cap_lens: jnp.ndarray,     # [B]
    m_lens: jnp.ndarray,       # [B] frame counts (multiples of unit_length)
    mov_len: int,              # static: number of movement steps to run
    eps: Optional[jnp.ndarray] = None,  # [mov_len, B, dim_z]; None = zeros
    unit_length: int = 4,
    dim_pose: int = 263,
):
    """Generate motions [B, mov_len*unit_length, dim_pose]; frames beyond
    each sample's m_len are zero. Jittable (mov_len static)."""
    B = word_embs.shape[0]
    n_pri = sum(1 for k in params["seq_pri"] if k.startswith("gru_"))
    n_dec = sum(1 for k in params["seq_dec"] if k.startswith("gru_"))
    dim_z = params["seq_pri"]["mu_net"]["kernel"].shape[1]
    pe_pri = jnp.asarray(positional_table(params["seq_pri"]["gru_0"]["w_hh"].shape[0]))
    pe_dec = jnp.asarray(positional_table(params["seq_dec"]["gru_0"]["w_hh"].shape[0]))

    if eps is None:
        eps = jnp.zeros((mov_len, B, dim_z), word_embs.dtype)

    # Initial movement latent: the encoder applied to one unit of zeros
    # (trainers.py:390-394).
    zeros_unit = jnp.zeros((B, unit_length, dim_pose - 4), word_embs.dtype)
    mov_in0 = movement_conv_encoder(params["mov_enc"], zeros_unit)[:, 0]

    word_hids, hidden = text_encoder_bigru(
        params["text_enc"], word_embs, pos_onehot, cap_lens
    )
    hidden_pri = init_hidden(params["seq_pri"], hidden, n_pri)
    hidden_dec = init_hidden(params["seq_dec"], hidden, n_dec)

    mov_units = m_lens // unit_length

    def step(carry, inp):
        mov_in, h_pri, h_dec = carry
        i, eps_i = inp
        att_vec, _ = att_layer(params["att_layer"], h_dec[-1], word_hids, cap_lens)
        tta = mov_units - i
        pri_in = jnp.concatenate([mov_in, att_vec], axis=-1)
        z, _, _, h_pri = prior_step(params["seq_pri"], pe_pri, pri_in, h_pri, tta, eps_i)
        dec_in = jnp.concatenate([mov_in, att_vec, z], axis=-1)
        fake_mov, h_dec = vae_decoder_step(params["seq_dec"], pe_dec, dec_in, h_dec, tta)
        return (fake_mov, h_pri, h_dec), fake_mov

    (_, _, _), movements = jax.lax.scan(
        step, (mov_in0, hidden_pri, hidden_dec),
        (jnp.arange(mov_len), eps),
    )
    movements = jnp.swapaxes(movements, 0, 1)  # [B, mov_len, latent]

    motions = movement_conv_decoder(params["mov_dec"], movements, mov_units)
    t = jnp.arange(motions.shape[1])[None, :, None]
    return jnp.where(t < m_lens[:, None, None], motions, 0.0)


# ---------------------------------------------------------------------------
# Torch checkpoint conversion (trainers.py:553-600 save/load format)
# ---------------------------------------------------------------------------

def _t(w):
    return np.ascontiguousarray(np.asarray(w, np.float32).T)


def _lin(sd, p, bias=True):
    out = {"kernel": _t(sd[f"{p}.weight"])}
    if bias:
        out["bias"] = np.asarray(sd[f"{p}.bias"], np.float32)
    return out


def _ln(sd, p):
    return {"scale": np.asarray(sd[f"{p}.weight"], np.float32),
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _gru_cells(sd, prefix, n_layers):
    out = {}
    for i in range(n_layers):
        out[f"gru_{i}"] = {
            "w_ih": _t(sd[f"{prefix}.{i}.weight_ih"]),
            "w_hh": _t(sd[f"{prefix}.{i}.weight_hh"]),
            "b_ih": np.asarray(sd[f"{prefix}.{i}.bias_ih"], np.float32),
            "b_hh": np.asarray(sd[f"{prefix}.{i}.bias_hh"], np.float32),
        }
    return out


def convert_text_encoder_bigru(sd: Mapping) -> Dict:
    return {
        "pos_emb": _lin(sd, "pos_emb"),
        "input_emb": _lin(sd, "input_emb"),
        "gru": {
            "hidden": np.asarray(sd["hidden"], np.float32),
            "w_ih_f": _t(sd["gru.weight_ih_l0"]),
            "w_hh_f": _t(sd["gru.weight_hh_l0"]),
            "b_ih_f": np.asarray(sd["gru.bias_ih_l0"], np.float32),
            "b_hh_f": np.asarray(sd["gru.bias_hh_l0"], np.float32),
            "w_ih_b": _t(sd["gru.weight_ih_l0_reverse"]),
            "w_hh_b": _t(sd["gru.weight_hh_l0_reverse"]),
            "b_ih_b": np.asarray(sd["gru.bias_ih_l0_reverse"], np.float32),
            "b_hh_b": np.asarray(sd["gru.bias_hh_l0_reverse"], np.float32),
        },
    }


def convert_prior(sd: Mapping, n_layers: int = 1) -> Dict:
    return {
        "emb": {"fc": _lin(sd, "emb.0"), "ln": _ln(sd, "emb.1")},
        "z2init": _lin(sd, "z2init"),
        "mu_net": _lin(sd, "mu_net"),
        "logvar_net": _lin(sd, "logvar_net"),
        **_gru_cells(sd, "gru", n_layers),
    }


def convert_vae_decoder(sd: Mapping, n_layers: int = 1) -> Dict:
    return {
        "emb": {"fc": _lin(sd, "emb.0"), "ln": _ln(sd, "emb.1")},
        "z2init": _lin(sd, "z2init"),
        "out_fc1": _lin(sd, "output.0"),
        "out_ln": _ln(sd, "output.1"),
        "out_fc2": _lin(sd, "output.3"),
        **_gru_cells(sd, "gru", n_layers),
    }


def convert_att_layer(sd: Mapping) -> Dict:
    return {
        "w_q": _lin(sd, "W_q"),
        "w_k": _lin(sd, "W_k", bias=False),
        "w_v": _lin(sd, "W_v"),
    }


def _conv1d(sd, p):
    w = np.asarray(sd[f"{p}.weight"], np.float32)  # [out, in, k]
    return {"kernel": np.transpose(w, (2, 1, 0)),  # [k, in, out] (HIO)
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def _conv_transpose1d_params(sd, p):
    w = np.asarray(sd[f"{p}.weight"], np.float32)  # torch: [in, out, k]
    return {"kernel": np.transpose(w, (2, 0, 1)),  # [k, in, out]
            "bias": np.asarray(sd[f"{p}.bias"], np.float32)}


def convert_movement_encoder(sd: Mapping) -> Dict:
    return {
        "conv1": _conv1d(sd, "main.0"),
        "conv2": _conv1d(sd, "main.3"),
        "out_net": _lin(sd, "out_net"),
    }


def convert_movement_decoder(sd: Mapping) -> Dict:
    return {
        "deconv1": _conv_transpose1d_params(sd, "main.0"),
        "deconv2": _conv_transpose1d_params(sd, "main.2"),
        "out_net": _lin(sd, "out_net"),
    }


def convert_comp_v6(state: Mapping, n_layers_pri: int = 1, n_layers_dec: int = 1) -> Dict:
    """Convert a CompTrainerV6 checkpoint dict (trainers.py:553-579 keys)."""
    out = {
        "text_enc": convert_text_encoder_bigru(state["text_enc"]),
        "seq_pri": convert_prior(state["seq_pri"], n_layers_pri),
        "seq_dec": convert_vae_decoder(state["seq_dec"], n_layers_dec),
        "att_layer": convert_att_layer(state["att_layer"]),
        "mov_enc": convert_movement_encoder(state["mov_enc"]),
        "mov_dec": convert_movement_decoder(state["mov_dec"]),
    }
    # Training checkpoints carry the posterior too (trainers.py:560).
    if "seq_post" in state:
        out["seq_post"] = convert_prior(state["seq_post"], n_layers_pri)
    return out


def load_comp_v6(path: str) -> Dict:
    """Load + convert a torch Comp_v6 `.tar` checkpoint."""
    import torch

    state = torch.load(path, map_location="cpu", weights_only=False)
    sds = {k: {kk: vv.numpy() for kk, vv in v.items()}
           for k, v in state.items() if isinstance(v, dict) and k in (
               "text_enc", "seq_pri", "seq_post", "seq_dec", "att_layer",
               "mov_enc", "mov_dec")}
    return convert_comp_v6(sds)


def load_len_estimator(path: str):
    """Load + convert the `length_est_bigru/model/latest.tar` checkpoint
    (comp_v6_model_dataset.py:41-47) -> flax params for
    networks.MotionLenEstimatorBiGRU."""
    import torch

    from .networks import convert_len_estimator

    state = torch.load(path, map_location="cpu", weights_only=False)
    sd = {k: v.numpy() for k, v in state["estimator"].items()}
    return convert_len_estimator(sd)


# ---------------------------------------------------------------------------
# Generated-dataset loaders (CompV6GeneratedDataset equivalent)
# ---------------------------------------------------------------------------

def sample_movement_lengths(probs: np.ndarray, rng, min_mov_length: int = 10):
    """Per-sample length draw with the reference's retry rule
    (comp_v6_model_dataset.py:90-96): up to 3 multinomial draws, accept the
    first >= min_mov_length, else keep the third regardless. Clamped to >= 1:
    a 0 draw would make the reference crash (torch.cat of zero movement
    chunks), it just never happens with the trained estimator."""
    out = []
    for p in probs:
        p = np.asarray(p, np.float64)
        p = p / p.sum()
        m = 0
        for _ in range(3):
            m = int(rng.choice(len(p), p=p))
            if m >= min_mov_length:
                break
        out.append(max(m, 1))
    return np.asarray(out, np.int32)


class T2MBaselineGenerator:
    """Holds converted params + the jitted length-estimator / generator
    functions. Built ONCE; the per-replication loaders below share it so the
    49-step generation scan compiles a single time."""

    def __init__(
        self,
        gen_params: Mapping,
        len_est_params,
        unit_length: int = 4,
        dim_pose: int = 263,
        max_motion_length: int = 196,
        min_mov_length: int = 10,  # 10 for t2m, 6 for kit
        len_est_kwargs: Optional[Dict] = None,  # override module dims (tests)
    ):
        from .networks import MotionLenEstimatorBiGRU

        self.gen_params = gen_params
        self.unit_length = unit_length
        self.min_mov_length = min_mov_length
        self.mov_len = max_motion_length // unit_length
        self.dim_z = gen_params["seq_pri"]["mu_net"]["kernel"].shape[1]
        est = MotionLenEstimatorBiGRU(
            **(len_est_kwargs or {"output_size": 200 // unit_length}))
        self._len_est = jax.jit(
            lambda w, p, l: est.apply(len_est_params, w, p, l))
        self._generate = jax.jit(
            lambda w, p, cl, ml, eps: t2m_generate(
                gen_params, w, p, cl, ml, mov_len=self.mov_len, eps=eps,
                unit_length=unit_length, dim_pose=dim_pose))

    def gen_batch(self, batch, rng, key, repeats: int = 1):
        """Sample lengths from the estimator, then generate; returns
        ([(x, m_lens)] * repeats, advanced_key)."""
        from .harness import _text_features

        # Same zero-GloVe fallback as the metric path: without a vectorizer
        # the whole eval is already stamped "comparable": false.
        wf, pf, sl, _ = _text_features(batch)
        w = jnp.asarray(wf, jnp.float32)
        p = jnp.asarray(pf, jnp.float32)
        cl = jnp.asarray(sl, jnp.int32)
        logits = np.asarray(self._len_est(w, p, cl))
        probs = np.exp(logits - logits.max(-1, keepdims=True))
        outs = []
        for _ in range(repeats):
            mov = sample_movement_lengths(probs, rng, self.min_mov_length)
            m_lens = mov * self.unit_length
            key, sub = jax.random.split(key)
            eps = jax.random.normal(sub, (self.mov_len, w.shape[0], self.dim_z))
            x = np.asarray(self._generate(w, p, cl, jnp.asarray(m_lens), eps))
            outs.append((x, m_lens))
        return outs, key


class T2MBaselineLoader:
    """Runs the T2M baseline generator over eval prompts and yields
    harness-ready batches (the reference CompV6GeneratedDataset,
    comp_v6_model_dataset.py:53-147, batched instead of item-by-item).

    Motion lengths are drawn from the frozen length estimator's softmax;
    generated features are already in the evaluator-stats space (the T2M
    generator trains on the same normalization the evaluator uses, so the
    reference applies no renorm either).
    """

    def __init__(self, generator: T2MBaselineGenerator, gt_batches, seed: int = 0):
        self.generator = generator
        self.gt_batches = gt_batches
        self.seed = seed

    def __iter__(self):
        rng = np.random.default_rng(self.seed)
        key = jax.random.PRNGKey(self.seed)
        for batch in self.gt_batches:
            outs, key = self.generator.gen_batch(batch, rng, key, 1)
            x, m_lens = outs[0]
            out = {"x": x, "lengths": m_lens}
            for k in ("word_embeddings", "pos_one_hots", "sent_lens"):
                if k in batch:
                    out[k] = batch[k]
            yield out


class T2MBaselineMMLoader(T2MBaselineLoader):
    """Multimodality variant: N repeats of the same prompt, each with its
    own sampled length and noise (comp_v6_model_dataset.py:86-116)."""

    def __init__(self, generator, gt_batches, seed: int = 0,
                 mm_num_samples: int = 10, mm_num_repeats: int = 10):
        super().__init__(generator, gt_batches, seed)
        self.mm_num_samples = mm_num_samples
        self.mm_num_repeats = mm_num_repeats

    def __iter__(self):
        rng = np.random.default_rng(self.seed + 7919)
        key = jax.random.PRNGKey(self.seed + 7919)
        # MM prompts are drawn uniformly WITHOUT replacement over the whole
        # eval stream (reference comp_v6_model_dataset.py:64-65 mm_idxs =
        # np.random.choice over the full dataset), not one per head batch —
        # head-biased sampling would skew the MultiModality statistic.
        batches = list(self.gt_batches)
        sizes = [len(b["lengths"]) for b in batches]
        total = int(np.sum(sizes))
        n_mm = min(self.mm_num_samples, total)
        flat = np.sort(rng.choice(total, size=n_mm, replace=False))
        starts = np.cumsum([0] + sizes[:-1])
        for f in flat:
            b_i = int(np.searchsorted(starts, f, side="right")) - 1
            idx = int(f - starts[b_i])
            batch = batches[b_i]
            one = {
                k: batch[k][idx: idx + 1]
                for k in ("word_embeddings", "pos_one_hots", "sent_lens")
            }
            outs, key = self.generator.gen_batch(one, rng, key, self.mm_num_repeats)
            yield {
                "x": np.concatenate([x for x, _ in outs], axis=0),
                "lengths": np.concatenate([l for _, l in outs], axis=0),
            }
