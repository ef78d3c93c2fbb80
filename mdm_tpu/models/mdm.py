"""MDM denoiser (trans_enc / trans_dec / gru) in Flax.

Capability mirror of the reference MDM (/root/reference/model/mdm.py:11-480)
with a TPU-first contract:

- Canonical layout ``x: [B, T, D]`` (D = njoints*nfeats), static T.
- All conditioning is carried in a :class:`Conditioning` pytree of
  fixed-shape arrays — no string lists or dict mutation in the hot path.
  Goal-joint selection uses a ``[B, G]`` validity matrix instead of python
  joint-name loops (reference EmbedTargetLoc*, mdm.py:399-480).
- Classifier-free dropout is an explicit per-sample bool array supplied by
  the caller (PRNG stays outside the module), instead of in-module bernoulli.
- Text encoders are external: the model consumes precomputed text embeddings
  (the reference's `text_embed` caching fast path, mdm.py:210-213, is the
  *only* path here; encoders run once per batch, never per diffusion step).
- Prefix completion (DiP) concatenates the context window inside the
  module and slices the suffix, as in mdm.py:203-206/277-280.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from .layers import (
    GRU,
    TimestepEmbedder,
    TransformerDecoder,
    TransformerEncoder,
    sinusoidal_table,
)


@dataclass(frozen=True)
class MDMConfig:
    njoints: int = 263
    nfeats: int = 1
    latent_dim: int = 512
    ff_size: int = 1024
    num_layers: int = 8
    num_heads: int = 4
    dropout: float = 0.1
    data_rep: str = "hml_vec"  # hml_vec | rot6d | xyz | rot_vel
    arch: str = "trans_enc"  # trans_enc | trans_dec | gru
    cond_mode: str = "text"  # text | action | no_cond
    text_dim: int = 512  # CLIP pooled width (768 for DistilBERT tokens)
    text_tokens: bool = False  # True: [B, L, text_dim] token memory (BERT)
    num_actions: int = 1
    emb_trans_dec: bool = False
    emb_policy: str = "add"  # add | cat
    pos_embed_max_len: int = 5000
    mask_frames: bool = False
    # DiP prefix completion
    context_len: int = 0
    pred_len: int = 0
    # multi-target goal conditioning
    multi_target_cond: bool = False
    multi_encoder_type: str = "multi"  # multi | single | split
    target_enc_layers: int = 1
    num_goal_joints: int = 6  # pelvis + 5 end effectors (humanml)
    compute_dtype: str = "float32"
    remat: bool = False  # rematerialize transformer layers (train memory saver)

    @property
    def input_feats(self) -> int:
        return self.njoints * self.nfeats

    @property
    def is_prefix_comp(self) -> bool:
        return self.context_len + self.pred_len > 0

    @property
    def n_extended_goals(self) -> int:
        # goal joints + traj + heading (reference mdm.py:402)
        return self.num_goal_joints + 2


@struct.dataclass
class Conditioning:
    """Fixed-shape conditioning operands. All optional; None = absent."""

    # [B, T] bool, True = valid frame
    frames_mask: Optional[jnp.ndarray] = None
    # CLIP pooled [B, text_dim] or BERT tokens [B, L, text_dim]
    text_embed: Optional[jnp.ndarray] = None
    # [B, L] bool, True = real token (BERT); inverted internally for bias
    text_tokens_mask: Optional[jnp.ndarray] = None
    # [B] int action index
    action: Optional[jnp.ndarray] = None
    # [B, context_len, D] DiP prefix window
    prefix: Optional[jnp.ndarray] = None
    # [B] bool: drop the condition for this sample (CFG dropout / uncond)
    cond_drop: Optional[jnp.ndarray] = None
    # goal conditioning: [B, G+2, 3] target locations, [B, G+2] validity
    # (validity already includes the heading row), [B] bool target_uncond
    target_cond: Optional[jnp.ndarray] = None
    target_validity: Optional[jnp.ndarray] = None
    target_uncond: Optional[jnp.ndarray] = None


def _mask_cond(cond: jnp.ndarray, drop: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Zero the condition for dropped samples (reference mask_cond)."""
    if drop is None:
        return cond
    keep = 1.0 - drop.astype(cond.dtype)
    return cond * keep.reshape((-1,) + (1,) * (cond.ndim - 1))


class EmbedAction(nn.Module):
    num_actions: int
    latent_dim: int

    @nn.compact
    def __call__(self, action: jnp.ndarray) -> jnp.ndarray:
        table = self.param(
            "action_embedding", nn.initializers.normal(1.0),
            (self.num_actions, self.latent_dim),
        )
        return table[action]


class EmbedTargetLoc(nn.Module):
    """Vectorized goal-location encoder covering the reference's three
    variants (multi/single/split) with stacked per-joint parameters.

    input: target [B, G, 3], validity [B, G] -> [B, latent].
    """

    latent_dim: int
    n_goals: int
    encoder_type: str = "multi"
    num_layers: int = 1

    @nn.compact
    def __call__(self, target: jnp.ndarray, validity: jnp.ndarray) -> jnp.ndarray:
        B, G, _ = target.shape
        v = validity.astype(target.dtype)
        if self.encoder_type == "multi":
            # Per-joint MLP (3 -> d -> d), all joints in two einsums.
            w1 = self.param("w1", nn.initializers.lecun_normal(), (G, 3, self.latent_dim))
            b1 = self.param("b1", nn.initializers.zeros, (G, self.latent_dim))
            w2 = self.param("w2", nn.initializers.lecun_normal(), (G, self.latent_dim, self.latent_dim))
            b2 = self.param("b2", nn.initializers.zeros, (G, self.latent_dim))
            h = jnp.einsum("bgi,gid->bgd", target, w1) + b1
            h = jax.nn.silu(h)
            h = jnp.einsum("bgd,gde->bge", h, w2) + b2
            h = h * v[..., None]  # zero rows for unrequested joints
            mix = self.param("mix_weights", nn.initializers.normal(1.0), (G,))
            mix = mix / mix.sum()
            return jnp.einsum("g,bgd->bd", mix, h)
        if self.encoder_type == "single":
            # One MLP over the flattened (loc, validity) vector.
            x = jnp.concatenate([target, v[..., None]], axis=-1).reshape(B, G * 4)
            h = nn.Dense(self.latent_dim, name="in")(x)
            for i in range(self.num_layers):
                h = nn.Dense(self.latent_dim, name=f"hidden_{i}")(jax.nn.silu(h))
            return h
        if self.encoder_type == "split":
            # Per-joint mini-MLP producing latent/G dims each, concatenated.
            assert self.latent_dim % G == 0
            dsplit = self.latent_dim // G
            x = jnp.concatenate([target, v[..., None]], axis=-1)  # [B, G, 4]
            w1 = self.param("w1", nn.initializers.lecun_normal(), (G, 4, dsplit))
            b1 = self.param("b1", nn.initializers.zeros, (G, dsplit))
            h = jnp.einsum("bgi,gid->bgd", x, w1) + b1
            for i in range(self.num_layers):
                wk = self.param(f"w{i+2}", nn.initializers.lecun_normal(), (G, dsplit, dsplit))
                bk = self.param(f"b{i+2}", nn.initializers.zeros, (G, dsplit))
                h = jnp.einsum("bgd,gde->bge", jax.nn.silu(h), wk) + bk
            return h.reshape(B, self.latent_dim)
        raise ValueError(self.encoder_type)


class InputProcess(nn.Module):
    data_rep: str
    latent_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, S, F]
        if self.data_rep in ("rot6d", "xyz", "hml_vec"):
            return nn.Dense(self.latent_dim, name="poseEmbedding")(x)
        if self.data_rep == "rot_vel":
            first = nn.Dense(self.latent_dim, name="poseEmbedding")(x[:, :1])
            vel = nn.Dense(self.latent_dim, name="velEmbedding")(x[:, 1:])
            return jnp.concatenate([first, vel], axis=1)
        raise ValueError(self.data_rep)


class OutputProcess(nn.Module):
    data_rep: str
    input_feats: int

    @nn.compact
    def __call__(self, h: jnp.ndarray) -> jnp.ndarray:  # [B, S, d] -> [B, S, F]
        if self.data_rep in ("rot6d", "xyz", "hml_vec"):
            return nn.Dense(self.input_feats, name="poseFinal")(h)
        if self.data_rep == "rot_vel":
            first = nn.Dense(self.input_feats, name="poseFinal")(h[:, :1])
            vel = nn.Dense(self.input_feats, name="velFinal")(h[:, 1:])
            return jnp.concatenate([first, vel], axis=1)
        raise ValueError(self.data_rep)


class MDM(nn.Module):
    """Motion Diffusion Model denoiser: (x_t, t, cond) -> x0_hat."""

    config: MDMConfig

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,  # [B, T, D]
        timesteps: jnp.ndarray,  # [B] int (original-process steps)
        cond: Conditioning = Conditioning(),
        deterministic: bool = True,
    ) -> jnp.ndarray:
        cfg = self.config
        B, T, D = x.shape
        cdt = jnp.dtype(cfg.compute_dtype)

        time_emb = TimestepEmbedder(
            cfg.latent_dim, cfg.pos_embed_max_len, name="embed_timestep"
        )(timesteps)  # [B, d]

        if cfg.multi_target_cond and cond.target_cond is not None:
            target_emb = EmbedTargetLoc(
                cfg.latent_dim, cfg.n_extended_goals, cfg.multi_encoder_type,
                cfg.target_enc_layers, name="embed_target_cond",
            )(cond.target_cond, cond.target_validity)
            time_emb = time_emb + _mask_cond(target_emb, cond.target_uncond)

        # ------------------------------------------------ prefix completion
        frames_mask = cond.frames_mask
        if cfg.is_prefix_comp:
            assert cond.prefix is not None, "prefix completion requires cond.prefix"
            x = jnp.concatenate([cond.prefix, x], axis=1)
            if frames_mask is not None:
                ones = jnp.ones((B, cfg.context_len), dtype=frames_mask.dtype)
                frames_mask = jnp.concatenate([ones, frames_mask], axis=1)

        # ------------------------------------------------------ conditioning
        emb_tokens = None  # [B, E, d] conditioning tokens
        memory_mask = None  # [B, E] bool padding (True = ignore)
        text_mask_inv = None
        if cfg.cond_mode != "no_cond":
            if "text" in cfg.cond_mode:
                assert cond.text_embed is not None, "text cond requires text_embed"
                te = cond.text_embed
                if not cfg.text_tokens:
                    te = te[:, None, :] if te.ndim == 2 else te  # [B, 1, Dt]
                text_emb = nn.Dense(cfg.latent_dim, name="embed_text")(
                    _mask_cond(te, cond.cond_drop)
                )  # [B, L, d]
                if cond.text_tokens_mask is not None:
                    text_mask_inv = ~cond.text_tokens_mask  # True = pad
                if cfg.emb_policy == "add":
                    emb_tokens = text_emb + time_emb[:, None, :]
                else:
                    emb_tokens = jnp.concatenate([time_emb[:, None, :], text_emb], axis=1)
                    if text_mask_inv is not None:
                        memory_mask = jnp.concatenate(
                            [jnp.zeros((B, 1), bool), text_mask_inv], axis=1
                        )
            if "action" in cfg.cond_mode:
                if cond.action is None:
                    raise ValueError(
                        "cond_mode includes 'action' but Conditioning.action "
                        "is None — pass [B] int action indices"
                    )
                action_emb = EmbedAction(
                    cfg.num_actions, cfg.latent_dim, name="embed_action"
                )(cond.action)
                emb_tokens = (time_emb + _mask_cond(action_emb, cond.cond_drop))[:, None, :]
        else:
            emb_tokens = time_emb[:, None, :]
        if emb_tokens is not None and memory_mask is None and text_mask_inv is not None:
            memory_mask = text_mask_inv

        # ------------------------------------------------------- input path
        S = x.shape[1]
        pe = jnp.asarray(sinusoidal_table(cfg.pos_embed_max_len, cfg.latent_dim))

        if cfg.arch == "gru":
            emb_gru = jnp.broadcast_to(
                emb_tokens[:, :1, :], (B, S, cfg.latent_dim)
            )
            x = jnp.concatenate([x, emb_gru], axis=-1)

        h = InputProcess(cfg.data_rep, cfg.latent_dim, name="input_process")(x)
        h = h.astype(cdt)

        # Frame padding mask -> key padding (True = ignore).
        pad_mask = None
        if cfg.mask_frames and frames_mask is not None:
            pad_mask = ~frames_mask[:, :S]

        if cfg.arch == "trans_enc":
            n_emb = emb_tokens.shape[1]
            seq = jnp.concatenate([emb_tokens.astype(cdt), h], axis=1)
            seq = seq + pe[: seq.shape[1]][None].astype(cdt)
            seq = nn.Dropout(cfg.dropout)(seq, deterministic=deterministic)
            if pad_mask is not None:
                pad_mask = jnp.concatenate(
                    [jnp.zeros((B, n_emb), bool), pad_mask], axis=1
                )
            out = TransformerEncoder(
                cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.num_layers,
                cfg.dropout, compute_dtype=cdt, remat=cfg.remat,
                name="seqTransEncoder",
            )(seq, pad_mask, deterministic)[:, n_emb:]
        elif cfg.arch == "trans_dec":
            if cfg.emb_trans_dec:
                seq = jnp.concatenate([time_emb[:, None, :].astype(cdt), h], axis=1)
                if pad_mask is not None:
                    pad_mask = jnp.concatenate([jnp.zeros((B, 1), bool), pad_mask], axis=1)
            else:
                seq = h
            seq = seq + pe[: seq.shape[1]][None].astype(cdt)
            seq = nn.Dropout(cfg.dropout)(seq, deterministic=deterministic)
            out = TransformerDecoder(
                cfg.latent_dim, cfg.num_heads, cfg.ff_size, cfg.num_layers,
                cfg.dropout, compute_dtype=cdt, remat=cfg.remat,
                name="seqTransDecoder",
            )(seq, emb_tokens.astype(cdt), pad_mask, memory_mask, deterministic)
            if cfg.emb_trans_dec:
                out = out[:, 1:]
        elif cfg.arch == "gru":
            seq = h + pe[:S][None].astype(cdt)
            seq = nn.Dropout(cfg.dropout)(seq, deterministic=deterministic)
            # Reference quirk (mdm.py:96,275): a batch_first GRU is fed the
            # sequence-major [S, B, d] tensor, so the recurrence actually
            # runs across the *batch* axis per frame. Checkpoint parity
            # requires reproducing that exactly.
            out = GRU(cfg.latent_dim, cfg.num_layers, name="gru")(
                jnp.swapaxes(seq, 0, 1)
            )
            out = jnp.swapaxes(out, 0, 1)
        else:
            raise ValueError(cfg.arch)

        out = out.astype(jnp.float32)
        if cfg.is_prefix_comp:
            out = out[:, cfg.context_len :]
        return OutputProcess(cfg.data_rep, cfg.input_feats, name="output_process")(out)


def cfg_denoiser_cached(apply_fn, params, guidance_scale: float, cache_interval: int = 2):
    """CFG with a cached unconditional branch (stateful model_fn).

    The uncond output drifts slowly across adjacent timesteps (local
    transition coherence — the observation behind SmoothCache-style
    diffusion acceleration); recomputing it every `cache_interval` steps and
    reusing it otherwise cuts model cost from 2 to (1 + 1/interval)
    forwards per step. Opt-in: exact CFG remains the default.

    Returns (model_fn(x, t, cond, state) -> (out, state), init_state_fn).
    """

    def init_state(x_shape, dtype=jnp.float32):
        return {
            "uncond": jnp.zeros(x_shape, dtype),
            "i": jnp.zeros((), jnp.int32),
        }

    def model_fn(x, t, cond: Conditioning, state):
        out_cond = apply_fn(params, x, t, cond)
        B = x.shape[0]
        uncond_cond = cond.replace(cond_drop=jnp.ones((B,), bool))

        def recompute(_):
            return apply_fn(params, x, t, uncond_cond)

        def reuse(_):
            return state["uncond"]

        fresh = (state["i"] % cache_interval) == 0
        out_uncond = jax.lax.cond(fresh, recompute, reuse, None)
        new_state = {"uncond": out_uncond, "i": state["i"] + 1}
        return out_uncond + guidance_scale * (out_cond - out_uncond), new_state

    return model_fn, init_state


def cfg_denoiser(apply_fn, params, guidance_scale: float):
    """Classifier-free-guidance wrapper as ONE double-batched forward.

    Returns model_fn(x, t, cond) computing
    `uncond + s * (cond - uncond)` with both branches in a single MXU pass
    (the reference runs two sequential forwards, sampler_util.py:27-34).
    """

    def model_fn(x, t, cond: Conditioning):
        B = x.shape[0]
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t, t], axis=0)

        def dup(v):
            if v is None:
                return None
            return jnp.concatenate([v, v], axis=0)

        drop = jnp.concatenate(
            [jnp.zeros((B,), bool), jnp.ones((B,), bool)], axis=0
        )
        cond2 = Conditioning(
            frames_mask=dup(cond.frames_mask),
            text_embed=dup(cond.text_embed),
            text_tokens_mask=dup(cond.text_tokens_mask),
            action=dup(cond.action),
            prefix=dup(cond.prefix),
            cond_drop=drop,
            target_cond=dup(cond.target_cond),
            target_validity=dup(cond.target_validity),
            target_uncond=dup(cond.target_uncond),
        )
        out = apply_fn(params, x2, t2, cond2)
        out_cond, out_uncond = out[:B], out[B:]
        return out_uncond + guidance_scale * (out_cond - out_uncond)

    return model_fn
