"""Convert reference PyTorch MDM checkpoints to mdm_tpu Flax params.

The published checkpoints are torch `state_dict`s saved by the reference
training loop (train/training_loop.py:402-444: CLIP keys stripped; with EMA a
dict {'model', 'model_avg'}). This module maps them weight-for-weight onto
the :class:`mdm_tpu.models.mdm.MDM` parameter tree. Layer parity is enforced
by tests that run torch layers against converted Flax layers.

Conventions handled:
- torch Linear stores W [out, in]; flax Dense kernel is [in, out] -> transpose.
- torch MultiheadAttention packs q/k/v into in_proj_weight [3D, D] -> split.
- torch GRU gate order (r, z, n) matches our fused [in, 3D] layout after
  transpose.
- EmbedTargetLoc 'multi' is a ParameterDict of per-joint Sequentials ->
  stacked [G, ...] tensors in joint-name order.
"""
from __future__ import annotations

from typing import Dict, List, Mapping, Optional

import numpy as np

from .mdm import MDMConfig

Array = np.ndarray


def _t(w) -> Array:
    return np.ascontiguousarray(np.asarray(w).T)


def _linear(sd: Mapping, prefix: str) -> Dict[str, Array]:
    return {"kernel": _t(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _layernorm(sd: Mapping, prefix: str) -> Dict[str, Array]:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]), "bias": np.asarray(sd[f"{prefix}.bias"])}


def _mha(sd: Mapping, prefix: str, d_model: int) -> Dict[str, Dict[str, Array]]:
    w = np.asarray(sd[f"{prefix}.in_proj_weight"])  # [3D, D]
    b = np.asarray(sd[f"{prefix}.in_proj_bias"])  # [3D]
    wq, wk, wv = w[:d_model], w[d_model : 2 * d_model], w[2 * d_model :]
    bq, bk, bv = b[:d_model], b[d_model : 2 * d_model], b[2 * d_model :]
    return {
        "q_proj": {"kernel": _t(wq), "bias": bq},
        "k_proj": {"kernel": _t(wk), "bias": bk},
        "v_proj": {"kernel": _t(wv), "bias": bv},
        "out_proj": _linear(sd, f"{prefix}.out_proj"),
    }


def convert_encoder_layer(sd: Mapping, prefix: str, d_model: int) -> Dict:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn", d_model),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
    }


def convert_decoder_layer(sd: Mapping, prefix: str, d_model: int) -> Dict:
    return {
        "self_attn": _mha(sd, f"{prefix}.self_attn", d_model),
        "multihead_attn": _mha(sd, f"{prefix}.multihead_attn", d_model),
        "linear1": _linear(sd, f"{prefix}.linear1"),
        "linear2": _linear(sd, f"{prefix}.linear2"),
        "norm1": _layernorm(sd, f"{prefix}.norm1"),
        "norm2": _layernorm(sd, f"{prefix}.norm2"),
        "norm3": _layernorm(sd, f"{prefix}.norm3"),
    }


def convert_gru(sd: Mapping, prefix: str, num_layers: int) -> Dict[str, Array]:
    out = {}
    p = f"{prefix}." if prefix else ""
    for k in range(num_layers):
        out[f"w_ih_l{k}"] = _t(sd[f"{p}weight_ih_l{k}"])
        out[f"w_hh_l{k}"] = _t(sd[f"{p}weight_hh_l{k}"])
        out[f"b_ih_l{k}"] = np.asarray(sd[f"{p}bias_ih_l{k}"])
        out[f"b_hh_l{k}"] = np.asarray(sd[f"{p}bias_hh_l{k}"])
    return out


def convert_mdm_state_dict(
    sd: Mapping[str, "np.ndarray"],
    config: MDMConfig,
    goal_joint_names: Optional[List[str]] = None,
) -> Dict:
    """Reference MDM state_dict (numpy-valued) -> flax params pytree."""
    sd = {k: np.asarray(v) for k, v in sd.items() if not k.startswith("clip_model.")}
    d = config.latent_dim
    params: Dict = {}

    params["embed_timestep"] = {
        "time_embed_0": _linear(sd, "embed_timestep.time_embed.0"),
        "time_embed_2": _linear(sd, "embed_timestep.time_embed.2"),
    }

    ip = {"poseEmbedding": _linear(sd, "input_process.poseEmbedding")}
    if config.data_rep == "rot_vel":
        ip["velEmbedding"] = _linear(sd, "input_process.velEmbedding")
    params["input_process"] = ip

    op = {"poseFinal": _linear(sd, "output_process.poseFinal")}
    if config.data_rep == "rot_vel":
        op["velFinal"] = _linear(sd, "output_process.velFinal")
    params["output_process"] = op

    if "embed_text.weight" in sd:
        params["embed_text"] = _linear(sd, "embed_text")
    if "embed_action.action_embedding" in sd:
        params["embed_action"] = {
            "action_embedding": np.asarray(sd["embed_action.action_embedding"])
        }

    if config.arch == "trans_enc":
        layers = {
            f"layers_{i}": convert_encoder_layer(sd, f"seqTransEncoder.layers.{i}", d)
            for i in range(config.num_layers)
        }
        params["seqTransEncoder"] = layers
    elif config.arch == "trans_dec":
        layers = {
            f"layers_{i}": convert_decoder_layer(sd, f"seqTransDecoder.layers.{i}", d)
            for i in range(config.num_layers)
        }
        params["seqTransDecoder"] = layers
    elif config.arch == "gru":
        params["gru"] = convert_gru(sd, "gru", config.num_layers)

    if config.multi_target_cond and goal_joint_names is not None:
        extended = list(goal_joint_names) + ["traj", "heading"]
        if config.multi_encoder_type == "multi":
            w1 = np.stack([_t(sd[f"embed_target_cond.target_loc_emb.{n}.0.weight"]) for n in extended])
            b1 = np.stack([np.asarray(sd[f"embed_target_cond.target_loc_emb.{n}.0.bias"]) for n in extended])
            w2 = np.stack([_t(sd[f"embed_target_cond.target_loc_emb.{n}.2.weight"]) for n in extended])
            b2 = np.stack([np.asarray(sd[f"embed_target_cond.target_loc_emb.{n}.2.bias"]) for n in extended])
            params["embed_target_cond"] = {
                "w1": w1, "b1": b1, "w2": w2, "b2": b2,
                "mix_weights": np.asarray(sd["embed_target_cond.target_all_loc_emb.weights"]),
            }
        elif config.multi_encoder_type == "single":
            enc = {"in": _linear(sd, "embed_target_cond.mlp.0")}
            for i in range(config.target_enc_layers):
                enc[f"hidden_{i}"] = _linear(sd, f"embed_target_cond.mlp.{2 * (i + 1)}")
            params["embed_target_cond"] = enc
        elif config.multi_encoder_type == "split":
            G = len(extended)
            enc = {
                "w1": np.stack([_t(sd[f"embed_target_cond.mini_mlps.{g}.0.weight"]) for g in range(G)]),
                "b1": np.stack([np.asarray(sd[f"embed_target_cond.mini_mlps.{g}.0.bias"]) for g in range(G)]),
            }
            for i in range(config.target_enc_layers):
                enc[f"w{i+2}"] = np.stack(
                    [_t(sd[f"embed_target_cond.mini_mlps.{g}.{2*(i+1)}.weight"]) for g in range(G)]
                )
                enc[f"b{i+2}"] = np.stack(
                    [np.asarray(sd[f"embed_target_cond.mini_mlps.{g}.{2*(i+1)}.bias"]) for g in range(G)]
                )
            params["embed_target_cond"] = enc

    return {"params": params}


def load_torch_checkpoint(path: str, use_ema: bool = True) -> Dict[str, np.ndarray]:
    """Load a reference .pt checkpoint to a numpy state dict on host.

    Mirrors load_saved_model's EMA preference (utils/model_util.py:118-131).
    """
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    # Wrapped formats hold exactly the {'model'[, 'model_avg']} sub-dicts
    # (training_loop.py:419-423); raw state_dicts hold tensor leaves.
    is_wrapped = isinstance(sd, dict) and "model" in sd and isinstance(sd["model"], dict)
    if is_wrapped:
        sd = sd["model_avg"] if (use_ema and "model_avg" in sd) else sd["model"]
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}
