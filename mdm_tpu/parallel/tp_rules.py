"""Tensor-parallel partition rules for MDM parameters.

Megatron-style sharding over the mesh's 'model' axis, expressed as
path-pattern -> PartitionSpec rules applied to the flax param tree (XLA
inserts the all-reduces at the row-parallel boundaries automatically):

- attention q/k/v projections: column-parallel (heads split) — kernel
  [D, D] -> P(None, 'model')
- attention out projection: row-parallel — P('model', None)
- FFN linear1: column-parallel; linear2: row-parallel.
- everything else (embeddings, norms, small heads): replicated.

MDM at 17M params fits one chip many times over, so TP is about latency
scaling and about exercising the 2-D (data x model) mesh path end to end;
DP remains the default deployment layout.
"""
from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS, MODEL_AXIS

# (path regex, spec for 'kernel'-like leaves)
TP_RULES = [
    (r".*(self_attn|multihead_attn|attn)/(q_proj|k_proj|v_proj)/kernel$", P(None, MODEL_AXIS)),
    (r".*(self_attn|multihead_attn|attn)/(q_proj|k_proj|v_proj)/bias$", P(MODEL_AXIS)),
    (r".*(self_attn|multihead_attn|attn)/out_proj/kernel$", P(MODEL_AXIS, None)),
    (r".*/linear1/kernel$", P(None, MODEL_AXIS)),
    (r".*/linear1/bias$", P(MODEL_AXIS)),
    (r".*/linear2/kernel$", P(MODEL_AXIS, None)),
    (r".*/(c_fc)/kernel$", P(None, MODEL_AXIS)),
    (r".*/(c_fc)/bias$", P(MODEL_AXIS)),
    (r".*/(c_proj)/kernel$", P(MODEL_AXIS, None)),
]


def _path_str(path) -> str:
    parts = []
    for k in path:
        if hasattr(k, "key"):
            parts.append(str(k.key))
        elif hasattr(k, "name"):
            parts.append(str(k.name))
        else:
            parts.append(str(k))
    return "/".join(parts)


def spec_for_param(path_str: str, ndim: int) -> P:
    for pattern, spec in TP_RULES:
        if re.match(pattern, path_str):
            if len([a for a in spec if a is not None]) <= ndim:
                return spec
    return P()  # replicated


def param_shardings(params: Any, mesh: Mesh):
    """Param pytree -> NamedSharding pytree under the TP rules."""

    def one(path, leaf):
        spec = spec_for_param(_path_str(path), getattr(leaf, "ndim", 0))
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def state_shardings(state, mesh: Mesh):
    """TrainState -> sharding pytree: params/ema/opt mirror the param rules,
    scalars replicated."""
    p_sh = param_shardings(state.params, mesh)
    repl = NamedSharding(mesh, P())

    def like_params(tree):
        if tree is None:
            return None
        # optimizer state embeds param-shaped leaves (mu/nu) plus counters.
        def one(path, leaf):
            spec = spec_for_param(_path_str(path), getattr(leaf, "ndim", 0))
            return NamedSharding(mesh, spec)

        return jax.tree_util.tree_map_with_path(one, tree)

    from ..train.state import TrainState

    return TrainState(
        step=repl,
        params=p_sh,
        opt_state=like_params(state.opt_state),
        ema_params=like_params(state.ema_params),
    )


def shard_state(state, mesh: Mesh):
    """Device_put a TrainState according to the TP rules."""
    sh = state_shardings(state, mesh)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), state, sh,
        is_leaf=lambda x: x is None,
    )
