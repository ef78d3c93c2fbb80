"""ST-GCN action classifier in Flax (frozen, inference-mode).

Port target: /root/reference/eval/a2m/recognition/models/stgcn.py (+ the
unconstrained twin) — used as the frozen feature/classifier network for
UESTC and unconstrained evaluation. BatchNorms run in eval mode (running
stats folded in), so the network is a pure function of converted weights.

Layout here is channel-last [N, T, V, C]; the graph convolution is one
einsum over the K-partitioned adjacency — MXU-friendly.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# SMPL kinematic parents (public model constant) — replaces the reference's
# kintree pkl load for the 'smpl'/'smpl_noglobal' layouts.
SMPL_PARENTS = np.array(
    [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18, 19, 20, 21]
)


def _get_edges(layout: str) -> Tuple[int, List[Tuple[int, int]], int]:
    # The reference carries TWO different 'openpose' graphs: the classic
    # 18-node skeleton (eval/a2m/recognition/models/stgcnutils/graph.py) and
    # a MODIFIED 15-node one its UNCONSTRAINED eval redefines in place
    # (eval/unconstrained/models/stgcnutils/graph.py:44-61, the "modi_struct"
    # checkpoints). We name them separately; both are oracle-pinned.
    if layout == "openpose":
        num_node = 18
        neighbor = [(4, 3), (3, 2), (7, 6), (6, 5), (13, 12), (12, 11), (10, 9),
                    (9, 8), (11, 5), (8, 2), (5, 1), (2, 1), (0, 1), (15, 0),
                    (14, 0), (17, 15), (16, 14)]
        center = 1
    elif layout == "openpose_modi15":
        num_node = 15
        neighbor = [(4, 3), (3, 2), (2, 1),
                    (7, 6), (6, 5), (5, 1),
                    (1, 0),
                    (14, 13), (13, 12), (12, 8),
                    (11, 10), (10, 9), (9, 8),
                    (8, 1)]
        center = 1
    elif layout == "smpl":
        num_node = 24
        neighbor = [(j, int(SMPL_PARENTS[j])) for j in range(1, 24)]
        center = 0
    elif layout == "smpl_noglobal":
        num_node = 23
        neighbor = [
            (j - 1, int(SMPL_PARENTS[j]) - 1)
            for j in range(1, 24)
            if j != 0 and SMPL_PARENTS[j] != 0
        ]
        center = 0
    else:
        raise NotImplementedError(layout)
    edges = [(i, i) for i in range(num_node)] + neighbor
    return num_node, edges, center


def _hop_distance(num_node, edges, max_hop=1):
    A = np.zeros((num_node, num_node))
    for i, j in edges:
        A[j, i] = 1
        A[i, j] = 1
    hop_dis = np.full((num_node, num_node), np.inf)
    transfer = [np.linalg.matrix_power(A, d) for d in range(max_hop + 1)]
    arrive = np.stack(transfer) > 0
    for d in range(max_hop, -1, -1):
        hop_dis[arrive[d]] = d
    return hop_dis


def _normalize_digraph(A):
    Dl = A.sum(0)
    Dn = np.zeros_like(A)
    for i in range(A.shape[0]):
        if Dl[i] > 0:
            Dn[i, i] = Dl[i] ** -1
    return A @ Dn


def build_graph_adjacency(
    layout: str = "smpl", strategy: str = "spatial", max_hop: int = 1, dilation: int = 1
) -> np.ndarray:
    """Partitioned adjacency [K, V, V] (reference stgcnutils/graph.py)."""
    num_node, edges, center = _get_edges(layout)
    hop_dis = _hop_distance(num_node, edges, max_hop)
    valid_hop = range(0, max_hop + 1, dilation)
    adjacency = np.zeros((num_node, num_node))
    for hop in valid_hop:
        adjacency[hop_dis == hop] = 1
    norm_adj = _normalize_digraph(adjacency)

    if strategy == "uniform":
        return norm_adj[None]
    if strategy == "distance":
        A = np.zeros((len(list(valid_hop)), num_node, num_node))
        for i, hop in enumerate(valid_hop):
            A[i][hop_dis == hop] = norm_adj[hop_dis == hop]
        return A
    if strategy == "spatial":
        A = []
        for hop in valid_hop:
            a_root = np.zeros((num_node, num_node))
            a_close = np.zeros((num_node, num_node))
            a_further = np.zeros((num_node, num_node))
            for i in range(num_node):
                for j in range(num_node):
                    if hop_dis[j, i] == hop:
                        if hop_dis[j, center] == hop_dis[i, center]:
                            a_root[j, i] = norm_adj[j, i]
                        elif hop_dis[j, center] > hop_dis[i, center]:
                            a_close[j, i] = norm_adj[j, i]
                        else:
                            a_further[j, i] = norm_adj[j, i]
            if hop == 0:
                A.append(a_root)
            else:
                A.append(a_root + a_close)
                A.append(a_further)
        return np.stack(A)
    raise NotImplementedError(strategy)


class _FrozenBN(nn.Module):
    """Inference-mode batch norm: y = (x - mean) / sqrt(var+eps) * g + b."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class STGCNBlock(nn.Module):
    out_channels: int
    spatial_kernel: int
    temporal_kernel: int = 9
    stride: int = 1
    residual: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, A: jnp.ndarray) -> jnp.ndarray:
        # x: [N, T, V, C]; A: [K, V, V]
        K = self.spatial_kernel
        C_out = self.out_channels
        in_channels = x.shape[-1]

        res = None
        if not self.residual:
            res = 0.0
        elif in_channels == C_out and self.stride == 1:
            res = x
        else:
            r = nn.Conv(C_out, (1, 1), strides=(self.stride, 1), name="res_conv")(x)
            res = _FrozenBN(C_out, name="res_bn")(r)

        # Graph conv: 1x1 conv to K*C then contract with A.
        h = nn.Conv(K * C_out, (1, 1), name="gcn_conv")(x)  # [N, T, V, K*C]
        h = h.reshape(h.shape[:3] + (K, C_out))
        h = jnp.einsum("ntvkc,kvw->ntwc", h, A)

        # Temporal conv (k x 1) with BN-ReLU pre / BN post.
        h = _FrozenBN(C_out, name="tcn_bn1")(h)
        h = jax.nn.relu(h)
        pad = (self.temporal_kernel - 1) // 2
        h = nn.Conv(
            C_out, (self.temporal_kernel, 1), strides=(self.stride, 1),
            padding=[(pad, pad), (0, 0)], name="tcn_conv",
        )(h)
        h = _FrozenBN(C_out, name="tcn_bn2")(h)
        return jax.nn.relu(h + res)


@dataclass(frozen=True)
class STGCNConfig:
    in_channels: int = 6
    num_class: int = 40
    layout: str = "smpl"
    strategy: str = "spatial"
    edge_importance: bool = True
    channels: Tuple[Tuple[int, int], ...] = (
        (64, 1), (64, 1), (64, 1), (64, 1), (128, 2),
        (128, 1), (128, 1), (256, 2), (256, 1), (256, 1),
    )


class STGCN(nn.Module):
    """x [N, T, V, C] -> dict(features [N, 256], yhat [N, num_class])."""

    config: STGCNConfig = STGCNConfig()

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        cfg = self.config
        A = jnp.asarray(build_graph_adjacency(cfg.layout, cfg.strategy), jnp.float32)
        K, V, _ = A.shape
        N, T, _, C = x.shape

        # data_bn over V*C features. torch flattens [N, M, V, C, T] ->
        # (N*M, V*C, T), i.e. V-major ordering — our [N,T,V,C] reshape matches.
        flat = x.reshape(N, T, V * C)
        flat = _FrozenBN(V * C, name="data_bn")(flat)
        h = flat.reshape(N, T, V, C)

        for i, (c_out, stride) in enumerate(cfg.channels):
            Ai = A
            if cfg.edge_importance:
                imp = self.param(f"edge_importance_{i}", nn.initializers.ones, (K, V, V))
                Ai = A * imp
            h = STGCNBlock(
                c_out, K, stride=stride, residual=(i != 0), name=f"st_gcn_{i}"
            )(h, Ai)

        feat = h.mean(axis=(1, 2))  # global avg pool -> [N, 256]
        yhat = nn.Dense(cfg.num_class, name="fcn")(feat)
        return {"features": feat, "yhat": yhat}


# ------------------------------------------------------------------ convert
def convert_stgcn(sd: Mapping[str, np.ndarray], config: STGCNConfig) -> Dict:
    """Reference torch STGCN state_dict -> flax params."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    t_conv = lambda w: np.transpose(w, (2, 3, 1, 0))  # [O,I,kh,kw]->[kh,kw,I,O]

    def bn(p):
        return {
            "scale": sd[f"{p}.weight"], "bias": sd[f"{p}.bias"],
            "mean": sd[f"{p}.running_mean"], "var": sd[f"{p}.running_var"],
        }

    params: Dict = {"data_bn": bn("data_bn")}
    for i in range(len(config.channels)):
        p = f"st_gcn_networks.{i}"
        blk = {
            "gcn_conv": {
                "kernel": t_conv(sd[f"{p}.gcn.conv.weight"]),
                "bias": sd[f"{p}.gcn.conv.bias"],
            },
            "tcn_bn1": bn(f"{p}.tcn.0"),
            "tcn_conv": {
                "kernel": t_conv(sd[f"{p}.tcn.2.weight"]),
                "bias": sd[f"{p}.tcn.2.bias"],
            },
            "tcn_bn2": bn(f"{p}.tcn.3"),
        }
        if f"{p}.residual.0.weight" in sd:
            blk["res_conv"] = {
                "kernel": t_conv(sd[f"{p}.residual.0.weight"]),
                "bias": sd[f"{p}.residual.0.bias"],
            }
            blk["res_bn"] = bn(f"{p}.residual.1")
        params[f"st_gcn_{i}"] = blk
        if config.edge_importance:
            params[f"edge_importance_{i}"] = sd[f"edge_importance.{i}"]
    # fcn is a 1x1 conv2d [num_class, 256, 1, 1] -> dense
    params["fcn"] = {
        "kernel": np.transpose(sd["fcn.weight"][..., 0, 0], (1, 0)),
        "bias": sd["fcn.bias"],
    }
    return {"params": params}
