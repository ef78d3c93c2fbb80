"""End-to-end generation pipeline: text -> motion joints.

TPU-native equivalent of sample/generate.py + utils/sampler_util.py in the
reference. The entire denoise loop (CFG double-batch included) is one jitted
XLA program; text encoding happens once per batch on entry; decode to joints
(`recover_from_ric`) is also jitted. The autoregressive DiP sampler runs the
jitted chunk program in a host loop, carrying the 20-frame prefix.
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import hml_codec
from ..diffusion import SamplerConfig, Schedule, samplers
from ..models.mdm import MDM, Conditioning, MDMConfig, cfg_denoiser

STATS_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "assets", "stats")


def _with_auto_sample_block(jitted, single_device: bool):
    """Bind the forward-only whole-block attention kernel's AUTO decision
    to this sampling program: on for single-device generation (it wins at
    every measured batch size, docs/BENCHMARKS.md sampling shootout), off
    on a multi-device mesh (pallas_call carries no SPMD partitioning rule,
    so DP/TP sampling keeps the XLA path). Re-asserted before every call —
    tracing is deferred to the first call; an explicit
    ops.enable_pallas_sample_block(True/False) overrides entirely."""
    from .. import ops

    def call(*args, **kwargs):
        prev = ops._AUTO_SAMPLE_BLOCK
        ops._set_auto_sample_block(single_device)
        try:
            return jitted(*args, **kwargs)
        finally:
            # Restore so unrelated modules jitted later don't silently
            # trace through the fused kernels (ADVICE r4).
            ops._set_auto_sample_block(prev)

    return call


def auto_mesh():
    """Data-parallel mesh over all visible devices for sampling/eval CLIs.

    Returns None on a single device — NamedSharding annotations on a
    1-device mesh cost per-call relayout copies (docs/BENCHMARKS.md
    pitfalls), so single-chip runs stay annotation-free.
    """
    if len(jax.devices()) <= 1:
        return None
    from ..parallel.mesh import make_mesh

    return make_mesh()


def load_norm_stats(dataset: str = "humanml"):
    """Bundled evaluator-family stats (assets/stats) — fallback only."""
    prefix = "t2m" if dataset == "humanml" else "kit"
    mean = np.load(os.path.join(STATS_DIR, f"{prefix}_mean.npy"))
    std = np.load(os.path.join(STATS_DIR, f"{prefix}_std.npy"))
    return mean.astype(np.float32), std.astype(np.float32)


def dataset_norm_stats(data_root: Optional[str]):
    """The dataset's TRAIN stats (Mean/Std.npy) if present, else None."""
    if not data_root:
        return None
    mp, sp = os.path.join(data_root, "Mean.npy"), os.path.join(data_root, "Std.npy")
    if os.path.exists(mp) and os.path.exists(sp):
        return np.load(mp).astype(np.float32), np.load(sp).astype(np.float32)
    return None


@dataclass(frozen=True)
class GenerationConfig:
    guidance_scale: float = 2.5
    sampler: str = "ddpm"  # ddpm | ddim | plms | dpmpp_2m
    clip_denoised: bool = False
    max_frames: int = 196
    # DiP autoregressive generation
    autoregressive: bool = False
    context_len: int = 20
    pred_len: int = 40
    autoregressive_include_prefix: bool = False
    # >1 enables cached-CFG: recompute the uncond branch every k steps and
    # reuse it otherwise (1 + 1/k forwards per step instead of 2). 0/1 = exact.
    cfg_cache_interval: int = 0


class MotionGenerator:
    """Holds model+schedule and compiles samplers once per (shape, config)."""

    def __init__(
        self,
        model: MDM,
        params,
        sched: Schedule,
        config: GenerationConfig = GenerationConfig(),
        dataset: str = "humanml",
        norm_stats=None,
        mesh=None,
        shard_map_kernels=None,
    ):
        """norm_stats: (mean, std) the MODEL was trained with (the dataset's
        Mean/Std.npy — reference inv_transform, dataset.py:309-310). Falls
        back to the bundled t2m/kit stats when not provided (close but not
        identical; pass the real train stats whenever the data dir exists).

        mesh: optional multi-device `jax.sharding.Mesh` (with a 'data' axis).
        When given, params are replicated and every sampling batch is sharded
        over the data axis — generation and the eval protocol scale linearly
        with chip count (new capability; the reference is single-GPU). On a
        1-device mesh the annotations are skipped entirely (they cost per-call
        relayout copies). If the mesh also has a 'model' axis of size > 1,
        params are Megatron-sharded per parallel/tp_rules.py instead of
        replicated — tensor-parallel sampling, which cuts single-batch
        latency (the serving case) by splitting every attention/FFN matmul
        across chips with XLA-inserted all-reduces.

        shard_map_kernels: on a pure-DP mesh the whole denoise scan can run
        under `jax.shard_map` over the batch axes — each shard then executes
        its own pallas_call, so the fused sample-block + encoder-tail
        kernels (the single-device winners) carry onto DP meshes instead of
        silently falling back to XLA (VERDICT r4 item 1). None = auto: on
        for TPU DP meshes (or under ops.enable_pallas_interpret for CPU
        tests), off for TP. The per-shard sampling keys are fold_in'd with
        the shard index, so shards draw decorrelated noise.
        """
        self.model = model
        self.params = params
        self.mesh = mesh if (mesh is not None and mesh.size > 1) else None
        self._sm_axes = None  # batch axis names when shard_map-sampling
        if self.mesh is not None:
            from ..parallel.mesh import MODEL_AXIS, batch_axes, replicated

            if dict(self.mesh.shape).get(MODEL_AXIS, 1) > 1:
                from ..parallel.tp_rules import param_shardings

                self.params = jax.tree_util.tree_map(
                    lambda x, s: jax.device_put(x, s),
                    params, param_shardings(params, self.mesh),
                )
            else:
                self.params = jax.device_put(params, replicated(self.mesh))
                from .. import ops as _ops

                use_sm = (_ops.kernel_backend_ok()
                          if shard_map_kernels is None else shard_map_kernels)
                if use_sm:
                    ax = batch_axes(self.mesh)
                    self._sm_axes = (ax,) if isinstance(ax, str) else tuple(ax)
        self.sched = sched
        self.config = config
        if config.cfg_cache_interval > 1 and config.sampler not in ("ddpm", "ddim"):
            raise ValueError(
                f"cfg_cache_interval={config.cfg_cache_interval} is only "
                f"supported for the ddpm/ddim samplers (the plms/dpmpp_2m "
                f"multistep solvers thread their own per-step model state); "
                f"got sampler={config.sampler!r}. Drop --cfg_cache_interval "
                f"or switch samplers."
            )
        self.dataset = dataset
        self.joints_num = 22 if dataset == "humanml" else 21
        if norm_stats is not None:
            self.mean, self.std = (
                np.asarray(norm_stats[0], np.float32),
                np.asarray(norm_stats[1], np.float32),
            )
        elif model.config.data_rep == "hml_vec":
            self.mean, self.std = load_norm_stats(dataset)
        else:
            self.mean = self.std = None

        # Jit-compiled entry points (params passed as traced args so one
        # compilation serves updated params, e.g. EMA swaps).
        sampler = samplers.SAMPLERS[self.config.sampler]
        scfg = SamplerConfig(clip_denoised=self.config.clip_denoised)

        def _raw_sample(params, cond, noise, key, inpainting_mask, inpainted_motion):
            model_state = None
            if self.config.guidance_scale != 1.0:
                if self.config.cfg_cache_interval > 1 and self.config.sampler in ("ddpm", "ddim"):
                    from ..models.mdm import cfg_denoiser_cached

                    cached, init_state = cfg_denoiser_cached(
                        lambda p, x, t, c: self.model.apply(p, x, t, c),
                        params,
                        self.config.guidance_scale,
                        self.config.cfg_cache_interval,
                    )
                    model_fn = lambda x, t, s: cached(x, t, cond, s)
                    model_state = init_state(noise.shape, noise.dtype)
                else:
                    base = cfg_denoiser(
                        lambda p, x, t, c: self.model.apply(p, x, t, c),
                        params,
                        self.config.guidance_scale,
                    )
                    model_fn = lambda x, t: base(x, t, cond)
            else:
                model_fn = lambda x, t: self.model.apply(params, x, t, cond)
            kwargs = dict(
                inpainting_mask=inpainting_mask, inpainted_motion=inpainted_motion
            )
            if model_state is not None:
                kwargs["model_state"] = model_state
            return sampler(model_fn, self.sched, noise, key, scfg, **kwargs)

        self._raw_sample = _raw_sample
        self._sample_jit = _with_auto_sample_block(
            jax.jit(_raw_sample), self.mesh is None)
        if self._sm_axes:
            # DP-mesh kernel path: the whole denoise scan under shard_map —
            # each shard runs its own pallas_call, so the fused sample-block
            # + encoder-tail kernels survive the mesh (VERDICT r4 item 1).
            def _sm_sample(params, cond, noise, key, im, imo):
                spec0 = self._sm_leaf_spec(noise.shape[0], 0)

                def local(params, cond, noise, key, im, imo):
                    # Decorrelate per-shard sampling noise; cheap and
                    # distributionally equivalent to the global draw.
                    key = jax.random.fold_in(key, self._sm_linear_index())
                    return _raw_sample(params, cond, noise, key, im, imo)

                return jax.shard_map(
                    local,
                    mesh=self.mesh,
                    check_vma=False,  # pallas out_shape has no vma
                    in_specs=(
                        jax.sharding.PartitionSpec(),
                        jax.tree.map(spec0, cond),
                        spec0(noise),
                        jax.sharding.PartitionSpec(),
                        jax.tree.map(spec0, im),
                        jax.tree.map(spec0, imo),
                    ),
                    out_specs=spec0(noise),
                )(params, cond, noise, key, im, imo)

            self._sample_jit_sm = _with_auto_sample_block(
                jax.jit(_sm_sample), True)

        def _ar_scan(params, init_prefix, stacked_cond, keys, chunk_noise=None):
            """Whole DiP autoregressive generation as ONE XLA program.

            lax.scan over chunks; the context_len-frame prefix is the carry
            (device-resident, never copied to host). stacked_cond carries any
            per-chunk conditioning (dynamic text) with a leading chunk axis.
            `chunk_noise` [n_iters, B, pred_len, D] optionally overrides the
            per-chunk init noise (determinism hook for parity tests).
            Returns [B, n_iters * pred_len, D].
            """
            B = init_prefix.shape[0]
            D = self.model.config.input_feats

            def body(prefix, xs):
                cond_i, k, noise_i = xs
                k, nk = jax.random.split(k)
                noise = (
                    noise_i
                    if noise_i is not None
                    else jax.random.normal(nk, (B, ccfg_pred_len, D), jnp.float32)
                )
                sample = _raw_sample(
                    params, cond_i.replace(prefix=prefix), noise, k, None, None
                )
                full = jnp.concatenate([prefix, sample], axis=1)
                return full[:, -ccfg_context_len:], sample

            ccfg_pred_len = self.config.pred_len
            ccfg_context_len = self.config.context_len
            _, chunks = jax.lax.scan(
                body, init_prefix, (stacked_cond, keys, chunk_noise)
            )
            # [n_iters, B, pred_len, D] -> [B, n_iters*pred_len, D]
            n_iters = chunks.shape[0]
            return jnp.transpose(chunks, (1, 0, 2, 3)).reshape(B, n_iters * ccfg_pred_len, D)

        self._ar_scan_jit = _with_auto_sample_block(
            jax.jit(_ar_scan), self.mesh is None)
        if self._sm_axes:
            # DiP AR generation under shard_map (same rationale as
            # _sm_sample: keep the fused kernels on DP meshes).
            def _sm_ar(params, init_prefix, stacked_cond, keys,
                       chunk_noise=None):
                B = init_prefix.shape[0]
                spec0 = self._sm_leaf_spec(B, 0)
                spec1 = self._sm_leaf_spec(B, 1)  # [n_iters, B, ...] leaves

                def local(params, init_prefix, stacked_cond, keys,
                          chunk_noise):
                    idx = self._sm_linear_index()
                    keys = jax.vmap(
                        lambda kk: jax.random.fold_in(kk, idx))(keys)
                    return _ar_scan(params, init_prefix, stacked_cond, keys,
                                    chunk_noise)

                return jax.shard_map(
                    local,
                    mesh=self.mesh,
                    check_vma=False,  # pallas out_shape has no vma
                    in_specs=(
                        jax.sharding.PartitionSpec(),
                        spec0(init_prefix),
                        jax.tree.map(spec1, stacked_cond),
                        jax.sharding.PartitionSpec(),
                        jax.tree.map(spec1, chunk_noise),
                    ),
                    out_specs=spec0(init_prefix),
                )(params, init_prefix, stacked_cond, keys, chunk_noise)

            self._ar_scan_jit_sm = _with_auto_sample_block(
                jax.jit(_sm_ar), True)

        if self.mean is not None:
            mean_c, std_c = jnp.asarray(self.mean), jnp.asarray(self.std)

            def _to_joints(feats):
                return hml_codec.recover_from_ric(
                    feats * std_c + mean_c, self.joints_num
                )

            self._to_joints_jit = jax.jit(_to_joints)

    # -------------------------------------------------- shard_map plumbing
    def _sm_linear_index(self):
        """Linear shard index over the batch axes (inside shard_map only)."""
        idx = jnp.int32(0)
        for name in self._sm_axes:
            idx = idx * jax.lax.psum(1, name) + jax.lax.axis_index(name)
        return idx

    def _sm_leaf_spec(self, batch: int, batch_axis: int):
        """Per-leaf PartitionSpec builder: shard `batch_axis` over the mesh
        batch axes when the leaf carries the batch there, else replicate."""
        from jax.sharding import PartitionSpec as P

        ax = self._sm_axes[0] if len(self._sm_axes) == 1 else self._sm_axes

        def spec(leaf):
            nd = getattr(leaf, "ndim", None)
            if (nd is not None and nd > batch_axis
                    and leaf.shape[batch_axis] == batch):
                s = [None] * (batch_axis + 1)
                s[batch_axis] = ax
                return P(*s)
            return P()

        return spec

    def _sm_ok(self, batch: int) -> bool:
        """True when the shard_map kernel path applies to this batch size."""
        if not self._sm_axes:
            return False
        dp = int(np.prod([dict(self.mesh.shape)[a] for a in self._sm_axes]))
        return batch % dp == 0

    def _shard(self, tree, axis: int = 0):
        """Shard every array's `axis` over the mesh data axis (no-op without
        a mesh, or for leaves whose batch dim doesn't divide)."""
        if self.mesh is None:
            return tree
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import batch_axes

        names = batch_axes(self.mesh)
        names_t = names if isinstance(names, tuple) else (names,)
        dp = int(np.prod([self.mesh.shape[n] for n in names_t]))

        def put(x):
            if x is None or not hasattr(x, "ndim"):
                return x
            x = jnp.asarray(x)
            if x.ndim <= axis or x.shape[axis] % dp != 0:
                return x
            spec = [None] * x.ndim
            spec[axis] = names
            return jax.device_put(x, NamedSharding(self.mesh, P(*spec)))

        return jax.tree_util.tree_map(put, tree)

    # ------------------------------------------------------------ public API
    def sample_features(
        self,
        cond: Conditioning,
        batch_size: int,
        num_frames: int,
        key: jax.Array,
        inpainting_mask: Optional[jnp.ndarray] = None,
        inpainted_motion: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """One diffusion sample: normalized features [B, T, D]."""
        D = self.model.config.input_feats
        key, nk = jax.random.split(key)
        noise = jax.random.normal(nk, (batch_size, num_frames, D), jnp.float32)
        noise, cond, inpainting_mask, inpainted_motion = self._shard(
            (noise, cond, inpainting_mask, inpainted_motion)
        )
        sampler = (self._sample_jit_sm if self._sm_ok(batch_size)
                   else self._sample_jit)
        return sampler(
            self.params, cond, noise, key, inpainting_mask, inpainted_motion
        )

    def sample_autoregressive(
        self,
        cond: Conditioning,
        batch_size: int,
        key: jax.Array,
        required_frames: int = 196,
        per_chunk_cond: Optional[Callable[[int, Conditioning], Conditioning]] = None,
        chunk_noise: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        """DiP: chunked prefix-completion generation of arbitrary length.

        Mirrors AutoRegressiveSampler (reference utils/sampler_util.py:41-81):
        keeps the last `context_len` generated frames as prefix, denoises
        `pred_len` new frames per chunk, optional per-chunk conditioning
        (dynamic text prompts) via `per_chunk_cond`.

        Device-resident: per-chunk conditionings are stacked up front and the
        whole chunk loop runs as one jitted `lax.scan` (prefix as carry) —
        zero host transfers inside the loop. Falls back to a host loop only
        if `per_chunk_cond` returns structurally different pytrees per chunk.
        """
        ccfg = self.config
        assert cond.prefix is not None, "autoregressive sampling requires an initial prefix"
        n_iters = (required_frames // ccfg.pred_len) + int(required_frames % ccfg.pred_len > 0)
        init_prefix = jnp.asarray(cond.prefix)
        base = cond.replace(prefix=None)

        per_chunk = [
            per_chunk_cond(i, base) if per_chunk_cond is not None else base
            for i in range(n_iters)
        ]
        keys = jax.random.split(key, n_iters)
        # Only the stacking step decides fast path vs host loop: a genuine
        # shape/sharding/tracing bug inside _shard/_ar_scan_jit must
        # propagate, not silently fall back to the slow loop.
        try:
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *per_chunk)
        except (TypeError, ValueError):
            stacked = None
        if stacked is not None:
            init_prefix = self._shard(init_prefix)
            stacked = self._shard(stacked, axis=1)  # [n_iters, B, ...]
            ar = (self._ar_scan_jit_sm
                  if self._sm_ok(init_prefix.shape[0]) else self._ar_scan_jit)
            gen = ar(self.params, init_prefix, stacked, keys, chunk_noise)
        else:
            # Structurally inhomogeneous per-chunk conditioning: host loop,
            # still device-resident arrays (no np round-trips).
            prefix, buf = init_prefix, []
            for i in range(n_iters):
                k, nk = jax.random.split(keys[i])
                noise = (
                    chunk_noise[i]
                    if chunk_noise is not None
                    else jax.random.normal(
                        nk,
                        (batch_size, ccfg.pred_len, self.model.config.input_feats),
                        jnp.float32,
                    )
                )
                chunk_sampler = (self._sample_jit_sm if self._sm_ok(batch_size)
                                 else self._sample_jit)
                sample = chunk_sampler(
                    self.params, per_chunk[i].replace(prefix=prefix), noise, k,
                    None, None,
                )
                buf.append(sample)
                prefix = jnp.concatenate([prefix, sample], axis=1)[:, -ccfg.context_len:]
            gen = jnp.concatenate(buf, axis=1)

        if ccfg.autoregressive_include_prefix:
            gen = jnp.concatenate([init_prefix, gen], axis=1)
        return gen[:, :required_frames]

    def features_to_joints(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Denormalize + decode hml_vec features to joints [B, T, J, 3]."""
        if self.mean is None:
            raise ValueError(
                "features_to_joints needs hml_vec norm stats; this generator "
                f"was built for data_rep={self.model.config.data_rep!r} "
                "without norm_stats (a2m/rot6d models decode via rot2xyz)"
            )
        return self._to_joints_jit(feats)

    def generate(
        self,
        cond: Conditioning,
        batch_size: int,
        num_frames: int,
        key: jax.Array,
        **kwargs,
    ):
        """Full pipeline -> dict(features, joints)."""
        if self.config.autoregressive:
            feats = self.sample_autoregressive(
                cond, batch_size, key, required_frames=num_frames
            )
        else:
            feats = self.sample_features(cond, batch_size, num_frames, key, **kwargs)
        out = {"features": feats}
        if self.mean is not None:
            out["joints"] = self.features_to_joints(feats)
        return out


# ---------------------------------------------------------------------------
# Editing (sample/edit.py equivalents)
# ---------------------------------------------------------------------------

def in_between_mask(
    lengths: np.ndarray, num_frames: int, feat_dim: int,
    prefix_end: float = 0.25, suffix_start: float = 0.75,
) -> np.ndarray:
    """Temporal inpainting mask [B, T, D]: True = keep ground truth.

    Reference edit.py:79-85 starts from an ALL-True mask and clears only
    [prefix_end*len, suffix_start*len): everything else — prefix, suffix,
    AND the zero-padding frames past each sample's length — keeps GT, so
    the model never free-generates beyond a sample's true length.
    """
    B = len(lengths)
    mask = np.ones((B, num_frames, feat_dim), dtype=bool)
    for i, L in enumerate(lengths):
        mask[i, int(L * prefix_end) : int(L * suffix_start)] = False
    return mask


def upper_body_mask(num_frames: int, batch_size: int) -> np.ndarray:
    """Feature-space mask [B, T, 263]: True = keep GT (lower body + root)."""
    from ..core.hml_masks import HML_LOWER_BODY_MASK

    return np.broadcast_to(
        HML_LOWER_BODY_MASK[None, None, :], (batch_size, num_frames, len(HML_LOWER_BODY_MASK))
    ).copy()
