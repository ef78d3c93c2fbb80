"""End-to-end sampling pipeline tests (random weights, tiny shapes)."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.diffusion import Schedule
from mdm_tpu.models import MDM, Conditioning, MDMConfig
from mdm_tpu.sampling import (
    GenerationConfig,
    MotionGenerator,
    in_between_mask,
    upper_body_mask,
)

RNG = np.random.default_rng(5)


def tiny_mdm(**kw):
    cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4, **kw)
    model = MDM(cfg)
    x = jnp.zeros((1, 8, 263))
    cond = Conditioning(text_embed=jnp.zeros((1, 512)),
                        prefix=jnp.zeros((1, cfg.context_len, 263)) if cfg.context_len else None)
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32), cond)
    return model, params


class TestGenerate:
    def test_text_to_motion_pipeline(self):
        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="10")
        gen = MotionGenerator(
            model, params, sched, GenerationConfig(guidance_scale=2.5), "humanml"
        )
        B, T = 2, 24
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, T), bool),
        )
        out = gen.generate(cond, B, T, jax.random.PRNGKey(1))
        assert out["features"].shape == (B, T, 263)
        assert out["joints"].shape == (B, T, 22, 3)
        assert np.isfinite(np.asarray(out["joints"])).all()

    def test_autoregressive_dip(self):
        ctx, pred = 4, 8
        model, params = tiny_mdm(arch="trans_dec", context_len=ctx, pred_len=pred,
                                 text_dim=512, emb_policy="add")
        sched = Schedule.create("cosine", 1000, timestep_respacing="10")
        gen = MotionGenerator(
            model, params, sched,
            GenerationConfig(guidance_scale=7.5, autoregressive=True,
                             context_len=ctx, pred_len=pred),
            "humanml",
        )
        B, frames = 2, 20  # not divisible by pred: 3 chunks, truncate to 20
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, pred), bool),
            prefix=jnp.asarray(RNG.normal(size=(B, ctx, 263)).astype(np.float32)),
        )
        feats = gen.sample_autoregressive(
            cond, B, jax.random.PRNGKey(2), required_frames=frames
        )
        assert feats.shape == (B, frames, 263)
        assert np.isfinite(np.asarray(feats)).all()

    def test_edit_in_between_preserves_gt(self):
        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="10")
        gen = MotionGenerator(model, params, sched, GenerationConfig(), "humanml")
        B, T = 2, 16
        gt = RNG.normal(size=(B, T, 263)).astype(np.float32)
        lengths = np.array([16, 12])
        mask = in_between_mask(lengths, T, 263)
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, T), bool),
        )
        feats = gen.sample_features(
            cond, B, T, jax.random.PRNGKey(3),
            inpainting_mask=jnp.asarray(mask), inpainted_motion=jnp.asarray(gt),
        )
        np.testing.assert_allclose(np.asarray(feats)[mask], gt[mask], atol=1e-5)

    def test_edit_preserves_gt_all_samplers(self):
        """The inpainting invariant must hold for every sampler the edit CLI
        can select (--sampler), including the ODE solver."""
        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="10")
        B, T = 2, 16
        gt = RNG.normal(size=(B, T, 263)).astype(np.float32)
        mask = in_between_mask(np.array([16, 12]), T, 263)
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, T), bool),
        )
        for sampler in ("ddim", "plms", "dpmpp_2m"):
            gen = MotionGenerator(
                model, params, sched, GenerationConfig(sampler=sampler), "humanml"
            )
            feats = gen.sample_features(
                cond, B, T, jax.random.PRNGKey(3),
                inpainting_mask=jnp.asarray(mask), inpainted_motion=jnp.asarray(gt),
            )
            np.testing.assert_allclose(
                np.asarray(feats)[mask], gt[mask], atol=1e-5,
                err_msg=f"sampler={sampler}",
            )

    def test_in_between_mask_reference_semantics(self):
        """Reference edit.py:79-85: all-True start, cleared ONLY in
        [prefix_end*L, suffix_start*L) — padding frames past each sample's
        length keep GT (never free-generated)."""
        mask = in_between_mask(np.array([12]), 16, 3)
        assert mask[0, :3].all()          # prefix: int(0.25*12) = 3
        assert not mask[0, 3:9].any()     # edit window [3, 9)
        assert mask[0, 9:12].all()        # suffix
        assert mask[0, 12:].all()         # zero-padding stays GT

    def test_upper_body_mask_shape(self):
        m = upper_body_mask(10, 3)
        assert m.shape == (3, 10, 263)
        # lower body + root + foot-contact are kept
        assert m[0, 0, :4].all() and m[0, 0, -4:].all()


class TestCachedCFG:
    def test_interval_equivalence_and_speedup_path(self):
        """cached-CFG with a fresh uncond every step must equal exact CFG;
        interval=2 must run and produce finite different output."""
        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="8")
        B, T = 2, 16
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, T), bool),
        )
        key = jax.random.PRNGKey(4)

        def run(interval):
            gen = MotionGenerator(
                model, params, sched,
                GenerationConfig(guidance_scale=2.5, cfg_cache_interval=interval),
                "humanml",
            )
            return np.asarray(gen.sample_features(cond, B, T, key))

        exact = run(0)
        cached2 = run(2)
        assert np.isfinite(cached2).all()
        # with random weights the smoothness premise doesn't hold, so the
        # outputs differ; exactness is checked separately below.
        assert not np.allclose(cached2, exact)

    def test_cache_exact_when_uncond_t_independent(self):
        """If the uncond model output does not depend on t, cached CFG must
        EQUAL exact CFG for any interval."""
        from mdm_tpu.diffusion import SamplerConfig, ddim_sample_loop

        B, T, D = 2, 8, 6
        w = RNG.normal(size=(T, D)).astype(np.float32) * 0.1
        scale = 2.5

        def cond_out(x):
            return jnp.tanh(x + jnp.asarray(w))

        def uncond_out(x0_shape):
            return jnp.asarray(w)[None].repeat(B, 0) * 0.5  # constant in x, t

        def exact_fn(x, t):
            u = uncond_out(x.shape)
            return u + scale * (cond_out(x) - u)

        def cached_fn(x, t, state):
            u_fresh = uncond_out(x.shape)
            fresh = (state["i"] % 3) == 0
            u = jax.lax.cond(fresh, lambda _: u_fresh, lambda _: state["uncond"], None)
            return u + scale * (cond_out(x) - u), {"uncond": u, "i": state["i"] + 1}

        sched = Schedule.create("cosine", 12)
        noise = jnp.asarray(RNG.normal(size=(B, T, D)).astype(np.float32))
        key = jax.random.PRNGKey(0)
        exact = ddim_sample_loop(exact_fn, sched, noise, key, SamplerConfig())
        cached = ddim_sample_loop(
            cached_fn, sched, noise, key, SamplerConfig(),
            model_state={"uncond": jnp.zeros((B, T, D)), "i": jnp.zeros((), jnp.int32)},
        )
        np.testing.assert_allclose(np.asarray(cached), np.asarray(exact), atol=1e-6)


class TestAllSamplersThroughGenerator:
    @pytest.mark.parametrize("sampler", ["ddpm", "ddim", "plms", "dpmpp_2m"])
    def test_generator_with_sampler(self, sampler):
        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="8")
        gen = MotionGenerator(
            model, params, sched,
            GenerationConfig(guidance_scale=2.5, sampler=sampler), "humanml",
        )
        B, T = 2, 16
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, T), bool),
        )
        feats = gen.sample_features(cond, B, T, jax.random.PRNGKey(1))
        assert feats.shape == (B, T, 263)
        assert np.isfinite(np.asarray(feats)).all()


class TestDataParallelSampling:
    """DP-sharded sampling (MotionGenerator mesh=...): new capability vs the
    single-GPU reference. Sharding the batch axis must not change any
    number, and non-divisible batches must fall back gracefully."""

    def _cond(self, B, T):
        return Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            frames_mask=jnp.ones((B, T), bool),
        )

    def test_sharded_matches_unsharded(self):
        from mdm_tpu.parallel import make_mesh

        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="10")
        cfg = GenerationConfig(guidance_scale=2.5)
        B, T = 8, 24
        cond = self._cond(B, T)
        key = jax.random.PRNGKey(4)

        plain = MotionGenerator(model, params, sched, cfg, "humanml")
        a = np.asarray(plain.sample_features(cond, B, T, key))

        mesh = make_mesh()  # 8-way virtual CPU mesh (conftest)
        assert mesh.size == 8
        sharded = MotionGenerator(model, params, sched, cfg, "humanml", mesh=mesh)
        # the shard helper really distributes the batch axis
        probe = sharded._shard(jnp.zeros((B, T, 263)))
        assert not probe.sharding.is_fully_replicated
        b = np.asarray(sharded.sample_features(cond, B, T, key))
        np.testing.assert_allclose(a, b, atol=1e-4)

    def test_non_divisible_batch_falls_back(self):
        from mdm_tpu.parallel import make_mesh

        model, params = tiny_mdm()
        sched = Schedule.create("cosine", 1000, timestep_respacing="8")
        gen = MotionGenerator(
            model, params, sched, GenerationConfig(guidance_scale=2.5),
            "humanml", mesh=make_mesh(),
        )
        B, T = 3, 16  # 3 % 8 != 0 -> unsharded path
        feats = gen.sample_features(self._cond(B, T), B, T, jax.random.PRNGKey(1))
        assert feats.shape == (B, T, 263)
        assert np.isfinite(np.asarray(feats)).all()

    def test_autoregressive_sharded_matches(self):
        from mdm_tpu.parallel import make_mesh

        ctx, pred = 4, 8
        model, params = tiny_mdm(arch="trans_dec", context_len=ctx, pred_len=pred)
        sched = Schedule.create("cosine", 1000, timestep_respacing="5")
        cfg = GenerationConfig(
            guidance_scale=7.5, autoregressive=True,
            context_len=ctx, pred_len=pred,
        )
        B = 8
        cond = Conditioning(
            text_embed=jnp.asarray(RNG.normal(size=(B, 512)).astype(np.float32)),
            prefix=jnp.asarray(RNG.normal(size=(B, ctx, 263)).astype(np.float32)),
        )
        key = jax.random.PRNGKey(6)
        plain = MotionGenerator(model, params, sched, cfg, "humanml")
        a = np.asarray(plain.sample_autoregressive(cond, B, key, required_frames=24))
        sharded = MotionGenerator(model, params, sched, cfg, "humanml",
                                  mesh=make_mesh())
        b = np.asarray(sharded.sample_autoregressive(cond, B, key, required_frames=24))
        np.testing.assert_allclose(a, b, atol=1e-4)
