"""Evaluator networks parity (vs torch originals) + metric parity."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.eval import metrics as M
from mdm_tpu.eval.networks import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
    convert_motion_encoder,
    convert_movement_encoder,
    convert_text_encoder,
)

RNG = np.random.default_rng(13)


@pytest.fixture(scope="module")
def ref_modules(reference_path):
    import data_loaders.humanml.networks.modules as mods
    return mods


def sd_np(m):
    return {k: v.detach().numpy() for k, v in m.state_dict().items()}


class TestEvaluatorNetworks:
    def test_movement_encoder_parity(self, ref_modules):
        import torch
        torch.manual_seed(0)
        ref = ref_modules.MovementConvEncoder(259, 64, 64).eval()
        params = convert_movement_encoder(sd_np(ref))
        x = RNG.normal(size=(3, 16, 259)).astype(np.float32)
        with torch.no_grad():
            theirs = ref(torch.from_numpy(x)).numpy()
        ours = MovementConvEncoder(64, 64).apply(params, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-5)

    def test_motion_encoder_parity(self, ref_modules):
        import torch
        torch.manual_seed(1)
        ref = ref_modules.MotionEncoderBiGRUCo(
            input_size=64, hidden_size=48, output_size=32, device="cpu"
        ).eval()
        params = convert_motion_encoder(sd_np(ref))
        B, T = 4, 12
        x = RNG.normal(size=(B, T, 64)).astype(np.float32)
        # pack_padded_sequence requires descending lengths
        lens = np.array([12, 9, 5, 3])
        with torch.no_grad():
            theirs = ref(torch.from_numpy(x), torch.from_numpy(lens)).numpy()
        ours = MotionEncoderBiGRUCo(64, 48, 32).apply(
            params, jnp.asarray(x), jnp.asarray(lens)
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)

    def test_motion_encoder_order_independent(self, ref_modules):
        """Our masked biGRU must not require length-sorted batches."""
        import torch
        torch.manual_seed(2)
        ref = ref_modules.MotionEncoderBiGRUCo(
            input_size=10, hidden_size=16, output_size=8, device="cpu"
        ).eval()
        params = convert_motion_encoder(sd_np(ref))
        B, T = 3, 9
        x = RNG.normal(size=(B, T, 10)).astype(np.float32)
        lens = np.array([4, 9, 6])  # unsorted!
        order = np.argsort(-lens)
        with torch.no_grad():
            theirs_sorted = ref(
                torch.from_numpy(x[order]), torch.from_numpy(lens[order])
            ).numpy()
        ours = np.asarray(
            MotionEncoderBiGRUCo(10, 16, 8).apply(params, jnp.asarray(x), jnp.asarray(lens))
        )
        np.testing.assert_allclose(ours[order], theirs_sorted, atol=3e-5)

    def test_text_encoder_parity(self, ref_modules):
        import torch
        torch.manual_seed(3)
        ref = ref_modules.TextEncoderBiGRUCo(
            word_size=30, pos_size=15, hidden_size=24, output_size=16, device="cpu"
        ).eval()
        params = convert_text_encoder(sd_np(ref))
        B, L = 4, 8
        w = RNG.normal(size=(B, L, 30)).astype(np.float32)
        p = np.eye(15, dtype=np.float32)[RNG.integers(0, 15, size=(B, L))]
        lens = np.array([8, 7, 5, 2])
        with torch.no_grad():
            theirs = ref(
                torch.from_numpy(w), torch.from_numpy(p), torch.from_numpy(lens)
            ).numpy()
        ours = TextEncoderBiGRUCo(30, 15, 24, 16).apply(
            params, jnp.asarray(w), jnp.asarray(p), jnp.asarray(lens)
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)


class TestMetrics:
    @pytest.fixture(scope="class")
    def ref_metrics(self, reference_path):
        import data_loaders.humanml.utils.metrics as rm
        return rm

    def test_distance_matrix_and_topk(self, ref_metrics):
        a = RNG.normal(size=(10, 8))
        b = RNG.normal(size=(10, 8))
        np.testing.assert_allclose(
            M.euclidean_distance_matrix(a, b),
            ref_metrics.euclidean_distance_matrix(a, b),
            atol=1e-8,
        )
        dist = M.euclidean_distance_matrix(a, b)
        argsm = np.argsort(dist, axis=1)
        np.testing.assert_array_equal(
            M.calculate_top_k(argsm, 3), ref_metrics.calculate_top_k(argsm, 3)
        )

    def test_matching_score(self, ref_metrics):
        a = RNG.normal(size=(12, 6))
        b = RNG.normal(size=(12, 6))
        s_ours = M.calculate_matching_score(a, b, sum_all=True)
        s_ref = ref_metrics.calculate_matching_score(a, b, sum_all=True)
        assert abs(s_ours - s_ref) < 1e-6
        r = M.calculate_R_precision(a, b, sum_all=True)
        assert r.shape == (3,) and (np.diff(r) >= 0).all()

    def test_fid(self, ref_metrics):
        a = RNG.normal(size=(100, 16))
        b = RNG.normal(size=(120, 16)) + 0.3
        mu1, s1 = M.calculate_activation_statistics(a)
        mu2, s2 = M.calculate_activation_statistics(b)
        rmu1, rs1 = ref_metrics.calculate_activation_statistics(a)
        np.testing.assert_allclose(mu1, rmu1, atol=1e-10)
        ours = M.calculate_frechet_distance(mu1, s1, mu2, s2)
        theirs = ref_metrics.calculate_frechet_distance(rmu1, rs1, mu2, s2)
        assert abs(ours - theirs) < 1e-8

    def test_diversity_multimodality(self, ref_metrics):
        # RandomState(0).choice reproduces the reference's global
        # np.random.seed(0) stream exactly; ours takes the RNG explicitly.
        act = RNG.normal(size=(50, 16))
        ours = M.calculate_diversity(act, 20, rng=np.random.RandomState(0))
        np.random.seed(0)
        theirs = ref_metrics.calculate_diversity(act, 20)
        assert abs(ours - theirs) < 1e-8

        act3 = RNG.normal(size=(10, 8, 16))
        ours = M.calculate_multimodality(act3, 4, rng=np.random.RandomState(1))
        np.random.seed(1)
        theirs = ref_metrics.calculate_multimodality(act3, 4)
        assert abs(ours - theirs) < 1e-8

    def test_diversity_reproducible_with_generator(self):
        act = RNG.normal(size=(50, 16))
        a = M.calculate_diversity(act, 20, rng=np.random.default_rng(7))
        np.random.seed(123)  # unrelated global seeding must not matter
        b = M.calculate_diversity(act, 20, rng=np.random.default_rng(7))
        assert a == b

    def test_kid_sane(self):
        a = RNG.normal(size=(80, 8))
        same_mean, _ = M.calculate_kid(a, a + RNG.normal(size=a.shape) * 1e-3,
                                       n_subsets=5, subset_size=40)
        far_mean, _ = M.calculate_kid(a, a + 2.0, n_subsets=5, subset_size=40)
        assert far_mean > same_mean

    def test_kid_mmd_oracle(self, reference_path):
        """polynomial_mmd matches the reference's unbiased MMD^2 estimator
        (eval/unconstrained/metrics/kid.py:30-41)."""
        pytest.importorskip("sklearn")
        from eval.unconstrained.metrics.kid import polynomial_mmd as ref_mmd

        g = RNG.normal(size=(60, 16))
        r = RNG.normal(size=(60, 16)) + 0.3
        ours = M.polynomial_mmd(g, r)
        theirs = ref_mmd(g, r, ret_var=False)
        np.testing.assert_allclose(ours, theirs, rtol=1e-6)

    def test_precision_recall_oracle(self, reference_path):
        """k-NN manifold precision/recall matches the reference exactly
        (eval/unconstrained/metrics/precision_recall.py:12-53)."""
        import torch
        from eval.unconstrained.metrics.precision_recall import (
            precision_and_recall as ref_pr,
        )

        gen = RNG.normal(size=(40, 6)).astype(np.float32)
        real = (RNG.normal(size=(40, 6)) * 1.2 + 0.5).astype(np.float32)
        ours = M.precision_and_recall(gen, real)
        theirs = ref_pr(
            [torch.from_numpy(x) for x in gen],
            [torch.from_numpy(x) for x in real],
        )
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_precision_recall_sane(self):
        real = RNG.normal(size=(100, 4))
        close = real + RNG.normal(size=real.shape) * 0.05
        far = real + 50.0
        p_close, r_close = M.precision_and_recall(close, real)
        p_far, r_far = M.precision_and_recall(far, real)
        assert p_close > 0.9 and r_close > 0.9
        assert p_far < 0.1 and r_far < 0.1


class TestLenEstimator:
    def test_len_estimator_parity(self, ref_modules):
        import torch
        from mdm_tpu.eval.networks import (
            MotionLenEstimatorBiGRU,
            convert_len_estimator,
        )

        torch.manual_seed(5)
        ref = ref_modules.MotionLenEstimatorBiGRU(30, 15, 24, 10).eval()
        params = convert_len_estimator(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()}
        )
        B, L = 3, 6
        w = RNG.normal(size=(B, L, 30)).astype(np.float32)
        p = np.eye(15, dtype=np.float32)[RNG.integers(0, 15, size=(B, L))]
        lens = np.array([6, 4, 2])
        with torch.no_grad():
            theirs = ref(
                torch.from_numpy(w), torch.from_numpy(p), torch.from_numpy(lens)
            ).numpy()
        ours = MotionLenEstimatorBiGRU(30, 15, 24, 10).apply(
            params, jnp.asarray(w), jnp.asarray(p), jnp.asarray(lens)
        )
        np.testing.assert_allclose(np.asarray(ours), theirs, atol=3e-5)
