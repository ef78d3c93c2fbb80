"""STGCN/GRU classifier parity + end-to-end mini evaluation protocol."""
import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from mdm_tpu.eval.classifiers import MotionDiscriminator, convert_motion_discriminator
from mdm_tpu.eval.stgcn import STGCN, STGCNConfig, build_graph_adjacency, convert_stgcn

RNG = np.random.default_rng(17)


class TestGRUClassifier:
    def test_parity_with_reference(self, reference_path):
        import torch
        from eval.a2m.action2motion.models import MotionDiscriminatorForFID

        torch.manual_seed(0)
        ref = MotionDiscriminatorForFID(
            input_size=54, hidden_size=24, hidden_layer=2, device="cpu", output_size=12
        ).eval()
        params = convert_motion_discriminator(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()}, hidden_layers=2
        )
        B, T = 3, 10
        # reference takes [B, J, F, T]
        x_ref = RNG.normal(size=(B, 18, 3, T)).astype(np.float32)
        lengths = torch.tensor([10, 6, 4])
        with torch.no_grad():
            hidden = torch.zeros(2, B, 24)
            feats_ref = ref(torch.from_numpy(x_ref), lengths, hidden_unit=hidden).numpy()

        x_ours = np.transpose(x_ref.reshape(B, 54, T), (0, 2, 1))
        out = MotionDiscriminator(54, 24, 2, 12).apply(
            params, jnp.asarray(x_ours), jnp.asarray(lengths.numpy())
        )
        np.testing.assert_allclose(np.asarray(out["features"]), feats_ref, atol=3e-5)


class TestSTGCN:
    def test_graph_matches_reference(self, reference_path):
        from eval.a2m.recognition.models.stgcnutils.graph import Graph

        ref = Graph(layout="openpose", strategy="spatial")
        ours = build_graph_adjacency("openpose", "spatial")
        np.testing.assert_allclose(ours, ref.A, atol=1e-10)

    def test_parity_with_reference(self, reference_path):
        import torch
        from eval.a2m.recognition.models.stgcn import STGCN as RefSTGCN

        torch.manual_seed(1)
        ref = RefSTGCN(
            in_channels=4, num_class=7,
            graph_args={"layout": "openpose", "strategy": "spatial"},
            edge_importance_weighting=True, device="cpu",
        ).eval()
        cfg = STGCNConfig(in_channels=4, num_class=7, layout="openpose")
        params = convert_stgcn(
            {k: v.detach().numpy() for k, v in ref.state_dict().items()}, cfg
        )
        B, T, V, C = 2, 16, 18, 4
        x = RNG.normal(size=(B, V, C, T)).astype(np.float32)
        with torch.no_grad():
            out_ref = ref({"output": torch.from_numpy(x), "y": torch.zeros(B, dtype=torch.long)})
        ours = STGCN(cfg).apply(params, jnp.asarray(np.transpose(x, (0, 3, 1, 2))))
        np.testing.assert_allclose(
            np.asarray(ours["yhat"]), out_ref["yhat"].numpy(), atol=1e-3
        )
        np.testing.assert_allclose(
            np.asarray(ours["features"]), out_ref["features"].numpy(), atol=1e-3
        )


class TestEvaluationProtocol:
    def test_mini_evaluation_runs(self, tmp_path):
        """Random-weight evaluator + synthetic loaders through the full
        replication protocol: structure, finiteness, GT-FID ~ 0."""
        from mdm_tpu.eval import EvalConfig, EvaluatorWrapper, evaluation
        from mdm_tpu.eval.networks import (
            MotionEncoderBiGRUCo,
            MovementConvEncoder,
            TextEncoderBiGRUCo,
        )

        B, T, D = 8, 32, 263
        key = jax.random.PRNGKey(0)
        params = {
            "movement": MovementConvEncoder(512, 512).init(
                key, jnp.zeros((1, T, D - 4))
            ),
            "text": TextEncoderBiGRUCo(300, 15, 512, 512).init(
                key, jnp.zeros((1, 5, 300)), jnp.zeros((1, 5, 15)), jnp.array([5])
            ),
            "motion": MotionEncoderBiGRUCo(512, 1024, 512).init(
                key, jnp.zeros((1, T // 4, 512)), jnp.array([4])
            ),
        }
        wrapper = EvaluatorWrapper(params=params)

        def make_batches(shift):
            out = []
            rng = np.random.default_rng(7)  # same motions for gt
            for _ in range(2):
                out.append({
                    "x": (rng.normal(size=(B, T, D)) + shift).astype(np.float32),
                    "lengths": np.full((B,), T, np.int32),
                    "sent_lens": np.full((B,), 5, np.int32),
                    "word_embeddings": rng.normal(size=(B, 7, 300)).astype(np.float32),
                    "pos_one_hots": np.eye(15, dtype=np.float32)[rng.integers(0, 15, (B, 7))],
                })
            return out

        summary = evaluation(
            wrapper,
            gt_loader_fn=lambda: make_batches(0.0),
            eval_motion_loader_fns={"vald": lambda rep: make_batches(0.5)},
            config=EvalConfig(
                replication_times=2, diversity_times=10,
                log_file=str(tmp_path / "eval.log"),
            ),
        )
        assert (tmp_path / "eval.log").exists()
        fid_gt = summary["FID"]["ground truth"]["mean"]
        fid_gen = summary["FID"]["vald"]["mean"]
        assert fid_gt < 1e-6  # identical distributions
        assert fid_gen > fid_gt
        assert summary["R_precision"]["ground truth"]["mean"].shape == (3,)


def test_mm_generated_loader():
    """MM loader yields per-prompt repeat batches suitable for the
    multimodality metric."""
    import jax.numpy as jnp

    from mdm_tpu.diffusion import Schedule
    from mdm_tpu.eval.harness import MMGeneratedLoader
    from mdm_tpu.models import MDM, Conditioning, MDMConfig
    from mdm_tpu.sampling import GenerationConfig, MotionGenerator

    cfg = MDMConfig(njoints=263, nfeats=1, latent_dim=32, ff_size=64,
                    num_layers=2, num_heads=4)
    model = MDM(cfg)
    T = 16
    cond0 = Conditioning(frames_mask=jnp.ones((1, T), bool),
                         text_embed=jnp.zeros((1, 512)))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, T, 263)),
                        jnp.zeros((1,), jnp.int32), cond0)
    sched = Schedule.create("cosine", 1000, timestep_respacing="4")
    gen = MotionGenerator(model, params, sched, GenerationConfig(guidance_scale=2.0), "humanml")

    gt_batches = [{
        "x": np.zeros((3, T, 263), np.float32),
        "mask": np.ones((3, T), bool),
        "lengths": np.array([T, T - 2, T - 4]),
        "text": ["a", "b", "c"],
    }]
    embed = lambda texts: {"text_embed": np.zeros((len(texts), 512), np.float32)}
    batches = list(MMGeneratedLoader(gen, gt_batches, embed,
                                     mm_num_samples=1, mm_num_repeats=4))
    assert len(batches) == 1
    assert batches[0]["x"].shape == (4, T, 263)
    assert batches[0]["lengths"].shape == (4,)
