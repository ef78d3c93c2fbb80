"""Data pipeline tests on synthetic on-disk datasets."""
import os
import pickle

import numpy as np
import pytest

from mdm_tpu.data import (
    A2MConfig,
    BatchIterator,
    HumanAct12,
    HumanMLDataset,
    HumanMLOptions,
    collate_batch,
    collate_prefix,
    get_dataset_loader,
    lengths_to_mask,
)

RNG = np.random.default_rng(9)


@pytest.fixture()
def synthetic_humanml(tmp_path):
    """Tiny HumanML3D-format dataset on disk."""
    root = tmp_path / "HumanML3D"
    (root / "new_joint_vecs").mkdir(parents=True)
    (root / "texts").mkdir()
    names = []
    for i in range(6):
        name = f"{i:06d}"
        L = int(RNG.integers(45, 190))
        np.save(root / "new_joint_vecs" / f"{name}.npy",
                RNG.normal(size=(L, 263)).astype(np.float32))
        lines = [
            f"a person walks forward#a/DET person/NOUN walk/VERB forward/Loc_VIP#0.0#0.0",
            f"someone moves#someone/PRON move/VERB#0.0#0.0",
        ]
        if i == 0:
            # sub-clip annotation (f_tag/to_tag)
            lines.append("a person jumps#a/DET person/NOUN jump/VERB#1.0#4.0")
        (root / "texts" / f"{name}.txt").write_text("\n".join(lines))
    (root / "train.txt").write_text("\n".join(f"{i:06d}" for i in range(6)))
    np.save(root / "Mean.npy", np.zeros(263, np.float32))
    np.save(root / "Std.npy", np.ones(263, np.float32))
    return str(root)


class TestHumanML:
    def test_parse_filter_pad(self, synthetic_humanml):
        opt = HumanMLOptions(data_root=synthetic_humanml, use_cache=False)
        ds = HumanMLDataset(opt, split="train")
        assert len(ds) >= 6  # sub-clip may add one
        s = ds.sample(0, RNG)
        assert s["motion"].shape == (196, 263)
        assert s["length"] % opt.unit_length == 0
        assert s["motion"][s["length"]:].sum() == 0  # zero padding
        assert len(s["tokens"]) >= s["sent_len"]
        assert s["tokens"][0] == "sos/OTHER"

    def test_cache_roundtrip(self, synthetic_humanml, tmp_path):
        opt = HumanMLOptions(
            data_root=synthetic_humanml, use_cache=True, cache_dir=str(tmp_path / "c")
        )
        ds1 = HumanMLDataset(opt, split="train")
        ds2 = HumanMLDataset(opt, split="train")  # from cache
        assert len(ds1) == len(ds2)
        assert sorted(c.name for c in ds1.clips) == sorted(c.name for c in ds2.clips)
        # cache round-trips content exactly, not just names
        by_name1 = {c.name: c for c in ds1.clips}
        for c in ds2.clips:
            ref = by_name1[c.name]
            np.testing.assert_array_equal(c.motion, ref.motion)
            assert [t.caption for t in c.texts] == [t.caption for t in ref.texts]
            assert [t.tokens for t in c.texts] == [t.tokens for t in ref.texts]

    def test_cache_is_pickle_free(self, synthetic_humanml, tmp_path):
        cache_dir = tmp_path / "c"
        opt = HumanMLOptions(
            data_root=synthetic_humanml, use_cache=True, cache_dir=str(cache_dir)
        )
        HumanMLDataset(opt, split="train")
        files = list((cache_dir / "dataset").glob("*.npz"))
        assert files
        # must load with allow_pickle=False (advisor: no pickled objects)
        with np.load(files[0], allow_pickle=False) as blob:
            assert "motions" in blob

    def test_cache_keyed_by_dataset_content(self, synthetic_humanml, tmp_path):
        """A cache written for one dataset must never shadow another
        (round-1 advisor high-severity finding)."""
        cache_dir = str(tmp_path / "c")
        opt1 = HumanMLOptions(
            data_root=synthetic_humanml, use_cache=True, cache_dir=cache_dir
        )
        ds1 = HumanMLDataset(opt1, split="train")

        # Second dataset, different root + one clip dropped from the split.
        import shutil

        root2 = tmp_path / "HumanML3D_other"
        shutil.copytree(synthetic_humanml, root2)
        (root2 / "train.txt").write_text("\n".join(f"{i:06d}" for i in range(5)))
        opt2 = HumanMLOptions(data_root=str(root2), use_cache=True, cache_dir=cache_dir)
        ds2 = HumanMLDataset(opt2, split="train")
        assert len(ds2) < len(ds1)  # NOT the 6-clip cache from dataset 1

    def test_fixed_len_prefix_mode(self, synthetic_humanml):
        opt = HumanMLOptions(
            data_root=synthetic_humanml, use_cache=False,
            fixed_len=24, context_len=8, pred_len=16, disable_offset_aug=True,
        )
        ds = HumanMLDataset(opt, split="train", mode="prefix")
        s = ds.sample(2, RNG)
        assert s["motion"].shape == (24, 263)
        batch = collate_prefix([ds.sample(i, RNG) for i in range(4)], pred_len=16)
        assert batch["x"].shape == (4, 16, 263)
        assert batch["prefix"].shape == (4, 8, 263)

    def test_loader_iterates_fixed_shapes(self, synthetic_humanml):
        it = get_dataset_loader(
            "humanml", batch_size=4, split="train",
            data_root=synthetic_humanml, use_cache=False,
        )
        gen = iter(it)
        for _ in range(3):
            b = next(gen)
            assert b["x"].shape == (4, 196, 263)
            assert b["mask"].shape == (4, 196)
            assert len(b["text"]) == 4

    def test_batch_repeat_fill(self):
        samples = [
            {"motion": np.zeros((10, 5), np.float32), "length": 8, "caption": "x",
             "original_length": 8, "key": "a"},
        ]
        b = collate_batch(samples, target_batch_size=3)
        assert b["x"].shape == (3, 10, 5)

    def test_lengths_to_mask(self):
        m = lengths_to_mask(np.array([2, 4]), 5)
        assert m.tolist() == [[True, True, False, False, False],
                              [True, True, True, True, False]]


class TestA2M:
    @pytest.fixture()
    def humanact12_dir(self, tmp_path):
        d = tmp_path / "HumanAct12Poses"
        d.mkdir()
        n = 5
        lengths = [int(RNG.integers(50, 120)) for _ in range(n)]
        data = {
            "poses": [RNG.normal(size=(L, 72)).astype(np.float32) for L in lengths],
            "joints3D": [RNG.normal(size=(L, 24, 3)).astype(np.float32) for L in lengths],
            "y": list(RNG.integers(0, 12, size=n)),
        }
        with open(d / "humanact12poses.pkl", "wb") as f:
            pickle.dump(data, f)
        return str(d)

    def test_humanact12_rot6d(self, humanact12_dir):
        ds = HumanAct12(A2MConfig(num_frames=60), datapath=humanact12_dir)
        assert ds.num_actions == 12
        s = ds.sample(0, RNG)
        assert s["motion"].shape == (60, 25 * 6)  # 24 joints + translation row
        assert 0 <= s["action"] < 12
        assert isinstance(s["action_text"], str)

    def test_humanact12_other_reps(self, humanact12_dir):
        for rep, feat in [("rotvec", 3), ("rotquat", 4), ("rotmat", 9)]:
            ds = HumanAct12(
                A2MConfig(num_frames=30, pose_rep=rep), datapath=humanact12_dir
            )
            s = ds.sample(1, RNG)
            assert s["motion"].shape == (30, 25 * feat)

    def test_batch_iterator_action(self, humanact12_dir):
        ds = HumanAct12(A2MConfig(num_frames=60), datapath=humanact12_dir)
        it = iter(BatchIterator(ds, batch_size=2, seed=1))
        b = next(it)
        assert b["x"].shape == (2, 60, 150)
        assert b["action"].shape == (2,)


class TestRawText:
    def test_process_raw_text_tokens(self):
        from mdm_tpu.data.raw_text import process_raw_text

        tokens, sent_len = process_raw_text("a person walks forward and jumps")
        assert tokens[0] == "sos/OTHER"
        assert tokens[sent_len - 1] == "eos/OTHER"
        assert len(tokens) == 22
        body = tokens[1 : sent_len - 1]
        # action verbs present with VERB-ish tagging path
        assert any(t.startswith("walks/") or t.startswith("walk/") for t in body)
        assert any(t.startswith("a/DET") for t in body)

    def test_truncation(self):
        from mdm_tpu.data.raw_text import process_raw_text

        long = " ".join(["walk"] * 50)
        tokens, sent_len = process_raw_text(long)
        assert len(tokens) == 22 and sent_len == 22


class TestFreezeJoints:
    def test_freeze(self):
        import jax.numpy as jnp
        from mdm_tpu.utils.misc import freeze_joints

        x = jnp.asarray(RNG.normal(size=(2, 5, 4, 6)).astype(np.float32))
        out = freeze_joints(x, [1, 3])
        np.testing.assert_allclose(np.asarray(out[:, :, 1]), np.asarray(x[:, :1, 1]).repeat(5, 1))
        np.testing.assert_allclose(np.asarray(out[:, :, 0]), np.asarray(x[:, :, 0]))


class TestKitAndTextOnly:
    @pytest.fixture()
    def synthetic_kit(self, tmp_path):
        root = tmp_path / "KIT-ML"
        (root / "new_joint_vecs").mkdir(parents=True)
        (root / "texts").mkdir()
        for i in range(4):
            name = f"{i:05d}"
            L = int(RNG.integers(30, 150))  # kit min length is 24
            np.save(root / "new_joint_vecs" / f"{name}.npy",
                    RNG.normal(size=(L, 251)).astype(np.float32))
            (root / "texts" / f"{name}.txt").write_text(
                "a human walks#a/DET human/NOUN walk/VERB#0.0#0.0\n"
            )
        (root / "train.txt").write_text("\n".join(f"{i:05d}" for i in range(4)))
        np.save(root / "Mean.npy", np.zeros(251, np.float32))
        np.save(root / "Std.npy", np.ones(251, np.float32))
        return str(root)

    def test_kit_dataset(self, synthetic_kit):
        opt = HumanMLOptions.for_dataset("kit", synthetic_kit, use_cache=False)
        assert opt.dim_pose == 251 and opt.joints_num == 21
        ds = HumanMLDataset(opt, split="train")
        s = ds.sample(0, RNG)
        assert s["motion"].shape == (196, 251)

    def test_text_only_mode(self, synthetic_kit):
        opt = HumanMLOptions.for_dataset("kit", synthetic_kit, use_cache=False)
        ds = HumanMLDataset(opt, split="train", mode="text_only")
        s = ds.sample(0, RNG)
        assert s["caption"] == "a human walks"
        assert s["motion"].shape == (1, 251)  # placeholder, no padding cost


class TestBatchIteratorDeterminism:
    """Every batch is a pure function of (seed, epoch, position): two fresh
    iterators agree bit-exactly, and iter_from(k) is an O(1) fast-forward —
    the property behind bit-exact training resume."""

    class _RandDataset:
        def __len__(self):
            return 10

        def sample(self, idx, rng):
            return {
                "motion": rng.normal(size=(196, 263)).astype(np.float32),
                "length": int(rng.integers(40, 196)),
                "original_length": 100,
                "caption": "x",
                "tokens": ["sos/OTHER"],
                "sent_len": 1,
                "key": str(idx),
            }

    def _take(self, it, n):
        out = []
        for b in it:
            out.append(b)
            if len(out) == n:
                break
        return out

    def test_fresh_iterators_identical(self):
        ds = self._RandDataset()
        a = self._take(iter(BatchIterator(ds, batch_size=4, seed=7, prefetch=0)), 5)
        b = self._take(iter(BatchIterator(ds, batch_size=4, seed=7, prefetch=0)), 5)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x["x"], y["x"])
            np.testing.assert_array_equal(x["mask"], y["mask"])

    def test_iter_from_fast_forwards_across_epochs(self):
        ds = self._RandDataset()
        it = BatchIterator(ds, batch_size=4, seed=7, prefetch=0)
        assert it.batches_per_epoch() == 2  # 10 items, drop_last
        full = self._take(iter(it), 7)
        # Start mid-epoch (5 = epoch 2, position 1) and at a boundary.
        for start in (5, 4, 2, 0):
            resumed = self._take(it.iter_from(start), 7 - start)
            for x, y in zip(full[start:], resumed):
                np.testing.assert_array_equal(x["x"], y["x"])
                np.testing.assert_array_equal(x["lengths"], y["lengths"])

    def test_worker_pool_stream_identical_and_terminates(self):
        """workers>0 builds batches in a thread pool but the stream is
        bit-identical to serial (batches are pure functions of position),
        and finite iteration still terminates."""
        ds = self._RandDataset()
        serial = self._take(iter(BatchIterator(ds, batch_size=4, seed=7, prefetch=0)), 5)
        par = self._take(iter(BatchIterator(ds, batch_size=4, seed=7, workers=3)), 5)
        for x, y in zip(serial, par):
            np.testing.assert_array_equal(x["x"], y["x"])
        finite = list(BatchIterator(ds, batch_size=4, seed=7, workers=3, infinite=False))
        assert len(finite) == 2

    def test_seed_changes_stream(self):
        ds = self._RandDataset()
        a = self._take(iter(BatchIterator(ds, batch_size=4, seed=7, prefetch=0)), 1)
        b = self._take(iter(BatchIterator(ds, batch_size=4, seed=8, prefetch=0)), 1)
        assert not np.array_equal(a[0]["x"], b[0]["x"])


class TestBatchIteratorErrors:
    def test_producer_exception_propagates(self):
        """Prefetch thread errors must surface in the consumer with the
        original exception, not a silent truncation (advisor finding)."""

        class ExplodingDataset:
            def __len__(self):
                return 8

            def sample(self, idx, rng):
                if idx >= 4:
                    raise RuntimeError("disk went away")
                return {
                    "motion": np.zeros((196, 263), np.float32),
                    "length": 100,
                    "original_length": 100,
                    "caption": "x",
                    "tokens": ["sos/OTHER"],
                    "sent_len": 1,
                    "key": str(idx),
                }

        it = BatchIterator(
            ExplodingDataset(), batch_size=4, shuffle=False, infinite=False,
            prefetch=2,
        )
        with pytest.raises(RuntimeError, match="disk went away"):
            list(it)


class TestMultiHostSharding:
    def test_sharded_batches_equal_unsharded_rows(self, synthetic_humanml):
        """BatchIterator(shard=(rank, world)) yields exactly rows
        [rank*B/w, (rank+1)*B/w) of the global batch every process would
        agree on — the input contract behind multi-host shard_batch."""
        from mdm_tpu.data import BatchIterator, get_dataset

        ds = get_dataset("humanml", split="train",
                         data_root=synthetic_humanml, use_cache=False)
        full = BatchIterator(ds, 4, seed=3, infinite=False)
        s0 = BatchIterator(ds, 4, seed=3, infinite=False, shard=(0, 2))
        s1 = BatchIterator(ds, 4, seed=3, infinite=False, shard=(1, 2))
        for b, b0, b1 in zip(iter(full), iter(s0), iter(s1)):
            assert b0["x"].shape[0] == 2 and b1["x"].shape[0] == 2
            np.testing.assert_array_equal(
                np.concatenate([b0["x"], b1["x"]]), b["x"])
            np.testing.assert_array_equal(
                np.concatenate([b0["lengths"], b1["lengths"]]), b["lengths"])
            assert list(b0["text"]) + list(b1["text"]) == list(b["text"])

    def test_shard_validation(self, synthetic_humanml):
        from mdm_tpu.data import BatchIterator, get_dataset

        ds = get_dataset("humanml", split="train",
                         data_root=synthetic_humanml, use_cache=False)
        with pytest.raises(ValueError, match="divisible"):
            BatchIterator(ds, 5, shard=(0, 2))
        with pytest.raises(ValueError, match="rank"):
            BatchIterator(ds, 4, shard=(2, 2))
        with pytest.raises(ValueError, match="drop_last"):
            BatchIterator(ds, 4, shard=(0, 2), drop_last=False)


class TestCacheAndShardHelpers:
    def test_cache_device_batches_cycles_device_arrays(self):
        import itertools

        import jax
        import jax.numpy as jnp

        from mdm_tpu.data.loader import cache_device_batches

        src = ({"x": np.full((2, 3), i, np.float32)} for i in range(10))
        cyc = cache_device_batches(src, 3)
        got = [next(cyc) for _ in range(7)]
        for i, b in enumerate(got):
            assert isinstance(b["x"], jax.Array)
            np.testing.assert_array_equal(np.asarray(b["x"]),
                                          np.full((2, 3), i % 3))

    def test_shard_batch_idempotent(self):
        """Re-applying shard_batch to an already-sharded batch returns the
        arrays unchanged (the device-cached-batch loop contract)."""
        import jax.numpy as jnp

        from mdm_tpu.parallel import make_mesh, shard_batch

        mesh = make_mesh()
        b = {"x": jnp.ones((8, 4))}
        b1 = shard_batch(b, mesh)
        b2 = shard_batch(b1, mesh)
        assert b2["x"] is b1["x"]

    def test_hash_text_embedder_deterministic_and_distinct(self):
        from mdm_tpu.sampling.text import HashTextEmbedder, make_text_embedder

        emb = make_text_embedder("hash")
        assert isinstance(emb, HashTextEmbedder)
        a = emb(["a person walks forward", "a person spins quickly"])
        b = HashTextEmbedder()(["a person walks forward",
                                "a person spins quickly"])
        np.testing.assert_array_equal(a["text_embed"], b["text_embed"])
        assert a["text_embed"].shape == (2, 512)
        # distinct captions -> distinct directions; same caption -> same
        d = float(np.dot(a["text_embed"][0], a["text_embed"][1]))
        assert abs(d) < 0.9
        np.testing.assert_allclose(
            np.linalg.norm(a["text_embed"], axis=1), 1.0, atol=1e-5)
