"""Closed-loop quality rehearsal for the ACTION-to-motion half of the
framework — no torch, no downloaded assets.

The a2m protocol's quality numbers (accuracy/FID vs the published tables)
need the reference's frozen action classifiers (assets/actionrecognition/
*.tar), which are not in this environment. Like the t2m rehearsal
(synthetic_quality_rehearsal.py), this script is the strongest statement
available without them: it proves classifier TRAINING (the reference never
ships that trainer), action-conditioned MDM training, and the multi-seed
a2m eval protocol compose into a working action-to-motion system whose
metrics separate a trained model from an untrained one.

What it does, all through the real CLIs:

  1. Synthesizes a HumanAct12-format pickle (poses [T,72] rotvec,
     joints3D [T,24,3], y) where the label FULLY determines the motion:
     class -> oscillation frequency + fixed pose-space direction + root
     trajectory heading (12 classes).
  2. Trains the GRU action classifier with
     `cli.train_evaluators --stage a2m_classifier` (raw rot6d features
     here, SMPL assets absent; the representation is recorded in the .npy).
  3. Trains an action-conditioned MDM with `cli.train` and a 1-step
     "untrained" control.
  4. Runs `cli.eval_a2m --a2m_classifier_path` on both against the SAME
     trained classifier.
  5. Prints one JSON line per model (accuracy/FID/diversity/multimodality
     for gen + the gt ceiling); trained must beat untrained on accuracy
     and FID.

Run (real TPU, ~10 min): python scripts/synthetic_a2m_rehearsal.py
Smoke (CPU, ~2 min):     python scripts/synthetic_a2m_rehearsal.py --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mdm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # persist XLA/Pallas compiles across processes

NUM_CLASSES = 12
FPS = 20.0


def build_dataset(work: str, n_clips: int, seed: int = 0) -> str:
    """HumanAct12-format pickle where y determines the motion."""
    rng = np.random.default_rng(seed)
    # Fixed per-class pose-space directions (orthonormal across 72-d) and
    # frequencies: class identity is recoverable from the raw features.
    w = np.random.default_rng(1234).normal(size=(72, NUM_CLASSES))
    dirs, _ = np.linalg.qr(w)  # [72, 12] orthonormal columns
    freqs = 0.4 + 0.25 * np.arange(NUM_CLASSES)  # Hz, distinct per class
    headings = 2.0 * np.pi * np.arange(NUM_CLASSES) / NUM_CLASSES

    poses, joints3d, ys = [], [], []
    for i in range(n_clips):
        y = i % NUM_CLASSES
        L = int(rng.integers(60, 120))
        t = np.arange(L, dtype=np.float32) / FPS
        phase = 2.0 * np.pi * rng.random()
        carrier = np.sin(2.0 * np.pi * freqs[y] * t + phase)
        pose = 0.25 * carrier[:, None] * dirs[:, y][None, :]
        pose += 0.02 * rng.normal(size=pose.shape)
        # Root trajectory: constant-heading walk + noise; other joints rest.
        j = 0.05 * rng.normal(size=(L, 24, 3))
        step = 0.02 * np.stack([np.cos(headings[y]) * np.arange(L),
                                np.zeros(L),
                                np.sin(headings[y]) * np.arange(L)], axis=1)
        j[:, 0] += step
        poses.append(pose.astype(np.float32))
        joints3d.append(j.astype(np.float32))
        ys.append(y)

    d = os.path.join(work, "HumanAct12Poses")
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "humanact12poses.pkl"), "wb") as f:
        pickle.dump({"poses": poses, "joints3D": joints3d, "y": ys}, f)
    return d


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/mdm_tpu_a2m_rehearsal")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + few steps on CPU (plumbing check)")
    ap.add_argument("--train_steps", type=int, default=2000)
    ap.add_argument("--clf_steps", type=int, default=600)
    ap.add_argument("--replications", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    work = os.path.abspath(args.work_dir)
    os.makedirs(work, exist_ok=True)
    n_clips = 96 if args.smoke else 576
    data_dir = build_dataset(work, n_clips, args.seed)
    print(f"[1/4] dataset: {data_dir}")

    from mdm_tpu.cli import eval_a2m as eval_cli
    from mdm_tpu.cli import train as train_cli
    from mdm_tpu.cli import train_evaluators as tev_cli

    def run_cli(module, cli_main, argv):
        """Real mode: one fresh interpreter per phase (see
        synthetic_quality_rehearsal.py — accumulated backend state across
        jit-heavy phases has wedged the dev-tunnel backend). Smoke:
        in-process with the CPU platform forced above."""
        if args.smoke:
            return cli_main(argv)
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cmd = [sys.executable, "-u", "-m", module] + argv
        print("+ " + " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=repo)
        return None

    # ---- 2. self-trained GRU action classifier.
    clf_path = os.path.join(work, "a2m_classifier.npy")
    clf_steps = 40 if args.smoke else args.clf_steps
    cache = [] if args.smoke else ["--cache_batches", str(n_clips // 32)]
    run_cli("mdm_tpu.cli.train_evaluators", tev_cli.main,
            ["--stage", "a2m_classifier", "--dataset", "humanact12",
             "--data_dir", data_dir, "--save_path", clf_path,
             "--num_steps", str(clf_steps), "--log_every", "20",
             "--lr", "3e-4"] + cache)
    print(f"[2/4] classifier: {clf_path}")

    # ---- 3. action-conditioned MDM (trained + 1-step untrained control).
    model_flags = (
        ["--latent_dim", "64", "--ff_size", "128", "--layers", "2",
         "--diffusion_steps", "8"]
        if args.smoke else ["--compute_dtype", "bfloat16",
                            "--diffusion_steps", "50"]
    )
    runs = {}
    for tag, steps in (("trained", 40 if args.smoke else args.train_steps),
                       ("untrained", 1)):
        save_dir = os.path.join(work, f"save_{tag}")
        if os.path.isdir(save_dir):  # stale dirs would be auto-resumed
            import shutil

            shutil.rmtree(save_dir)
        run_cli("mdm_tpu.cli.train", train_cli.main, [
            "--save_dir", save_dir, "--overwrite", "--dataset", "humanact12",
            "--data_dir", data_dir, "--num_frames", "60",
            "--num_steps", str(steps), "--save_interval", str(max(steps, 1)),
            "--log_interval", "200" if not args.smoke else "20",
            # lr 1e-4 = the reference lr; 3e-4 collapses the 512-d/50-step
            # flagship to the predict-zero plateau (t2m rehearsal ablation,
            # docs/BENCHMARKS.md round 4). Smoke keeps 3e-4 (64-d learns).
            "--batch_size", "64",
            "--lr", "3e-4" if args.smoke else "1e-4",
            "--seed", str(args.seed),
        ] + model_flags + ([] if args.smoke
                           else ["--cache_batches", str(n_clips // 64)]))
        from mdm_tpu.train.checkpoints import find_resume_checkpoint

        runs[tag] = find_resume_checkpoint(save_dir)[0]
        print(f"[3/4] {tag} checkpoint: {runs[tag]}")

    # ---- 4. a2m protocol on both, same self-trained classifier.
    results = {}
    for tag, ckpt in runs.items():
        summary = run_cli("mdm_tpu.cli.eval_a2m", eval_cli.main, [
            "--model_path", ckpt, "--eval_mode", "debug",
            "--data_dir", data_dir, "--a2m_classifier_path", clf_path,
            "--replications", str(2 if args.smoke else args.replications),
        ])
        if summary is None:  # subprocess mode: read the CLI's json
            with open(os.path.join(os.path.dirname(ckpt),
                                   "eval_a2m_humanact12.json")) as fh:
                summary = json.load(fh)
        row = {
            "accuracy_gen": round(summary["accuracy_gen"]["mean"], 4),
            "accuracy_gt": round(summary["accuracy_gt"]["mean"], 4),
            "fid_gen": round(summary["fid_gen"]["mean"], 4),
            "fid_gt2": round(summary["fid_gt2"]["mean"], 4),
            "diversity_gen": round(summary["diversity_gen"]["mean"], 4),
            "multimodality_gen": round(summary["multimodality_gen"]["mean"], 4),
            "classifier": summary["classifier"],
        }
        results[tag] = row
        print(json.dumps({"model": tag, **row}))

    sep = {
        "fid_ratio_untrained_over_trained": round(
            results["untrained"]["fid_gen"]
            / max(results["trained"]["fid_gen"], 1e-9), 2),
        "trained_beats_untrained": bool(
            results["trained"]["fid_gen"] < results["untrained"]["fid_gen"]
            and results["trained"]["accuracy_gen"]
            > results["untrained"]["accuracy_gen"]
        ),
    }
    print(json.dumps({"separation": sep}))
    return results, sep


if __name__ == "__main__":
    main()
