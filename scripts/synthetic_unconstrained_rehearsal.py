"""Closed-loop rehearsal for the UNCONSTRAINED generation family
(VERDICT r4 item 6) — no torch, no downloaded assets.

The unconstrained protocol's published numbers (FID/KID/precision/recall,
reference eval/unconstrained/evaluate.py:57-110) need the frozen modi-15
STGCN (`humanact12_gru_modi_struct.pth.tar`), absent here. Like the t2m and
a2m rehearsals, this proves the full loop composes and its metrics separate
a trained model from an untrained one:

  1. Synthesizes a HumanAct12-format pickle (shared builder with
     synthetic_a2m_rehearsal.py) where the label determines the motion —
     an UNCONSTRAINED model must match the resulting multi-modal
     distribution without ever seeing labels.
  2. Trains the modi-15 STGCN feature extractor with
     `cli.train_evaluators --stage unconstrained_stgcn`.
  3. Trains an unconstrained (no_cond) MDM with `cli.train --unconstrained`
     and a 1-step "untrained" control.
  4. Runs `cli.eval_unconstrained --a2m_classifier_path` on both against
     the SAME trained extractor: FID / KID / precision / recall /
     diversity (the reference's exact metric surface).
  5. Prints one JSON line per model + a separation line; trained must beat
     untrained on FID and KID and dominate on precision.

Run (real TPU, ~10 min): python scripts/synthetic_unconstrained_rehearsal.py
Smoke (CPU, ~3 min):     python scripts/synthetic_unconstrained_rehearsal.py --smoke
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from mdm_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()  # persist XLA/Pallas compiles across processes

from synthetic_a2m_rehearsal import build_dataset  # noqa: E402  shared builder


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work_dir", default="/tmp/mdm_tpu_uncon_rehearsal")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny model + few steps on CPU (plumbing check)")
    ap.add_argument("--train_steps", type=int, default=2000)
    ap.add_argument("--clf_steps", type=int, default=600)
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

    from mdm_tpu.cli import eval_unconstrained as eval_cli
    from mdm_tpu.cli import train as train_cli
    from mdm_tpu.cli import train_evaluators as tev_cli

    def run_cli(module, cli_main, argv):
        """Real mode: one fresh interpreter per phase (see the t2m
        rehearsal — accumulated backend state across jit-heavy phases has
        wedged the dev-tunnel backend). Smoke: in-process, CPU forced."""
        if args.smoke:
            return cli_main(argv)
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        cmd = [sys.executable, "-u", "-m", module] + argv
        print("+ " + " ".join(cmd), flush=True)
        subprocess.run(cmd, check=True, cwd=repo)
        return None

    # ---- 2. self-trained modi-15 STGCN feature extractor.
    clf_path = os.path.join(work, "uncon_stgcn.npy")
    # Smoke: the STGCN step costs ~10-30 s on CPU (conv-heavy graph net) —
    # keep the plumbing check to a handful of tiny-batch steps.
    run_cli("mdm_tpu.cli.train_evaluators", tev_cli.main, [
        "--stage", "unconstrained_stgcn", "--dataset", "humanact12",
        "--data_dir", data_dir, "--save_path", clf_path,
        "--num_steps", "4" if args.smoke else str(args.clf_steps),
        "--batch_size", "8" if args.smoke else "32",
        "--lr", "3e-4", "--log_every", "50" if not args.smoke else "1",
    ] + ([] if args.smoke else ["--cache_batches", str(n_clips // 32)]))
    print(f"[2/4] STGCN extractor: {clf_path}")

    # ---- 3. unconstrained MDM (no_cond) + 1-step control.
    model_flags = (
        ["--latent_dim", "64", "--ff_size", "128", "--layers", "2",
         "--diffusion_steps", "8"]
        if args.smoke else ["--compute_dtype", "bfloat16",
                            "--diffusion_steps", "50"]
    )
    n_steps = 40 if args.smoke else args.train_steps
    runs = {}
    for tag, steps in (("trained", n_steps), ("untrained", 1)):
        save_dir = os.path.join(work, f"save_{tag}")
        if os.path.isdir(save_dir):
            import shutil

            shutil.rmtree(save_dir)
        run_cli("mdm_tpu.cli.train", train_cli.main, [
            "--save_dir", save_dir, "--overwrite",
            "--dataset", "humanact12", "--unconstrained",
            "--data_dir", data_dir,
            "--num_steps", str(steps), "--save_interval", str(max(steps, 1)),
            "--log_interval", "200" if not args.smoke else "20",
            "--batch_size", "64", "--lr", "1e-4" if not args.smoke else "3e-4",
            "--num_frames", "60", "--seed", str(args.seed),
        ] + model_flags + ([] if args.smoke
                           else ["--cache_batches", str(n_clips // 64)]))
        from mdm_tpu.train.checkpoints import find_resume_checkpoint

        runs[tag] = find_resume_checkpoint(save_dir)[0]
        print(f"[3/4] {tag} checkpoint: {runs[tag]}")

    # ---- 4. unconstrained protocol on both, same trained extractor.
    results = {}
    for tag, ckpt in runs.items():
        summary = run_cli("mdm_tpu.cli.eval_unconstrained", eval_cli.main, [
            "--model_path", ckpt, "--eval_mode", "debug",
            "--data_dir", data_dir, "--a2m_classifier_path", clf_path,
        ])
        if summary is None:  # subprocess mode: read the CLI's json
            with open(os.path.join(os.path.dirname(ckpt),
                                   "eval_unconstrained.json")) as fh:
                summary = json.load(fh)
        row = {k: round(float(summary[k]), 6)
               for k in ("fid", "kid", "kid_std", "precision", "recall",
                         "diversity")
               if k in summary}
        results[tag] = row
        print(json.dumps({"model": tag, **row}))

    sep = {
        "fid_ratio_untrained_over_trained": round(
            results["untrained"]["fid"] / max(results["trained"]["fid"], 1e-9), 2),
        "kid_ratio_untrained_over_trained": round(
            results["untrained"]["kid"]
            / max(results["trained"]["kid"], 1e-9), 2),
        "trained_beats_untrained": bool(
            results["trained"]["fid"] < results["untrained"]["fid"]
            and results["trained"]["kid"] < results["untrained"]["kid"]
            and results["trained"]["precision"]
            >= results["untrained"]["precision"]
        ),
    }
    print(json.dumps({"separation": sep}))
    return results, sep


if __name__ == "__main__":
    main()
