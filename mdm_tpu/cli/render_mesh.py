"""Mesh export CLI: results.npy -> SMPL fit -> per-frame .obj files.

Reference: visualize/render_mesh.py + vis_utils.npy2obj. Requires the SMPL
model asset (body_models/smpl/SMPL_NEUTRAL.pkl).
"""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    from ..visualize.joints2smpl import FitConfig, NpyToObj

    p = argparse.ArgumentParser()
    p.add_argument("--input_path", required=True, help="results.npy from generate")
    p.add_argument("--sample_idx", default=0, type=int)
    p.add_argument("--rep_idx", default=0, type=int)
    p.add_argument("--iterations", default=150, type=int)
    p.add_argument("--out_dir", default="", type=str)
    args = p.parse_args(argv)

    out_dir = args.out_dir or os.path.join(
        os.path.dirname(args.input_path),
        f"{os.path.basename(args.input_path).replace('.npy', '')}"
        f"_obj_s{args.sample_idx}_r{args.rep_idx}",
    )
    os.makedirs(out_dir, exist_ok=True)

    converter = NpyToObj(
        args.input_path, args.sample_idx, args.rep_idx,
        fit_config=FitConfig(iterations=args.iterations),
    )
    converter.save_npy(os.path.join(out_dir, "smpl_params.npy"))
    for frame in range(converter.num_frames):
        converter.save_obj(os.path.join(out_dir, f"frame{frame:03d}.obj"), frame)
    print(f"wrote {converter.num_frames} obj frames to {out_dir}")


if __name__ == "__main__":
    main()
