"""Convert a reference PyTorch MDM checkpoint to an mdm_tpu orbax checkpoint.

Usage:
    python -m mdm_tpu.cli.convert_checkpoint \
        --torch_ckpt ./save/humanml_trans_enc_512/model000475000.pt \
        --out_dir ./save/humanml_trans_enc_512_tpu \
        --dataset humanml --latent_dim 512 --layers 8

Writes `ckpt_<step>` (orbax, params + ema copies) and `args.json` so every
mdm_tpu CLI can consume the converted run directly. The reference's
`args.json` (if present next to the .pt) is used to fill the model config.
"""
from __future__ import annotations

import argparse
import json
import os
import re


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import MDM, Conditioning
    from ..models.convert import convert_mdm_state_dict, load_torch_checkpoint
    from ..core.hml_codec import HML_EE_JOINT_NAMES
    from ..train.checkpoints import save_args, save_checkpoint
    from ..train.state import OptimConfig, create_train_state
    from ..utils.factory import get_model_config
    from ..utils.parser import apply_rules

    p = argparse.ArgumentParser()
    p.add_argument("--torch_ckpt", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--dataset", default="humanml")
    p.add_argument("--latent_dim", default=512, type=int)
    p.add_argument("--ff_size", default=1024, type=int)
    p.add_argument("--num_heads", default=4, type=int)
    p.add_argument("--layers", default=8, type=int)
    p.add_argument("--arch", default="trans_enc")
    p.add_argument("--text_encoder_type", default="clip")
    p.add_argument("--cond_mask_prob", default=0.1, type=float)
    p.add_argument("--emb_trans_dec", default=False, type=bool)
    p.add_argument("--context_len", default=0, type=int)
    p.add_argument("--pred_len", default=0, type=int)
    args = p.parse_args(argv)

    # Prefer the reference run's args.json for model hyperparameters.
    ref_args_path = os.path.join(os.path.dirname(args.torch_ckpt), "args.json")
    if os.path.exists(ref_args_path):
        with open(ref_args_path) as f:
            saved = json.load(f)
        for k in ["dataset", "latent_dim", "ff_size", "num_heads", "layers",
                  "arch", "text_encoder_type",
                  "cond_mask_prob", "emb_trans_dec", "context_len", "pred_len"]:
            if k in saved:
                setattr(args, k, saved[k])

    args = apply_rules(args)
    config = get_model_config(args)
    model = MDM(config)

    sd_ema = load_torch_checkpoint(args.torch_ckpt, use_ema=True)
    sd_raw = load_torch_checkpoint(args.torch_ckpt, use_ema=False)
    goal_joints = (["pelvis"] + HML_EE_JOINT_NAMES) if args.dataset == "humanml" else None
    params = convert_mdm_state_dict(sd_raw, config, goal_joints)["params"]
    ema_params = convert_mdm_state_dict(sd_ema, config, goal_joints)["params"]

    # Shape-check by initializing the model and comparing tree structure.
    B, T = 1, 8
    cond = Conditioning(
        frames_mask=jnp.ones((B, T), bool),
        text_embed=jnp.zeros((B, config.text_dim)),
        prefix=jnp.zeros((B, config.context_len, config.input_feats))
        if config.is_prefix_comp else None,
    )
    x = jnp.zeros((B, config.pred_len or T, config.input_feats))
    init = model.init(jax.random.PRNGKey(0), x, jnp.zeros((B,), jnp.int32), cond)["params"]

    def check(path, a, b):
        assert np.asarray(a).shape == np.asarray(b).shape, (
            f"shape mismatch at {path}: ckpt {np.asarray(b).shape} vs model {np.asarray(a).shape}"
        )

    jax.tree_util.tree_map_with_path(lambda p, a, b: check(p, a, b), init, params)

    state = create_train_state(
        jax.tree_util.tree_map(jnp.asarray, params), OptimConfig()
    )
    state = state.replace(
        ema_params=jax.tree_util.tree_map(jnp.asarray, ema_params)
    )
    m = re.search(r"(\d+)", os.path.basename(args.torch_ckpt))
    step = int(m.group(1)) if m else 0
    state = state.replace(step=jnp.asarray(step, jnp.int32))

    os.makedirs(args.out_dir, exist_ok=True)
    save_args(args.out_dir, vars(args))
    path = save_checkpoint(args.out_dir, step, state)
    print(f"converted -> {path}")
    return path


if __name__ == "__main__":
    main()
