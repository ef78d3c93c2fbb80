"""Evaluator wrapper: frozen T2M co-embedding encoders.

Mirror of EvaluatorMDMWrapper (/root/reference/data_loaders/humanml/
networks/evaluator_wrapper.py:121-186): movement encoder on motion[..., :-4],
m_lens // unit_length, then motion/text biGRU embeddings. Our masked biGRU
needs no length-sorting, so embeddings come back in input order.

Weights load from the reference's `finest.tar` checkpoint via torch on host.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .networks import (
    MotionEncoderBiGRUCo,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
    convert_motion_encoder,
    convert_movement_encoder,
    convert_text_encoder,
)


class EvaluatorWrapper:
    UNIT_LENGTH = 4

    def __init__(
        self,
        dataset_name: str = "humanml",
        checkpoints_dir: str = ".",
        params: Optional[dict] = None,
        movement_enc: Optional[MovementConvEncoder] = None,
        text_enc: Optional[TextEncoderBiGRUCo] = None,
        motion_enc: Optional[MotionEncoderBiGRUCo] = None,
    ):
        dim_pose = 263 if dataset_name == "humanml" else 251
        self.dim_pose = dim_pose
        self.degraded: Optional[str] = None  # set when a fallback fires

        if params is None:
            ckpt_dir = "t2m" if dataset_name == "humanml" else dataset_name
            path = os.path.join(checkpoints_dir, ckpt_dir, "text_mot_match", "model", "finest.tar")
            native = path.replace("finest.tar", "finest.npy")
            if os.path.exists(path):
                params = self.load_torch_checkpoint(path)
            elif os.path.exists(native):
                # Our own trained evaluators (eval/train_evaluators.py +
                # cli/train_evaluators.py save this format).
                from .train_evaluators import load_evaluator_params

                params = load_evaluator_params(native)
        if params is not None:
            if movement_enc and text_enc and motion_enc:
                # Explicit modules: trust the caller's layout, no inference.
                self.movement_enc = movement_enc
                self.text_enc = text_enc
                self.motion_enc = motion_enc
            else:
                # Infer module dims from the loaded weights so self-trained
                # encoders of ANY size (cli.train_evaluators --movement_dim/
                # --coemb_dim) drive the protocol without manual module args.
                inf_mov, inf_text, inf_mot = self._modules_from_params(params)
                self.movement_enc = movement_enc or inf_mov
                self.text_enc = text_enc or inf_text
                self.motion_enc = motion_enc or inf_mot
        else:
            # Metric numbers are meaningless without the frozen evaluators;
            # random init keeps smoke/dev runs alive.
            self.movement_enc = movement_enc or MovementConvEncoder(512, 512)
            self.text_enc = text_enc or TextEncoderBiGRUCo(300, 15, 512, 512)
            self.motion_enc = motion_enc or MotionEncoderBiGRUCo(512, 1024, 512)
            print(f"WARNING: evaluator checkpoint {path} missing; random init "
                  "(metrics will NOT be comparable to published numbers)")
            self.degraded = "random-init-evaluator-encoders"
            key = jax.random.PRNGKey(0)
            params = {
                "movement": self.movement_enc.init(key, jnp.zeros((1, 8, dim_pose - 4))),
                "text": self.text_enc.init(
                    key, jnp.zeros((1, 4, 300)), jnp.zeros((1, 4, 15)), jnp.array([4])
                ),
                "motion": self.motion_enc.init(
                    key, jnp.zeros((1, 4, 512)), jnp.array([4])
                ),
            }
        self.params = params

        self._embed_motion = jax.jit(self._embed_motion_impl)
        self._embed_text = jax.jit(self._embed_text_impl)

    @staticmethod
    def _modules_from_params(params):
        """Module defs sized from the weight shapes (any encoder width)."""

        def p(tree):
            return tree.get("params", tree)

        mov = p(params["movement"])
        mov_hidden = int(np.shape(mov["conv1"]["kernel"])[2])
        mov_out = int(np.shape(mov["conv2"]["kernel"])[2])
        text = p(params["text"])
        text_hidden = int(np.shape(text["input_emb"]["kernel"])[1])
        coemb = int(np.shape(text["output_net"]["fc2"]["kernel"])[1])
        mot = p(params["motion"])
        mot_in = int(np.shape(mot["input_emb"]["kernel"])[0])
        mot_hidden = int(np.shape(mot["input_emb"]["kernel"])[1])
        return (
            MovementConvEncoder(mov_hidden, mov_out),
            TextEncoderBiGRUCo(300, 15, text_hidden, coemb),
            MotionEncoderBiGRUCo(mot_in, mot_hidden, coemb),
        )

    @staticmethod
    def load_torch_checkpoint(path: str) -> dict:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        to_np = lambda sd: {k: v.detach().cpu().numpy() for k, v in sd.items()}
        return {
            "movement": convert_movement_encoder(to_np(ckpt["movement_encoder"])),
            "text": convert_text_encoder(to_np(ckpt["text_encoder"])),
            "motion": convert_motion_encoder(to_np(ckpt["motion_encoder"])),
        }

    def _embed_motion_impl(self, motions, m_lens):
        movements = self.movement_enc.apply(self.params["movement"], motions[..., :-4])
        return self.motion_enc.apply(
            self.params["motion"], movements, m_lens // self.UNIT_LENGTH
        )

    def _embed_text_impl(self, word_embs, pos_ohot, cap_lens):
        return self.text_enc.apply(self.params["text"], word_embs, pos_ohot, cap_lens)

    def get_co_embeddings_device(self, word_embs, pos_ohot, cap_lens, motions, m_lens):
        """Device-array variant: lets the harness run a whole loader pass
        without per-batch host syncs (pull once at the end)."""
        text_emb = self._embed_text(
            jnp.asarray(word_embs), jnp.asarray(pos_ohot), jnp.asarray(cap_lens)
        )
        motion_emb = self._embed_motion(jnp.asarray(motions), jnp.asarray(m_lens))
        return text_emb, motion_emb

    def get_co_embeddings(
        self, word_embs, pos_ohot, cap_lens, motions, m_lens
    ) -> Tuple[np.ndarray, np.ndarray]:
        text_emb, motion_emb = self.get_co_embeddings_device(
            word_embs, pos_ohot, cap_lens, motions, m_lens
        )
        return np.asarray(text_emb), np.asarray(motion_emb)

    def get_motion_embeddings(self, motions, m_lens) -> np.ndarray:
        return np.asarray(self._embed_motion(jnp.asarray(motions), jnp.asarray(m_lens)))
