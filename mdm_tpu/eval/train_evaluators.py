"""Training for the T2M evaluator networks (reference trainers.py scope).

The reference ships ~1k LoC of torch trainers that produce the frozen
metric encoders every eval path depends on
(/root/reference/data_loaders/humanml/networks/trainers.py):

- DecompTrainerV3 (:25-208): movement conv autoencoder — L1 reconstruction
  + latent sparsity + latent smoothness.
- TextMotionMatchTrainer (:879-1089): contrastive text/motion embedding
  training (Hadsell-Chopra-LeCun margin loss, modules.py:11-24) on top of
  the frozen movement encoder.
- LengthEstTrainer (:748-876): cross-entropy motion-length classifier.

Here each trainer is ONE fused jitted step (loss + grad + per-network
clip-by-0.5 + Adam), with the host loop only feeding batches — the same
redesign the main TrainLoop got. CompTrainerV6 *training* (the legacy T2M
baseline generator) stays out of scope; its inference surface lives in
eval/t2m_generator.py.

Loss parity with the reference trainers is oracle-tested in
tests/test_train_evaluators.py (same weights + batch -> same loss terms).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .networks import (
    MotionEncoderBiGRUCo,
    MotionLenEstimatorBiGRU,
    MovementConvDecoder,
    MovementConvEncoder,
    TextEncoderBiGRUCo,
)


@dataclass(frozen=True)
class EvalTrainConfig:
    lr: float = 1e-4
    # reference clip_grad_norm_(net.parameters(), 0.5) — applied PER
    # network, not over the joint tree (trainers.py:46-47,784-785)
    grad_clip: float = 0.5
    unit_length: int = 4
    lambda_sparsity: float = 0.001  # reference train options defaults
    lambda_smooth: float = 0.001
    negative_margin: float = 10.0


def _clip_per_network(grads, max_norm: float):
    """clip_grad_norm_ per top-level subtree (reference clips each network
    separately)."""
    if max_norm <= 0:
        return grads

    def clip_tree(tree):
        norm = optax.global_norm(tree)
        scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, tree)

    return {k: clip_tree(v) for k, v in grads.items()}


def contrastive_loss(emb_a, emb_b, label, margin: float):
    """Hadsell-Chopra-LeCun (reference modules.py:11-24): label 0 pulls the
    pair together, label 1 pushes beyond `margin`. Torch pairwise_distance
    adds eps=1e-6 to the difference before the norm — kept for parity."""
    dist = jnp.linalg.norm(emb_a - emb_b + 1e-6, axis=-1)
    pos = (1.0 - label) * dist**2
    neg = label * jnp.maximum(margin - dist, 0.0) ** 2
    return jnp.mean(pos + neg)


# ---------------------------------------------------------------------------
# Decomposition (movement autoencoder)
# ---------------------------------------------------------------------------

def make_decomp_step(enc: MovementConvEncoder, dec: MovementConvDecoder,
                     config: EvalTrainConfig = EvalTrainConfig()):
    """Fused decomposition train step.

    batch: motions [B, T, D] (already normalized). Losses per reference
    DecompTrainerV3.backward (trainers.py:60-68): L1 recon on the FULL
    feature vector, latents from features[..., :-4] (foot contacts held
    out), mean|latent| sparsity, L1 latent smoothness.
    """
    tx = optax.adam(config.lr)

    def loss_fn(params, motions):
        latents = enc.apply({"params": params["enc"]}, motions[..., :-4])
        recon = dec.apply({"params": params["dec"]}, latents)
        loss_rec = jnp.mean(jnp.abs(recon - motions))
        loss_sparsity = jnp.mean(jnp.abs(latents))
        loss_smooth = jnp.mean(jnp.abs(latents[:, 1:] - latents[:, :-1]))
        loss = (loss_rec + config.lambda_sparsity * loss_sparsity
                + config.lambda_smooth * loss_smooth)
        return loss, {"loss": loss, "loss_rec": loss_rec,
                      "loss_sparsity": loss_sparsity,
                      "loss_smooth": loss_smooth}

    @jax.jit
    def step(params, opt_state, motions):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, motions
        )
        # reference decomp does NOT clip (clip_norm call commented out,
        # trainers.py:81)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    def init(key) -> Tuple[Dict, optax.OptState]:
        k1, k2 = jax.random.split(key)
        d_in = dec.output_size
        params = {
            "enc": enc.init(k1, jnp.zeros((1, 8, d_in - 4)))["params"],
            "dec": dec.init(k2, jnp.zeros((1, 2, enc.output_size)))["params"],
        }
        return params, tx.init(params)

    return init, step


# ---------------------------------------------------------------------------
# Text-motion matching (contrastive)
# ---------------------------------------------------------------------------

def make_match_step(text_enc: TextEncoderBiGRUCo,
                    motion_enc: MotionEncoderBiGRUCo,
                    movement_enc: MovementConvEncoder,
                    config: EvalTrainConfig = EvalTrainConfig()):
    """Fused contrastive step (reference TextMotionMatchTrainer.forward/
    backward/update, trainers.py:941-998).

    batch: word_embs [B,L,300], pos_onehot [B,L,15], cap_lens [B],
    motions [B,T,D], m_lens [B], shift (scalar int in [0, B-2] — the
    reference draws np.random.randint(0, B-1) on host per step; shift 0
    degenerates the negative pairs into the positives, kept as-is).
    The reference sorts by m_lens desc (pack_padded requirement) and
    aligns text; the shifted negative pairing depends on that order, so the
    same stable sort is applied here.
    """
    tx = optax.adam(config.lr)

    def loss_fn(params, frozen_movement, batch):
        m_lens = batch["m_lens"]
        # np.argsort(...)[::-1] on the host = reversed stable ascending sort
        align = jnp.argsort(m_lens, stable=True)[::-1]
        motions = batch["motions"][align]
        m_lens_s = m_lens[align]

        movements = jax.lax.stop_gradient(
            movement_enc.apply({"params": frozen_movement}, motions[..., :-4])
        )
        motion_emb = motion_enc.apply(
            {"params": params["motion"]}, movements,
            m_lens_s // config.unit_length,
        )
        text_emb = text_enc.apply(
            {"params": params["text"]}, batch["word_embs"],
            batch["pos_onehot"], batch["cap_lens"],
        )[align]

        B = text_emb.shape[0]
        loss_pos = contrastive_loss(
            text_emb, motion_emb, jnp.zeros((B,)), config.negative_margin
        )
        new_idx = (jnp.arange(B) + batch["shift"]) % B
        loss_neg = contrastive_loss(
            text_emb, motion_emb[new_idx], jnp.ones((B,)),
            config.negative_margin,
        )
        loss = loss_pos + loss_neg
        return loss, {"loss": loss, "loss_pos": loss_pos, "loss_neg": loss_neg}

    @jax.jit
    def step(params, opt_state, frozen_movement, batch):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, frozen_movement, batch
        )
        grads = _clip_per_network(grads, config.grad_clip)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    def init(key, dim_word=300, dim_pos=15):
        k1, k2 = jax.random.split(key)
        params = {
            "text": text_enc.init(
                k1, jnp.zeros((1, 4, dim_word)), jnp.zeros((1, 4, dim_pos)),
                jnp.array([4]),
            )["params"],
            "motion": motion_enc.init(
                k2, jnp.zeros((1, 4, motion_enc.input_size)), jnp.array([4])
            )["params"],
        }
        return params, tx.init(params)

    return init, step


# ---------------------------------------------------------------------------
# Length estimator
# ---------------------------------------------------------------------------

def make_length_est_step(estimator: MotionLenEstimatorBiGRU,
                         config: EvalTrainConfig = EvalTrainConfig()):
    """Cross-entropy over length buckets m_len // unit_length (reference
    LengthEstTrainer.train inner loop, trainers.py:810-832)."""
    tx = optax.adam(config.lr)

    def loss_fn(params, batch):
        logits = estimator.apply(
            {"params": params}, batch["word_embs"], batch["pos_onehot"],
            batch["cap_lens"],
        )
        labels = batch["m_lens"] // config.unit_length
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(logits, labels)
        )
        return loss, {"loss": loss}

    @jax.jit
    def step(params, opt_state, batch):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        grads_c = _clip_per_network({"est": grads}, config.grad_clip)["est"]
        updates, opt_state = tx.update(grads_c, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    def init(key, dim_word=300, dim_pos=15):
        params = estimator.init(
            key, jnp.zeros((1, 4, dim_word)), jnp.zeros((1, 4, dim_pos)),
            jnp.array([4]),
        )["params"]
        return params, tx.init(params)

    return init, step


# ---------------------------------------------------------------------------
# a2m action classifier
# ---------------------------------------------------------------------------

def make_a2m_classifier_step(classifier, input_size: int, num_frames: int,
                             config: EvalTrainConfig = EvalTrainConfig(),
                             example_x=None):
    """Cross-entropy trainer for the a2m protocol classifiers (GRU
    MotionDiscriminator, or the uestc STGCN via StgcnAdapter — anything
    with `apply(params, x, lengths) -> {'yhat': ...}`). `example_x`
    overrides the [1, num_frames, input_size] init probe for classifiers
    with non-flat inputs (STGCN takes [B, T, 24, 6]).

    Capability port of the action2motion recognition training the reference
    consumes as frozen checkpoints (assets/actionrecognition/*.tar — the
    reference never ships the trainer, eval/a2m/gru_eval.py:22-40 only
    loads): lets a user produce the a2m protocol's classifier for a NEW
    dataset without torch. One fused jitted step; logs loss + batch
    accuracy.
    """
    tx = optax.adam(config.lr)

    def loss_fn(params, batch):
        out = classifier.apply(params, batch["x"], batch["lengths"])
        labels = batch["y"]
        loss = jnp.mean(
            optax.softmax_cross_entropy_with_integer_labels(out["yhat"], labels)
        )
        acc = jnp.mean((jnp.argmax(out["yhat"], axis=-1) == labels)
                       .astype(jnp.float32))
        return loss, {"loss": loss, "acc": acc}

    @jax.jit
    def step(params, opt_state, batch):
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        grads_c = _clip_per_network({"clf": grads}, config.grad_clip)["clf"]
        updates, opt_state = tx.update(grads_c, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, logs

    def init(key):
        x0 = (example_x if example_x is not None
              else jnp.zeros((1, num_frames, input_size)))
        # jit the init: eager big-module init through the axon tunnel is
        # pathologically slow (measured 83 s for the modi-15 STGCN vs ~10 s
        # jitted — CLAUDE.md gotcha).
        params = jax.jit(classifier.init)(key, x0, jnp.array([num_frames]))
        return params, tx.init(params)

    return init, step


# ---------------------------------------------------------------------------
# Host loops + persistence
# ---------------------------------------------------------------------------

def save_evaluator_params(path: str, params: Dict):
    """Persist evaluator params as a pickled dict readable by
    EvaluatorWrapper(params=load_evaluator_params(path))."""
    np.save(path, jax.tree_util.tree_map(np.asarray, params))
    return path


def load_evaluator_params(path: str) -> Dict:
    return np.load(path, allow_pickle=True).item()


def run_training(init, step, batches: Iterable, num_steps: int, key,
                 log_every: int = 100,
                 step_args: Callable[[Dict], tuple] = lambda b: (b,),
                 log: Callable = print):
    """Generic host loop: feed `batches` through the fused step."""
    params, opt_state = init(key)
    it = iter(batches)
    logs = None
    for i in range(num_steps):
        batch = next(it)
        params, opt_state, logs = step(params, opt_state, *step_args(batch))
        if (i + 1) % log_every == 0:
            host = {k: float(v) for k, v in logs.items()}
            log(f"step {i + 1}: " + "  ".join(f"{k}={v:.5f}" for k, v in host.items()))
    return params, logs
