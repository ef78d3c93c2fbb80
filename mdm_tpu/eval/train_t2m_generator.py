"""Training for the T2M baseline generator (CompV6) — TPU-native.

Capability port of the reference's ``CompTrainerV6`` *training* path
(data_loaders/humanml/networks/trainers.py:211-746): the text-to-motion VAE
seq2seq of Guo et al. whose frozen checkpoint the eval harness can drive as
a baseline (``eval/t2m_generator.py`` holds the inference scan and the
torch-weight converters; this module adds from-scratch training so the
baseline generator can be produced for a new dataset without torch).

Design (TPU-first, not a translation):

- The reference's per-snippet Python loop over ``mov_len`` steps
  (trainers.py:325-372) — posterior, prior, decoder, teacher-forcing — is
  ONE ``lax.scan``; the whole train step (forward + losses + grads +
  per-network clip + per-network Adam) is a single jitted program.
- Teacher forcing is a *traced* scalar (the reference draws one bool per
  batch host-side, trainers.py:297), so both branches share one
  compilation.
- The curriculum (schedule_len 10→49, trainers.py:616-746) stays host-side:
  one compile per schedule length, exactly mirroring the reference's
  re-created DataLoaders per length.

Gradient-flow parity with the reference (verified by the oracle test):

- ``movements`` targets and every carried ``mov_in`` are detached
  (trainers.py:291-294, 365-368) — no backprop into ``mov_enc`` and no
  gradient through the movement chain; BPTT flows only through the GRU
  hidden states and the attention over word hiddens.
- ``mov_enc`` is frozen (absent from the reference's optimizer list,
  trainers.py:606-613); ``mov_dec`` trains at ``lr * 0.1``.
- Losses (trainers.py:452-472): SmoothL1 on motions and movements, KL
  (posterior ‖ prior) summed over z and divided by ``mov_len * B``; the
  total keeps the reference's *swapped* lambda naming
  (``loss_mot_rec * lambda_rec_mov + loss_mov_rec * lambda_rec_mot``).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Dict, Iterable, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .train_evaluators import _clip_per_network
from .t2m_generator import (
    att_layer,
    init_hidden,
    movement_conv_decoder,
    movement_conv_encoder,
    positional_table,
    prior_step,
    text_encoder_bigru,
    vae_decoder_step,
)

TRAINABLE = ("text_enc", "seq_post", "seq_pri", "att_layer", "seq_dec",
             "mov_dec")


@dataclass(frozen=True)
class CompV6TrainConfig:
    """Hyperparameters of the Comp_v6_KLD01 stage.

    The reference repo ships the trainer but not its option parser (those
    live in the upstream text-to-motion repo); the dims below are the
    published Comp_v6_KLD01 architecture already pinned by
    ``t2m_generator.DEFAULTS``, and the lambdas follow the checkpoint's
    naming (KLD01 => lambda_kld = 0.01).
    """

    lr: float = 2e-4
    grad_clip: float = 0.5          # clip_grad_norm_(net, 0.5) per network
    unit_length: int = 4
    lambda_rec_mov: float = 1.0
    lambda_rec_mot: float = 1.0
    lambda_kld: float = 0.01
    tf_ratio: float = 0.4
    dim_pose: int = 263
    dim_word: int = 300
    dim_pos_ohot: int = 15
    dim_text_hidden: int = 512
    dim_att_vec: int = 512
    dim_z: int = 128
    dim_pri_hidden: int = 1024
    dim_dec_hidden: int = 1024
    dim_movement_latent: int = 512
    dim_movement_hidden: int = 512
    n_layers_pri: int = 1
    n_layers_dec: int = 1
    # curriculum (trainers.py:616-746)
    schedule_start: int = 10        # 6 for KIT
    schedule_end: int = 49
    max_sub_epoch: int = 50
    early_stop_count: int = 3


# ---------------------------------------------------------------------------
# Scratch initialization
# ---------------------------------------------------------------------------

def _xavier_normal(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    if len(shape) == 3:  # [k, in, out] conv kernels
        fan_in, fan_out = shape[0] * shape[1], shape[0] * shape[2]
    std = float(np.sqrt(2.0 / (fan_in + fan_out)))
    return jax.random.normal(key, shape, jnp.float32) * std


def _lin_init(key, d_in, d_out, bias=True):
    """init_weight (modules.py:27-32): xavier-normal W, zero bias."""
    p = {"kernel": _xavier_normal(key, (d_in, d_out))}
    if bias:
        p["bias"] = jnp.zeros((d_out,), jnp.float32)
    return p


def _torch_lin_init(key, d_in, d_out):
    """Torch nn.Linear default (modules not covered by init_weight)."""
    bound = 1.0 / float(np.sqrt(d_in))
    k1, k2 = jax.random.split(key)
    return {
        "kernel": jax.random.uniform(k1, (d_in, d_out), jnp.float32, -bound, bound),
        "bias": jax.random.uniform(k2, (d_out,), jnp.float32, -bound, bound),
    }


def _ln_init(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def _gru_cell_init(key, d_in, d_h):
    """torch nn.GRUCell default: all U(-1/sqrt(H), 1/sqrt(H))."""
    bound = 1.0 / float(np.sqrt(d_h))
    ks = jax.random.split(key, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, jnp.float32, -bound, bound)
    return {"w_ih": u(ks[0], (d_in, 3 * d_h)), "w_hh": u(ks[1], (d_h, 3 * d_h)),
            "b_ih": u(ks[2], (3 * d_h,)), "b_hh": u(ks[3], (3 * d_h,))}


def _text_decoder_init(key, text_size, d_in, d_out, d_h, n_layers):
    """TextDecoder (modules.py:188-230): emb/z2init/mu/logvar xavier."""
    ks = jax.random.split(key, 5 + n_layers)
    p = {
        "emb": {"fc": _lin_init(ks[0], d_in, d_h), "ln": _ln_init(d_h)},
        "z2init": _lin_init(ks[1], text_size, d_h * n_layers),
        "mu_net": _lin_init(ks[2], d_h, d_out),
        "logvar_net": _lin_init(ks[3], d_h, d_out),
    }
    for i in range(n_layers):
        p[f"gru_{i}"] = _gru_cell_init(ks[5 + i], d_h, d_h)
    return p


def _vae_decoder_init(key, text_size, d_in, d_out, d_h, n_layers):
    """TextVAEDecoder (modules.py:123-185)."""
    ks = jax.random.split(key, 5 + n_layers)
    p = {
        "emb": {"fc": _lin_init(ks[0], d_in, d_h), "ln": _ln_init(d_h)},
        "z2init": _lin_init(ks[1], text_size, d_h * n_layers),
        "out_fc1": _lin_init(ks[2], d_h, d_h),
        "out_ln": _ln_init(d_h),
        "out_fc2": _lin_init(ks[3], d_h, d_out),
    }
    for i in range(n_layers):
        p[f"gru_{i}"] = _gru_cell_init(ks[5 + i], d_h, d_h)
    return p


def _conv_init(key, k, d_in, d_out):
    # torch xavier on a conv weight [out, in, k]: fan_in = in*k,
    # fan_out = out*k (the _xavier_normal 3-D branch).
    return {"kernel": _xavier_normal(key, (k, d_in, d_out)),
            "bias": jnp.zeros((d_out,), jnp.float32)}


def init_comp_v6_params(
    key,
    cfg: CompV6TrainConfig = CompV6TrainConfig(),
    mov_enc: Optional[Mapping] = None,
    mov_dec: Optional[Mapping] = None,
) -> Dict:
    """Fresh CompV6 params (t2m_generator layout, so the result feeds
    ``t2m_generate`` / ``T2MBaselineGenerator`` directly).

    ``mov_enc``/``mov_dec`` accept pre-trained decomposition-stage params
    (the reference trains the movement autoencoder first and loads it here;
    see ``movement_params_from_flax`` for our own decomp stage's output).
    """
    text_size = 2 * cfg.dim_text_hidden
    ml = cfg.dim_movement_latent
    ks = jax.random.split(key, 8)
    bound = 1.0
    params = {
        "text_enc": {
            "pos_emb": _lin_init(ks[0], cfg.dim_pos_ohot, cfg.dim_word),
            "input_emb": _lin_init(ks[1], cfg.dim_word, cfg.dim_text_hidden),
            "gru": {
                # torch nn.GRU default uniform + learned randn hidden
                # (modules.py:274, 282)
                **{f"{n}_{s}": v
                   for s in ("f", "b")
                   for n, v in _gru_cell_init(
                       jax.random.fold_in(ks[2], ord(s)),
                       cfg.dim_text_hidden, cfg.dim_text_hidden).items()},
                "hidden": jax.random.normal(
                    ks[3], (2, 1, cfg.dim_text_hidden), jnp.float32),
            },
        },
        "seq_post": _text_decoder_init(
            jax.random.fold_in(ks[4], 0), text_size,
            2 * ml + cfg.dim_att_vec, cfg.dim_z, cfg.dim_pri_hidden,
            cfg.n_layers_pri),
        "seq_pri": _text_decoder_init(
            jax.random.fold_in(ks[4], 1), text_size,
            ml + cfg.dim_att_vec, cfg.dim_z, cfg.dim_pri_hidden,
            cfg.n_layers_pri),
        "seq_dec": _vae_decoder_init(
            ks[5], text_size, ml + cfg.dim_att_vec + cfg.dim_z, ml,
            cfg.dim_dec_hidden, cfg.n_layers_dec),
        "att_layer": {
            "w_q": _lin_init(jax.random.fold_in(ks[6], 0),
                             cfg.dim_dec_hidden, cfg.dim_att_vec),
            "w_k": _lin_init(jax.random.fold_in(ks[6], 1), text_size,
                             cfg.dim_att_vec, bias=False),
            "w_v": _lin_init(jax.random.fold_in(ks[6], 2), text_size,
                             cfg.dim_att_vec),
        },
    }
    del bound
    if mov_enc is not None:
        params["mov_enc"] = jax.tree_util.tree_map(jnp.asarray, dict(mov_enc))
    else:
        ke = jax.random.split(ks[7], 3)
        params["mov_enc"] = {
            "conv1": _conv_init(ke[0], 4, cfg.dim_pose - 4,
                                cfg.dim_movement_hidden),
            "conv2": _conv_init(ke[1], 4, cfg.dim_movement_hidden, ml),
            "out_net": _lin_init(ke[2], ml, ml),
        }
    if mov_dec is not None:
        params["mov_dec"] = jax.tree_util.tree_map(jnp.asarray, dict(mov_dec))
    else:
        kd = jax.random.split(jax.random.fold_in(ks[7], 1), 3)
        params["mov_dec"] = {
            "deconv1": _conv_init(kd[0], 4, ml, cfg.dim_movement_hidden),
            "deconv2": _conv_init(kd[1], 4, cfg.dim_movement_hidden,
                                  cfg.dim_pose),
            "out_net": _lin_init(kd[2], cfg.dim_pose, cfg.dim_pose),
        }
    return params


def movement_params_from_flax(enc_params: Mapping, dec_params: Mapping):
    """Adapt our decomp stage's flax params (eval/networks.py
    MovementConvEncoder/Decoder) to the t2m_generator dict layout.

    flax Conv kernels are [k, in, out] (HIO) — identical to what
    ``movement_conv_encoder`` consumes. flax ConvTranspose with
    ``transpose_kernel=True`` stores [k, out, in], while
    ``_conv_transpose1d`` expects [k, in, out]: swap the feature axes.
    """
    def conv(p):
        return {"kernel": jnp.asarray(p["kernel"]),
                "bias": jnp.asarray(p["bias"])}

    def deconv(p):
        return {"kernel": jnp.swapaxes(jnp.asarray(p["kernel"]), 1, 2),
                "bias": jnp.asarray(p["bias"])}

    def lin(p):
        return {"kernel": jnp.asarray(p["kernel"]),
                "bias": jnp.asarray(p["bias"])}

    enc = {"conv1": conv(enc_params["conv1"]),
           "conv2": conv(enc_params["conv2"]),
           "out_net": lin(enc_params["out_net"])}
    dec = {"deconv1": deconv(dec_params["deconv1"]),
           "deconv2": deconv(dec_params["deconv2"]),
           "out_net": lin(dec_params["out_net"])}
    return enc, dec


# ---------------------------------------------------------------------------
# Forward + losses (CompTrainerV6.forward / backward_G)
# ---------------------------------------------------------------------------

def comp_v6_forward(
    params: Mapping,
    word_embs: jnp.ndarray,    # [B, L, dim_word]
    pos_onehot: jnp.ndarray,   # [B, L, dim_pos_ohot]
    cap_lens: jnp.ndarray,     # [B]
    motions: jnp.ndarray,      # [B, mov_len*unit, dim_pose] normalized
    m_lens: jnp.ndarray,       # [B] true lengths (>= mov_len*unit)
    teacher_force: jnp.ndarray,  # scalar bool/0-1 (one draw per batch)
    eps_post: jnp.ndarray,     # [mov_len, B, dim_z]
    eps_pri: jnp.ndarray,      # [mov_len, B, dim_z]
    unit_length: int = 4,
    use_prior_z: bool = False,  # eval_mode (trainers.py:352-355)
):
    """One training forward (trainers.py:277-380) as a single scan.

    Returns (fake_motions, fake_movements, movements, mus/logvars stacked
    [mov_len, B, dim_z]).

    Attention parity quirk: the reference trains BATCHED, and its AttLayer
    has no padding mask — pad_packed_sequence truncates word_hids to
    max(cap_lens) and shorter samples' zero keys still win softmax weight
    e^0 (modules.py:246-261). We reproduce that exactly (mask at the batch
    max, not per sample), unlike the inference path's per-sample mask.
    """
    B, T, D = motions.shape
    mov_len = T // unit_length
    n_pri = sum(1 for k in params["seq_pri"] if k.startswith("gru_"))
    n_dec = sum(1 for k in params["seq_dec"] if k.startswith("gru_"))
    pe_pri = jnp.asarray(positional_table(
        params["seq_pri"]["gru_0"]["w_hh"].shape[0]))
    pe_dec = jnp.asarray(positional_table(
        params["seq_dec"]["gru_0"]["w_hh"].shape[0]))

    # Movement targets, detached (trainers.py:291): no grad into mov_enc.
    movements = jax.lax.stop_gradient(
        movement_conv_encoder(params["mov_enc"], motions[..., :-4]))
    zeros_unit = jnp.zeros((B, unit_length, D - 4), motions.dtype)
    mov_in0 = jax.lax.stop_gradient(
        movement_conv_encoder(params["mov_enc"], zeros_unit)[:, 0])

    word_hids, hidden = text_encoder_bigru(
        params["text_enc"], word_embs, pos_onehot, cap_lens)
    h_pos = init_hidden(params["seq_post"], hidden, n_pri)
    h_pri = init_hidden(params["seq_pri"], hidden, n_pri)
    h_dec = init_hidden(params["seq_dec"], hidden, n_dec)

    mov_units = m_lens // unit_length
    tf = jnp.asarray(teacher_force, motions.dtype)
    batch_att_len = jnp.full((B,), jnp.max(cap_lens))

    def step(carry, inp):
        mov_in, h_pos, h_pri, h_dec = carry
        i, mov_tgt, e_po, e_pr = inp
        att_vec, _ = att_layer(params["att_layer"], h_dec[-1], word_hids,
                               batch_att_len)
        tta = mov_units - i
        pos_in = jnp.concatenate([mov_in, mov_tgt, att_vec], axis=-1)
        z_pos, mu_pos, lv_pos, h_pos = prior_step(
            params["seq_post"], pe_pri, pos_in, h_pos, tta, e_po)
        pri_in = jnp.concatenate([mov_in, att_vec], axis=-1)
        z_pri, mu_pri, lv_pri, h_pri = prior_step(
            params["seq_pri"], pe_pri, pri_in, h_pri, tta, e_pr)
        z = z_pri if use_prior_z else z_pos
        dec_in = jnp.concatenate([mov_in, att_vec, z], axis=-1)
        fake_mov, h_dec = vae_decoder_step(
            params["seq_dec"], pe_dec, dec_in, h_dec, tta)
        # Teacher forcing, both branches detached (trainers.py:365-368).
        mov_next = jax.lax.stop_gradient(
            tf * mov_tgt + (1.0 - tf) * fake_mov)
        return ((mov_next, h_pos, h_pri, h_dec),
                (fake_mov, mu_pos, lv_pos, mu_pri, lv_pri))

    mov_tgts = jnp.swapaxes(movements, 0, 1)  # [mov_len, B, latent]
    _, (fake_movs, mu_pos, lv_pos, mu_pri, lv_pri) = jax.lax.scan(
        step, (mov_in0, h_pos, h_pri, h_dec),
        (jnp.arange(mov_len), mov_tgts, eps_post, eps_pri))

    fake_movements = jnp.swapaxes(fake_movs, 0, 1)  # [B, mov_len, latent]
    # Training decode has no length masking (trainers.py:374): every sample
    # in a curriculum batch is exactly mov_len movements long.
    fake_motions = movement_conv_decoder(params["mov_dec"], fake_movements)
    return (fake_motions, fake_movements, movements,
            (mu_pos, lv_pos, mu_pri, lv_pri))


def smooth_l1(pred, target):
    """torch.nn.SmoothL1Loss default (beta=1, mean reduction)."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < 1.0, 0.5 * d * d, d - 0.5))


def kl_post_pri(mu1, lv1, mu2, lv2):
    """CompTrainerV6.kl_criterion (trainers.py:261-268): KL(post ‖ pri)
    summed over z and divided by the number of rows (mov_len * B)."""
    kld = (0.5 * (lv2 - lv1)
           + (jnp.exp(lv1) + (mu1 - mu2) ** 2) / (2.0 * jnp.exp(lv2)) - 0.5)
    rows = mu1.shape[0] * mu1.shape[1]
    return jnp.sum(kld) / rows


def comp_v6_losses(fake_motions, fake_movements, motions, movements, stats,
                   cfg: CompV6TrainConfig):
    """backward_G (trainers.py:452-460) incl. the swapped-lambda quirk."""
    mu_pos, lv_pos, mu_pri, lv_pri = stats
    loss_mot_rec = smooth_l1(fake_motions, motions)
    loss_mov_rec = smooth_l1(fake_movements, movements)
    loss_kld = kl_post_pri(mu_pos, lv_pos, mu_pri, lv_pri)
    loss_gen = (loss_mot_rec * cfg.lambda_rec_mov
                + loss_mov_rec * cfg.lambda_rec_mot
                + loss_kld * cfg.lambda_kld)
    return loss_gen, {"loss_gen": loss_gen, "loss_mot_rec": loss_mot_rec,
                      "loss_mov_rec": loss_mov_rec, "loss_kld": loss_kld}


# ---------------------------------------------------------------------------
# Fused train step
# ---------------------------------------------------------------------------

def make_comp_v6_step(cfg: CompV6TrainConfig = CompV6TrainConfig()):
    """Returns (init_opt, step, val_step).

    step(params, opt_state, batch, key, teacher_force) -> (params,
    opt_state, logs). batch = dict(word_embs, pos_onehot, cap_lens,
    motions, m_lens). One compilation per distinct motions length
    (= curriculum schedule length), matching the reference's per-length
    DataLoader rebuild.
    """
    # Per-network Adam; mov_dec at lr*0.1 (trainers.py:607-614).
    def label_tree(params):
        return {k: ("mov_dec" if k == "mov_dec" else "main")
                for k in params}

    tx = optax.multi_transform(
        {"main": optax.adam(cfg.lr), "mov_dec": optax.adam(cfg.lr * 0.1)},
        label_tree)

    def split_eps(key, mov_len, B):
        k1, k2 = jax.random.split(key)
        shape = (mov_len, B, cfg.dim_z)
        return (jax.random.normal(k1, shape, jnp.float32),
                jax.random.normal(k2, shape, jnp.float32))

    def loss_fn(trainable, frozen, batch, teacher_force, eps_post, eps_pri):
        params = {**trainable, "mov_enc": frozen}
        fake_motions, fake_movements, movements, stats = comp_v6_forward(
            params, batch["word_embs"], batch["pos_onehot"],
            batch["cap_lens"], batch["motions"], batch["m_lens"],
            teacher_force, eps_post, eps_pri, cfg.unit_length)
        return comp_v6_losses(fake_motions, fake_movements,
                              batch["motions"], movements, stats, cfg)

    @jax.jit
    def step(params, opt_state, batch, key, teacher_force):
        mov_len = batch["motions"].shape[1] // cfg.unit_length
        eps_post, eps_pri = split_eps(key, mov_len,
                                      batch["motions"].shape[0])
        trainable = {k: params[k] for k in TRAINABLE}
        (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            trainable, params["mov_enc"], batch, teacher_force,
            eps_post, eps_pri)
        # clip_grad_norm_(net, 0.5) per network (trainers.py:251-254).
        grads = _clip_per_network(grads, cfg.grad_clip)
        updates, opt_state = tx.update(grads, opt_state, trainable)
        trainable = optax.apply_updates(trainable, updates)
        return {**trainable, "mov_enc": params["mov_enc"]}, opt_state, logs

    @jax.jit
    def val_step(params, batch):
        """Validation pass: tf=0, eps=0 contributes no extra variance?
        No — the reference's val forward still samples eps (trainers.py:
        705-711 calls the stochastic forward); we keep eps but from a
        fixed fold so the val loss is deterministic given the batch."""
        mov_len = batch["motions"].shape[1] // cfg.unit_length
        key = jax.random.PRNGKey(0)
        eps_post, eps_pri = split_eps(key, mov_len,
                                      batch["motions"].shape[0])
        trainable = {k: params[k] for k in TRAINABLE}
        _, logs = loss_fn(trainable, params["mov_enc"], batch,
                          jnp.asarray(0.0), eps_post, eps_pri)
        return logs

    def init_opt(params):
        return tx.init({k: params[k] for k in TRAINABLE})

    return init_opt, step, val_step


# ---------------------------------------------------------------------------
# Curriculum runner (CompTrainerV6.train, trainers.py:604-746)
# ---------------------------------------------------------------------------

def train_comp_v6(
    params: Dict,
    make_batches: Callable[[int, str], Iterable[Dict]],
    cfg: CompV6TrainConfig = CompV6TrainConfig(),
    key=None,
    rng: Optional[np.random.Generator] = None,
    log: Callable = print,
    on_length_done: Optional[Callable[[int, Dict], None]] = None,
) -> Dict:
    """Scheduled-length curriculum: for each schedule_len from
    ``cfg.schedule_start`` to ``cfg.schedule_end``, run sub-epochs with
    early stopping on the validation loss (min tracked per length; stop
    after ``early_stop_count`` non-improvements or a 0.1 regression —
    trainers.py:731-739).

    ``make_batches(schedule_len, split)`` yields batch dicts whose motions
    are exactly ``schedule_len * unit_length`` frames (split is 'train' or
    'val').
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    if rng is None:
        rng = np.random.default_rng(0)
    init_opt, step, val_step = make_comp_v6_step(cfg)
    opt_state = init_opt(params)
    it = 0
    for schedule_len in range(cfg.schedule_start, cfg.schedule_end + 1):
        min_val = np.inf
        stop_cnt = 0
        for sub_epoch in range(cfg.max_sub_epoch):
            n = 0
            logs = None
            for batch in make_batches(schedule_len, "train"):
                key, sub = jax.random.split(key)
                tf = jnp.asarray(
                    1.0 if rng.random() < cfg.tf_ratio else 0.0)
                params, opt_state, logs = step(params, opt_state, batch,
                                               sub, tf)
                it += 1
                n += 1
            if logs is None:  # no clip long enough for this length
                break
            val_losses = [float(val_step(params, b)["loss_gen"])
                          for b in make_batches(schedule_len, "val")]
            # Reference divides the sum by len(val_loader)+1 (trainers.py:
            # 716-719) — the early-stop thresholds are absolute, so the
            # divisor is part of the protocol.
            val = (float(np.sum(val_losses)) / (len(val_losses) + 1)
                   if val_losses else float("nan"))
            log(f"sl={schedule_len} sub_epoch={sub_epoch} it={it} "
                f"train_loss={float(logs['loss_gen']):.5f} val={val:.5f}")
            if not np.isfinite(val):
                break
            if val < min_val:
                min_val = val
                stop_cnt = 0
            elif stop_cnt < cfg.early_stop_count:
                stop_cnt += 1
            else:
                break
            if val - min_val >= 0.1:
                break
        if on_length_done is not None:
            on_length_done(schedule_len, params)
    return params


def make_curriculum_batches(
    train_ds,
    val_ds,
    batch_size: int,
    cfg: CompV6TrainConfig = CompV6TrainConfig(),
    seed: int = 0,
    max_batches: int = 0,
) -> Callable[[int, str], Iterable[Dict]]:
    """Curriculum batch source over our HumanMLDataset clips, mirroring the
    reference's ``Text2MotionDatasetBaseline`` (dataset.py:381-534):

    - a pointer over the length-sorted clips admits only clips with
      ``length >= schedule_len * unit_length`` (``reset_max_len``, :458-462);
    - the coin2 single/double crop picks a unit-aligned source length
      ``m_length >= max_length`` (:497-516); the model consumes the exact
      ``max_length``-frame ``tgt_motion`` crop while ``m_lens`` carries the
      source length (the trainer's tta countdown, trainers.py:330);
    - z-normalization with the dataset's (eval-stat) mean/std (:520-523);
    - batches sorted by cap_len descending (collate_fn, dataset.py:17-19).

    ``max_batches`` (0 = no cap) bounds batches per (length, split) pass for
    smoke runs. Datasets may lack a ``w_vectorizer``; word features are then
    zeros (same degraded mode as the other CLI stages).
    """
    unit = cfg.unit_length
    rng = np.random.default_rng(seed)

    def one_item(ds, clip, max_len):
        opt = ds.opt
        entry = clip.texts[int(rng.integers(len(clip.texts)))]
        tokens = entry.tokens
        if len(tokens) < opt.max_text_len:
            tokens = ["sos/OTHER"] + tokens + ["eos/OTHER"]
            sent_len = len(tokens)
            tokens = tokens + ["unk/OTHER"] * (opt.max_text_len + 2 - sent_len)
        else:
            tokens = ["sos/OTHER"] + tokens[: opt.max_text_len] + ["eos/OTHER"]
            sent_len = len(tokens)
        if ds.w_vectorizer is not None:
            embs, pos = zip(*(ds.w_vectorizer[t] for t in tokens))
            word_embs = np.stack(embs).astype(np.float32)
            pos_oh = np.stack(pos).astype(np.float32)
        else:
            word_embs = np.zeros((len(tokens), cfg.dim_word), np.float32)
            pos_oh = np.zeros((len(tokens), cfg.dim_pos_ohot), np.float32)

        m_length = clip.length
        len_gap = (m_length - max_len) // unit
        coin2 = ("single" if unit >= 10
                 else ["single", "single", "double"][int(rng.integers(3))])
        if len_gap == 0 or (len_gap == 1 and coin2 == "double"):
            m_length = max_len
            s_idx = 0
        else:
            m_length = max_len + unit * (len_gap - (coin2 == "double"))
            s_idx = int(rng.integers(clip.length - m_length + 1))
        tgt = (clip.motion[s_idx : s_idx + max_len] - ds.mean) / ds.std
        return word_embs, pos_oh, sent_len, tgt.astype(np.float32), m_length

    def make_batches(schedule_len: int, split: str):
        ds = train_ds if split == "train" else val_ds
        max_len = schedule_len * unit
        lengths = np.asarray([c.length for c in ds.clips])
        ptr = int(np.searchsorted(lengths, max_len))
        idxs = np.arange(ptr, len(ds.clips))
        rng.shuffle(idxs)
        built = 0
        for start in range(0, len(idxs) - batch_size + 1, batch_size):
            items = [one_item(ds, ds.clips[i], max_len)
                     for i in idxs[start : start + batch_size]]
            items.sort(key=lambda it: it[2], reverse=True)
            yield {
                "word_embs": jnp.asarray(np.stack([it[0] for it in items])),
                "pos_onehot": jnp.asarray(np.stack([it[1] for it in items])),
                "cap_lens": jnp.asarray([it[2] for it in items], jnp.int32),
                "motions": jnp.asarray(np.stack([it[3] for it in items])),
                "m_lens": jnp.asarray([it[4] for it in items], jnp.int32),
            }
            built += 1
            if max_batches and built >= max_batches:
                return

    return make_batches


def save_comp_v6_params(path: str, params: Dict) -> str:
    """Persist in the layout ``t2m_generator.load_comp_v6`` produces, so
    ``T2MBaselineGenerator(params=np.load(...).item())`` just works."""
    np.save(path, jax.tree_util.tree_map(np.asarray, params))
    return path
