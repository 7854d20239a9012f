"""Native VOS backbone trainer (TAPNet interaction + propagation).

The reference has NO backbone training: its three VOS backbones are external
git clones with downloaded pretrained weights (``README.md:35-41``). A
standalone framework needs a native path from raw clips to working backbone
weights — this trainer provides it for the flagship TAPNet family.

Training sample = a K-frame window with the annotated frame at index 0
(windows are drawn forward and reversed with equal probability, so the
transfer net learns both propagation directions). Per step, ONE jitted
program runs:

  A-Net on the scribbled frame (round-1 interaction channels:
  [0.5-map, positive scribble, zeros] per utils/utils_atnet.py:31-39) →
  T-Net `lax.scan` over frames 1..K-1 carrying its own predictions (matching
  inference, no teacher forcing) → per-frame sigmoid BCE against the object
  masks → grads through the scan → Adam.

Scribbles are synthesised on host by the same robot the evaluation session
uses, so train and eval inputs share a distribution.

CLI: ``python -m ivosw_tpu.train.train_vos [key=value ...]``
"""

from __future__ import annotations

import functools
import os
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivosw_tpu.core.config import Config, load_config
from ivosw_tpu.models.vos.tapnet import TAPNet
from ivosw_tpu.utils.misc import AverageMeter, create_stream_logger, set_random_seed


def bce_with_logits(logit, target, eps: float = 1e-7):
    p = jax.nn.log_sigmoid(logit)
    q = jax.nn.log_sigmoid(-logit)
    return -(target * p + (1.0 - target) * q)


def bce_probs(prob, target, eps: float = 1e-6):
    """BCE on probabilities (needed after alpha-blending, which operates on
    probabilities at inference — tapnet.py::_propagate_round)."""
    prob = jnp.clip(prob, eps, 1.0 - eps)
    return -(target * jnp.log(prob) + (1.0 - target) * jnp.log1p(-prob))


def tapnet_window_loss(params, batch):
    """One (possibly multi-round) training episode as one program.

    batch: img [K,H,W,3], gt [O,K,H,W] float binary, interaction /
    interaction2 [O,H,W,3] (A-Net channels for frames 0 and K-1),
    prev_round [O,K,H,W] previous-round probability maps (0.5-filled on
    round-1 samples where they are unused), alpha [K] blend ramp,
    mem2_valid [] — 1.0 on round-2 samples where frame K-1 is a second
    annotated-memory entry (reference round-≥2 recipe
    utils/utils_atnet.py:40-52,126-147).
    """
    model = TAPNet()
    img = batch["img"]
    gt = batch["gt"]
    o = gt.shape[0]
    hw = img.shape[1:3]
    mem2_valid = batch["mem2_valid"]
    alpha = batch["alpha"]
    prev_round = batch["prev_round"]

    img0 = jnp.broadcast_to(img[0][None], (o,) + img[0].shape)
    anno_logit, anno_r4 = model.apply(
        {"params": params}, img0, batch["interaction"], method=TAPNet.interact
    )
    loss = jnp.mean(bce_with_logits(anno_logit, gt[:, 0]))
    anno_prob = jax.nn.sigmoid(anno_logit)

    # second annotated frame (K-1) — active on round-2 samples only; its
    # A-Net output is supervised and its features join the memory ring
    imgl = jnp.broadcast_to(img[-1][None], (o,) + img[-1].shape)
    anno2_logit, anno2_r4 = model.apply(
        {"params": params}, imgl, batch["interaction2"], method=TAPNet.interact
    )
    loss = loss + mem2_valid * jnp.mean(bce_with_logits(anno2_logit, gt[:, -1]))

    r4s, r3s, r2s = model.apply({"params": params}, img, method=TAPNet.encode_frames)
    p = anno_r4.shape[1] * anno_r4.shape[2]
    mem_keys = jnp.concatenate(
        [anno_r4.reshape(o, p, -1), anno2_r4.reshape(o, p, -1)], axis=1
    )
    mem_valid = jnp.concatenate(
        [
            jnp.ones((o, p), jnp.float32),
            jnp.broadcast_to(mem2_valid, (o, p)).astype(jnp.float32),
        ],
        axis=1,
    )

    def body(carry, inp):
        r4c, r3c, r2c, gt_t, prev_t, alpha_t = inp
        r4b = jnp.broadcast_to(r4c[None], (o,) + r4c.shape)
        r3b = jnp.broadcast_to(r3c[None], (o,) + r3c.shape)
        r2b = jnp.broadcast_to(r2c[None], (o,) + r2c.shape)
        logit = model.apply(
            {"params": params}, r4b, r3b, r2b, mem_keys, mem_valid, carry, hw,
            method=TAPNet.transfer,
        )
        # train under the same alpha-blend the inference scan applies
        blended = alpha_t * jax.nn.sigmoid(logit) + (1.0 - alpha_t) * prev_t
        step_loss = jnp.mean(bce_probs(blended, gt_t))
        return blended, step_loss

    gt_prop = jnp.transpose(gt[:, 1:], (1, 0, 2, 3))  # [K-1, O, H, W]
    prev_prop = jnp.transpose(prev_round[:, 1:], (1, 0, 2, 3))
    _, step_losses = jax.lax.scan(
        body,
        anno_prob,
        (r4s[1:], r3s[1:], r2s[1:], gt_prop, prev_prop, alpha[1:, None, None, None]),
    )
    return loss + jnp.mean(step_losses)


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "loss_fn"),
    donate_argnames=("params", "opt_state"),
)
def vos_train_step(params, opt_state, batch, optimizer, loss_fn):
    loss, grads = jax.value_and_grad(loss_fn)(params, batch)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "loss_fn"),
    donate_argnames=("params", "opt_state"),
)
def vos_train_step_dp(params, opt_state, batch, optimizer, loss_fn):
    """Data-parallel train step: every leaf of ``batch`` carries a leading
    window axis [B, ...] and the loss is the mean over windows (vmap of the
    per-window episode loss). With the batch sharded over a ``('data',)``
    mesh and params replicated, XLA inserts the gradient psum over ICI —
    no hand-written collectives, per the component #27 policy (SURVEY §5).
    Numerics note: B windows per step scales the effective batch, not a
    different objective — mean-of-windows equals the expectation the
    single-window step samples one draw of."""

    def batch_loss(p, b):
        return jnp.mean(jax.vmap(lambda one: loss_fn(p, one))(b))

    loss, grads = jax.value_and_grad(batch_loss)(params, batch)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


def _degrade_masks(gt_onehot: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Plausible previous-round probability maps from ground truth.

    Emulates an imperfect earlier prediction: per-object random shift,
    erosion/dilation, occasional total miss, and a confidence below 1 — the
    input distribution the reference's round-≥2 channels see
    (utils/utils_atnet.py:40-52 feeds real previous-round prob maps)."""
    import cv2

    o, k, h, w = gt_onehot.shape
    prev = np.zeros_like(gt_onehot, dtype=np.float32)
    kern = np.ones((3, 3), np.uint8)
    max_shift = max(2, h // 16)
    for i in range(o):
        if rng.random() < 0.1:  # whole-object miss: round 1 failed entirely
            continue
        dy, dx = rng.integers(-max_shift, max_shift + 1, size=2)
        m = np.roll(gt_onehot[i], (int(dy), int(dx)), axis=(1, 2))
        iters = int(rng.integers(0, 3))
        if iters:
            op = cv2.erode if rng.random() < 0.5 else cv2.dilate
            m = np.stack(
                [op(f.astype(np.uint8), kern, iterations=iters) for f in m]
            ).astype(np.float32)
        conf = 0.55 + 0.4 * rng.random()
        prev[i] = m * conf
    return prev


def _prev_labels(prev_round: np.ndarray) -> np.ndarray:
    """[O,K,H,W] prob maps → [K,H,W] label masks (argmax, bg where all <0.5)."""
    best = prev_round.max(axis=0)
    label = prev_round.argmax(axis=0).astype(np.int32) + 1
    return np.where(best >= 0.5, label, 0).astype(np.int32)


def sample_windows(
    registry,
    sequences,
    rng: np.random.Generator,
    window: int,
    robot,
    scribble_dilation: int = 3,
    round2_prob: float = 0.5,
) -> Iterator[dict]:
    """Infinite stream of training windows (host-side). Yields everything
    any backbone family consumes: interaction channels (tapnet), per-object
    pos/neg scribble maps (ipnet), full scribble maps (matchnet).

    With probability ``round2_prob`` a window is a ROUND-2 episode: a
    degraded previous-round prediction drives corrective robot scribbles,
    the A-Net channels are [prev-prob, pos, neg] instead of [0.5, pos, 0]
    (reference utils/utils_atnet.py:40-52), frame K-1 becomes a second
    annotated-memory entry, and the alpha blend ramp toward it is active
    (utils/utils_atnet.py:126-147). The per-family losses consume the same
    round-2 episode through their own cross-round machinery: tapnet's
    second memory entry + alpha blend, matchnet's global-map running max
    (utils/utils_manet.py global_map_tmp_dic), ipnet's Get_weight distance
    fusion (utils/utils_ipn.py:37-72) — ``fuse_w`` carries that ramp."""
    from ivosw_tpu.data.scribbles import scribble_masks_per_object
    from ivosw_tpu.models.vos.ipnet import get_weight
    from ivosw_tpu.models.vos.tapnet import compute_alpha

    fruitless = 0
    while True:
        if fruitless > 100 * max(len(sequences), 1):
            raise ValueError(
                f"no training window drawn after {fruitless} attempts — "
                f"are all clips shorter than window={window} or object-free?"
            )
        seq = sequences[int(rng.integers(len(sequences)))]
        frames = registry.load_images(seq)
        gt = registry.load_annotations(seq)
        t = frames.shape[0]
        if t < window:
            fruitless += 1
            continue
        start = int(rng.integers(0, t - window + 1))
        img = frames[start : start + window]
        g = gt[start : start + window]
        if rng.random() < 0.5:  # reversed windows train backward propagation
            img = img[::-1].copy()
            g = g[::-1].copy()
        n_obj = int(g.max())
        if n_obj == 0:
            fruitless += 1
            continue
        h, w = g.shape[1:]
        gt_onehot = np.zeros((n_obj, window, h, w), dtype=np.float32)
        for obj in range(1, n_obj + 1):
            gt_onehot[obj - 1] = (g == obj).astype(np.float32)

        round2 = rng.random() < round2_prob
        if round2:
            prev_round = _degrade_masks(gt_onehot, rng)
            prev_lab = _prev_labels(prev_round)
            alpha = compute_alpha(window, np.array([window - 1]), 0)
            fuse_w = get_weight(window, np.array([window - 1]), 0)
        else:
            # round 1: no previous prediction; alpha ramp inactive (all 1)
            prev_round = np.full_like(gt_onehot, 0.5)
            prev_lab = np.zeros_like(g)
            alpha = np.ones(window, dtype=np.float32)
            fuse_w = np.ones(window, dtype=np.float32)

        scrib = robot.interact(seq, prev_lab, g, n_obj, frame=0)
        maps = scribble_masks_per_object(
            scrib, (h, w), 0, n_obj, dilation=scribble_dilation
        )
        if round2:
            scrib2 = robot.interact(seq, prev_lab, g, n_obj, frame=window - 1)
            maps2 = scribble_masks_per_object(
                scrib2, (h, w), window - 1, n_obj, dilation=scribble_dilation
            )
        else:
            maps2 = np.zeros_like(maps)
        any_scrib = maps.sum(axis=0)
        any_scrib2 = maps2.sum(axis=0)
        interaction = np.zeros((n_obj, h, w, 3), dtype=np.float32)
        interaction2 = np.zeros((n_obj, h, w, 3), dtype=np.float32)
        pos = np.zeros((n_obj, h, w), dtype=np.float32)
        neg = np.zeros((n_obj, h, w), dtype=np.float32)
        for obj in range(1, n_obj + 1):
            pos[obj - 1] = maps[obj]
            neg[obj - 1] = np.clip(any_scrib - maps[obj], 0.0, 1.0)
            if round2:
                # reference round-≥2 channels: [prev-mask, pos, neg]
                interaction[obj - 1] = np.stack(
                    [prev_round[obj - 1, 0], maps[obj], neg[obj - 1]], axis=-1
                )
                interaction2[obj - 1] = np.stack(
                    [
                        prev_round[obj - 1, -1],
                        maps2[obj],
                        np.clip(any_scrib2 - maps2[obj], 0.0, 1.0),
                    ],
                    axis=-1,
                )
            else:
                # reference round-1 channels: [0.5, pos, 0]
                interaction[obj - 1] = np.stack(
                    [
                        np.full((h, w), 0.5, np.float32),
                        maps[obj],
                        np.zeros((h, w), np.float32),
                    ],
                    axis=-1,
                )
        pos2 = maps2[1:].astype(np.float32)
        neg2 = np.clip(any_scrib2[None] - maps2[1:], 0.0, 1.0).astype(np.float32)
        yield {
            "img": img.astype(np.float32),
            "gt": gt_onehot,
            "interaction": interaction,
            "interaction2": interaction2,
            "prev_round": prev_round,
            "alpha": alpha.astype(np.float32),
            "fuse_w": fuse_w.astype(np.float32),
            "mem2_valid": np.float32(1.0 if round2 else 0.0),
            "pos": pos,
            "neg": neg,
            "pos2": pos2,
            "neg2": neg2,
            "scrib_maps": maps.astype(np.float32),
            "scrib_maps2": maps2.astype(np.float32),
        }


def matchnet_window_loss(params, batch):
    """batch: img [K,H,W,3], gt [O,K,H,W], scrib_maps/scrib_maps2 [O+1,H,W].

    Matching + guidance live at the /4 scale (r2), matching the adapter
    (matchnet.py — scribbles/similarity at /16 vanish at small operating
    points). Round-2 samples (mem2_valid=1) exercise MatchNet's cross-round
    machinery the adapter uses at eval rounds ≥2 (matchnet.py
    _propagate_round_fn, reference utils/utils_manet.py global_map_tmp_dic):
    frame K-1 acts as the PRIOR round's anchor — its interact pass is
    supervised, and each frame's global map starts from its similarity vs
    that prior anchor so ``max(prior, current)`` running-max accumulation is
    on the training path, not inference-only."""
    import jax.image as jimage

    from ivosw_tpu.models.vos.matchnet import MatchNet, _object_sim_maps

    model = MatchNet()
    img = batch["img"]
    gt = batch["gt"]
    o, k = gt.shape[0], img.shape[0]
    hw = img.shape[1:3]
    mem2_valid = batch["mem2_valid"]

    r4s, r3s, r2s = model.apply({"params": params}, img, method=MatchNet.encode)
    h4, w4 = r2s.shape[1:3]

    def interact_at(idx, scrib, prev_full):
        pos = jimage.resize(scrib[1:], (o, h4, w4), "bilinear")
        neg_full = jnp.clip(scrib.sum(0, keepdims=True) - scrib[1:], 0, 1)
        neg = jimage.resize(neg_full, (o, h4, w4), "bilinear")
        prev = jimage.resize(prev_full, (o, h4, w4), "bilinear")
        guide4 = jnp.stack([pos, neg, prev], axis=-1).astype(jnp.bfloat16)
        r4o = jnp.broadcast_to(r4s[idx][None], (o,) + r4s[idx].shape)
        r3o = jnp.broadcast_to(r3s[idx][None], (o,) + r3s[idx].shape)
        r2o = jnp.broadcast_to(r2s[idx][None], (o,) + r2s[idx].shape)
        return model.apply(
            {"params": params}, r4o, r3o, r2o, guide4, hw,
            method=MatchNet.interact,
        )

    # round-2 samples feed the degraded previous-round mask, round-1 zeros
    anno_logit = interact_at(0, batch["scrib_maps"], batch["prev_round"][:, 0] * mem2_valid)
    loss = jnp.mean(bce_with_logits(anno_logit, gt[:, 0]))
    anno_prob = jax.nn.sigmoid(anno_logit)
    ref_probs4 = jimage.resize(anno_prob, (o, h4, w4), "bilinear")

    # prior-round anchor at K-1 (round-2 samples only): supervised interact
    # pass + per-frame global-map seed, mirroring what a real earlier round
    # would have left in _MatchState.global_map
    anno2_logit = interact_at(
        k - 1, batch["scrib_maps2"], batch["prev_round"][:, -1] * mem2_valid
    )
    loss = loss + mem2_valid * jnp.mean(bce_with_logits(anno2_logit, gt[:, -1]))
    prior_probs4 = jimage.resize(
        jax.nn.sigmoid(anno2_logit), (o, h4, w4), "bilinear"
    )
    gm_prior = jax.vmap(lambda e: _object_sim_maps(e, r2s[-1], prior_probs4))(
        r2s[1:]
    )  # [K-1, O, h4, w4]
    gm_prior = jnp.where(mem2_valid > 0, gm_prior, -1.0)

    def body(carry, inp):
        prev_prob, prev_emb = carry
        r4c, r3c, r2c, gt_t, gm_prior_t, prev_round_t = inp
        gmap = _object_sim_maps(r2c, r2s[0], ref_probs4)
        gmap = jnp.maximum(gm_prior_t, gmap)  # running max across rounds
        prev4 = jimage.resize(prev_prob, (o, h4, w4), "bilinear")
        lmap = _object_sim_maps(r2c, prev_emb, prev4)
        prev_round4 = jimage.resize(prev_round_t, (o, h4, w4), "bilinear")
        guide4 = jnp.stack(
            [gmap, lmap, prev4, prev_round4], axis=-1
        ).astype(jnp.bfloat16)
        r4b = jnp.broadcast_to(r4c[None], (o,) + r4c.shape)
        r3b = jnp.broadcast_to(r3c[None], (o,) + r3c.shape)
        r2b = jnp.broadcast_to(r2c[None], (o,) + r2c.shape)
        logit = model.apply(
            {"params": params}, r4b, r3b, r2b, guide4, hw,
            method=MatchNet.propagate,
        )
        step_loss = jnp.mean(bce_with_logits(logit, gt_t))
        return (jax.nn.sigmoid(logit), r2c), step_loss

    gt_prop = jnp.transpose(gt[:, 1:], (1, 0, 2, 3))
    # previous-ROUND guidance: real degraded maps on round-2 samples, zeros
    # on round-1 (matching the adapter's zero-initialised prob_maps)
    prev_round_prop = (
        jnp.transpose(batch["prev_round"][:, 1:], (1, 0, 2, 3)) * mem2_valid
    )
    _, step_losses = jax.lax.scan(
        body,
        (anno_prob, r2s[0]),
        (r4s[1:], r3s[1:], r2s[1:], gt_prop, gm_prior, prev_round_prop),
    )
    return loss + jnp.mean(step_losses)


def ipnet_window_loss(params, batch):
    """batch: img [K,H,W,3], gt [O,K,H,W], pos/neg/pos2/neg2 [O,H,W],
    fuse_w [K].

    Round-2 samples (mem2_valid=1) exercise IPNet's multi-anchor machinery
    the adapter uses at eval rounds ≥2 (ipnet.py:134-179, reference
    utils/utils_ipn.py:37-72): frame K-1 acts as the prior round's anchor
    (supervised interact pass) and each propagation step is fused with the
    previous-round map through the Get_weight distance ramp — the same
    ``w·new + (1−w)·old`` the inference scan applies — so the net trains
    under the blend it will be evaluated under."""
    from ivosw_tpu.models.vos.ipnet import IPNet, _ref_vector

    model = IPNet()
    img = batch["img"]
    gt = batch["gt"]
    o = gt.shape[0]
    hw = img.shape[1:3]
    mem2_valid = batch["mem2_valid"]

    img0 = jnp.broadcast_to(img[0][None], (o,) + img[0].shape)
    # round-2 samples feed the degraded previous-round mask, round-1 zeros
    prev0 = batch["prev_round"][:, 0] * mem2_valid
    anno_logit = model.apply(
        {"params": params}, img0, batch["pos"], batch["neg"], prev0,
        method=IPNet.interact,
    )
    loss = jnp.mean(bce_with_logits(anno_logit, gt[:, 0]))
    anno_prob = jax.nn.sigmoid(anno_logit)

    # prior-round anchor at K-1 (round-2 samples only)
    imgl = jnp.broadcast_to(img[-1][None], (o,) + img[-1].shape)
    anno2_logit = model.apply(
        {"params": params}, imgl, batch["pos2"], batch["neg2"],
        batch["prev_round"][:, -1] * mem2_valid,
        method=IPNet.interact,
    )
    loss = loss + mem2_valid * jnp.mean(bce_with_logits(anno2_logit, gt[:, -1]))

    r4s, r3s, r2s = model.apply({"params": params}, img, method=IPNet.encode)
    ref_vec = _ref_vector(r4s[0], anno_prob)

    def body(carry, inp):
        r4c, r3c, r2c, gt_t, prev_t, w_t = inp
        r4b = jnp.broadcast_to(r4c[None], (o,) + r4c.shape)
        r3b = jnp.broadcast_to(r3c[None], (o,) + r3c.shape)
        r2b = jnp.broadcast_to(r2c[None], (o,) + r2c.shape)
        logit = model.apply(
            {"params": params}, r4b, r3b, r2b, ref_vec, carry, hw,
            method=IPNet.propagate,
        )
        # Get_weight fusion, exactly as the inference scan applies it
        fused = w_t * jax.nn.sigmoid(logit) + (1.0 - w_t) * prev_t
        step_loss = jnp.mean(bce_probs(fused, gt_t))
        return fused, step_loss

    gt_prop = jnp.transpose(gt[:, 1:], (1, 0, 2, 3))
    prev_prop = jnp.transpose(batch["prev_round"][:, 1:], (1, 0, 2, 3))
    _, step_losses = jax.lax.scan(
        body,
        anno_prob,
        (
            r4s[1:],
            r3s[1:],
            r2s[1:],
            gt_prop,
            prev_prop,
            batch["fuse_w"][1:, None, None, None],
        ),
    )
    return loss + jnp.mean(step_losses)


def _family(name: str):
    if name in ("tapnet", "fake"):
        from ivosw_tpu.models.vos.tapnet import init_tapnet_params

        return init_tapnet_params, tapnet_window_loss, "tapnet"
    if name == "matchnet":
        from ivosw_tpu.models.vos.matchnet import init_matchnet_params

        return init_matchnet_params, matchnet_window_loss, "matchnet"
    if name == "ipnet":
        from ivosw_tpu.models.vos.ipnet import init_ipnet_params

        return init_ipnet_params, ipnet_window_loss, "ipnet"
    raise NotImplementedError(name)


def run(
    cfg: Config,
    registry=None,
    num_steps: int = 2000,
    window: int = 4,
    lr: float = 1e-4,
    params=None,
    log=None,
    save_every: int = 500,
    round2_prob: float = 0.5,
    resume_path: str | None = None,
    dp_windows: int = 0,
    mesh=None,
):
    """Train the backbone family selected by ``cfg.vos``.

    ``dp_windows > 1`` turns on data parallelism: each step stacks that many
    sampled windows and shards them over a ``('data',)`` device mesh
    (``mesh`` or one spanning all local devices), with params replicated —
    the gradient all-reduce is XLA's. The reference trains nothing, so this
    has no counterpart there; it is the scale-out path for the heaviest
    trainer in the rebuild.

    When ``resume_path`` is set, a {params, opt_state, step} snapshot is
    written there every ``save_every`` steps and the final checkpoint lands
    at ``ckpt_dir/<family>.orbax`` only on completion (so skip-if-exists
    stage logic stays sound). If the snapshot already exists, training
    resumes from it: the deterministic window stream is fast-forwarded by
    the consumed step count, so an interrupted-then-resumed run consumes the
    exact batch sequence an uninterrupted one would (bit-reproducibility of
    the demo pipeline survives interruption).
    """
    import shutil
    import time

    from ivosw_tpu.data.registry import registry_from_config
    from ivosw_tpu.interact.robot import ScribbleRobot
    from ivosw_tpu.utils.checkpoint import load_pytree, save_pytree, upload_pytree

    log = log or create_stream_logger("train_vos")
    rng = set_random_seed(cfg.seed)
    registry = registry or registry_from_config(cfg)
    sequences = registry.subset(cfg.data.subset)
    robot = ScribbleRobot(seed=cfg.seed)

    init_fn, loss_fn, ckpt_name = _family(cfg.vos)
    if params is None:
        params = init_fn(cfg.seed)
    optimizer = optax.adam(lr)

    use_dp = dp_windows and dp_windows > 1
    if use_dp:
        from ivosw_tpu.parallel.mesh import make_mesh, replicate, shard_batch

        mesh = mesh or make_mesh(("data",))
        if dp_windows % mesh.shape["data"] != 0:
            raise ValueError(
                f"dp_windows={dp_windows} must be a multiple of the data-mesh "
                f"size {mesh.shape['data']}"
            )
        params = replicate(mesh, params)
    opt_state = optimizer.init(params)

    stream = sample_windows(
        registry, sequences, rng, window, robot, round2_prob=round2_prob
    )
    start_step = 0
    if resume_path and os.path.exists(resume_path):
        # host tree first: start_step MUST come from numpy — a device
        # scalar fetch right after the checkpoint upload is the op that
        # wedged the tunnel 5/5 times (faulthandler: array.__int__ at this
        # line, 2026-08-19). Upload is grouped+drained (upload_pytree).
        tree = load_pytree(resume_path, device=False)
        start_step = int(tree["step"])
        log.info(f"restoring {resume_path} (host tree read, step {start_step})")
        params = upload_pytree(tree["params"])
        if use_dp:
            params = replicate(mesh, params)
        # Orbax round-trips optax NamedTuples as dicts; rebuild the typed
        # structure from a fresh template (same recipe as restore_agent)
        template = optimizer.init(params)
        opt_state = jax.tree.unflatten(
            jax.tree.structure(template), jax.tree.leaves(upload_pytree(tree["opt_state"]))
        )
        log.info("restore upload complete")
        t0 = time.monotonic()
        for _ in range(start_step * max(int(dp_windows), 1)):
            next(stream)  # host-only: replay the consumed batch draws
        log.info(
            f"resumed from {resume_path} at step {start_step} "
            f"(stream fast-forward {time.monotonic() - t0:.1f}s)"
        )

    loss_meter = AverageMeter()
    for step in range(start_step + 1, num_steps + 1):
        if use_dp:
            windows = [next(stream) for _ in range(dp_windows)]
            batch = {
                k: np.stack([win[k] for win in windows]) for k in windows[0]
            }
            device_batch = shard_batch(mesh, batch)
            params, opt_state, loss = vos_train_step_dp(
                params, opt_state, device_batch, optimizer, loss_fn
            )
        else:
            batch = next(stream)
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            params, opt_state, loss = vos_train_step(
                params, opt_state, device_batch, optimizer, loss_fn
            )
        loss_meter.update(float(loss))
        if step % 50 == 0 or step == 1:
            log.info(f"step {step}/{num_steps} loss {float(loss):.4f} ({loss_meter.avg:.4f})")
        if resume_path and step % save_every == 0 and step < num_steps:
            save_pytree(
                resume_path,
                {"params": params, "opt_state": opt_state, "step": step},
            )
        elif not resume_path and step % save_every == 0 and step < num_steps:
            save_pytree(
                os.path.join(cfg.ckpt_dir, f"{ckpt_name}.orbax"), {"params": params}
            )
    save_pytree(
        os.path.join(cfg.ckpt_dir, f"{ckpt_name}.orbax"), {"params": params}
    )
    if resume_path and os.path.exists(resume_path):
        shutil.rmtree(resume_path)
    return {"loss_avg": loss_meter.avg, "params": params}


def main(argv=None):
    import sys

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    argv = argv if argv is not None else sys.argv[1:]
    # run() knobs ride the same key=value surface but are not config fields
    run_keys = {
        "num_steps": int,
        "window": int,
        "lr": float,
        "save_every": int,
        "round2_prob": float,
        "dp_windows": int,
    }
    run_kwargs = {}
    cfg_overrides = []
    for a in argv:
        if "=" not in a:
            continue
        key, value = a.split("=", 1)
        if key in run_keys:
            run_kwargs[key] = run_keys[key](value)
        else:
            cfg_overrides.append(a)
    cfg = load_config("configs/config.yaml", cfg_overrides)
    return run(cfg, **run_kwargs)


if __name__ == "__main__":
    main()
