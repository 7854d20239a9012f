"""AssessNet pretext pretraining on synthetic mask degradations.

The reference's wild setting works because its AssessNet sits on an
ImageNet-pretrained ResNet-50 (reference ``models/assessment.py:30-39``) —
no such checkpoint exists in this environment, and QA regression trained
only on interactive-session dumps plateaus (held-out corr ~0.7: the
oracle/worst policies produce a NARROW error distribution, so the regressor
sees few (mask-error → J&F) modes regardless of dump volume).

This trainer widens the distribution without any interactive session: for a
random (clip, frame, object) from the generator pool it fabricates a
degraded mask with a KNOWN quality — random shift, erosion/dilation,
whole-object miss, random-blob false positives, partial drops — and
regresses AssessNet onto the true J&F of that degradation. Infinite labelled
pairs at generator cost; the real-dump fine-tune (train_assess) then
re-anchors the net on the genuine backbone-error distribution.

Usage: ``python -m ivosw_tpu.train.pretrain_assess [key=value ...]`` or
programmatically ``run(cfg, registry=pool, num_steps=...)`` →
``{ckpt_dir}/assess_pretext.orbax`` (also returned), which
``train_assess.run(variables=...)`` consumes as its init.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ivosw_tpu.core.config import Config, load_config
from ivosw_tpu.models.assess import init_assess_variables
from ivosw_tpu.train.train_assess import assess_train_step, make_assess_optimizer
from ivosw_tpu.utils.misc import AverageMeter, create_stream_logger, set_random_seed


def degrade_mask(mask: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """One plausible wrong prediction for a binary mask [H, W] → prob map.

    The degradation family spans the quality axis end to end: identity-ish
    (high J&F) through shifts/morphology (mid) to misses and spurious blobs
    (low) — the spread the session dumps lack."""
    import cv2

    h, w = mask.shape
    prob = mask.astype(np.float32)
    kern = np.ones((3, 3), np.uint8)
    mode = rng.random()
    if mode < 0.08:  # total miss
        prob = np.zeros_like(prob)
    elif mode < 0.16:  # hallucination elsewhere: random blob, object gone
        prob = np.zeros_like(prob)
        by, bx = int(rng.integers(0, h)), int(rng.integers(0, w))
        r = int(rng.integers(h // 8, h // 3))
        yy, xx = np.ogrid[:h, :w]
        prob[(yy - by) ** 2 + (xx - bx) ** 2 < r * r] = 1.0
    else:
        if rng.random() < 0.8:  # shift
            max_shift = max(2, h // rng.integers(6, 24))
            dy, dx = rng.integers(-max_shift, max_shift + 1, size=2)
            prob = np.roll(prob, (int(dy), int(dx)), axis=(0, 1))
        iters = int(rng.integers(0, 4))
        if iters:
            op = cv2.erode if rng.random() < 0.5 else cv2.dilate
            prob = op(prob.astype(np.uint8), kern, iterations=iters).astype(
                np.float32
            )
        if rng.random() < 0.3:  # partial drop: zero a random half-plane strip
            if rng.random() < 0.5:
                cut = int(rng.integers(0, h))
                prob[:cut] = 0.0
            else:
                cut = int(rng.integers(0, w))
                prob[:, cut:] = 0.0
        if rng.random() < 0.4:  # false-positive blob
            by, bx = int(rng.integers(0, h)), int(rng.integers(0, w))
            r = int(rng.integers(2, max(3, h // 6)))
            yy, xx = np.ogrid[:h, :w]
            prob[(yy - by) ** 2 + (xx - bx) ** 2 < r * r] = 1.0
    conf = 0.82 + 0.17 * rng.random()  # above train_assess.MASK_TH
    return prob * conf


def sample_batches(
    registry, sequences, rng: np.random.Generator, batch_size: int
) -> Iterator[dict]:
    """Infinite {img, prob, label} batches of synthetic degradations."""
    while True:
        imgs, probs, labels = [], [], []
        while len(imgs) < batch_size:
            seq = sequences[int(rng.integers(len(sequences)))]
            frames = registry.load_images(seq)
            anns = registry.load_annotations(seq)
            t = int(rng.integers(frames.shape[0]))
            n_obj = int(anns.max())
            if n_obj == 0:
                continue
            obj = int(rng.integers(1, n_obj + 1))
            label = (anns[t] == obj).astype(np.float32)
            if label.sum() == 0:
                continue
            imgs.append(frames[t].astype(np.float32))
            probs.append(degrade_mask(label, rng))
            labels.append(label)
        yield {
            "img": np.stack(imgs),
            "prob": np.stack(probs),
            "label": np.stack(labels),
        }


def run(
    cfg: Config,
    registry=None,
    num_steps: int = 1500,
    batch_size: Optional[int] = None,
    variables=None,
    log=None,
):
    from ivosw_tpu.data.registry import registry_from_config
    from ivosw_tpu.utils.checkpoint import save_pytree

    log = log or create_stream_logger("pretrain_assess")
    rng = set_random_seed(cfg.seed)
    registry = registry or registry_from_config(cfg)
    sequences = registry.subset(cfg.data.subset)
    a = cfg.assess_net
    batch_size = batch_size or a.train_batch_size

    if variables is None:
        variables = init_assess_variables(jax.random.PRNGKey(cfg.seed))
    optimizer = make_assess_optimizer(a.momentum, a.weight_decay)
    opt_state = optimizer.init(variables["params"])

    metric = cfg.davis_interactive.metric
    stream = sample_batches(registry, sequences, rng, batch_size)
    loss_meter = AverageMeter()
    for step in range(1, num_steps + 1):
        batch = next(stream)
        device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        variables, opt_state, loss, diff, n_valid = assess_train_step(
            variables, opt_state, device_batch, jnp.float32(a.lr), optimizer, metric
        )
        loss_meter.update(float(loss))
        if step % 50 == 0 or step == 1:
            log.info(
                f"step {step}/{num_steps} loss {float(loss):.4f} "
                f"({loss_meter.avg:.4f}) diff {float(diff):.4f}"
            )
    out = os.path.join(cfg.ckpt_dir, "assess_pretext.orbax")
    save_pytree(out, variables)
    log.info(f"pretext variables saved to {out}")
    return {"loss_avg": loss_meter.avg, "variables": variables}


def main(argv=None):
    import sys

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    argv = argv if argv is not None else sys.argv[1:]
    run_keys = {"num_steps": int, "batch_size": int}
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
