"""AssessNet (QA model) trainer: masked MSE regression of per-frame J&F.

Capability parity with reference ``quality_assessment.py:205-323``: per
sample, the regression target is the J&F between the gt object label and the
binarised prob map (prob > 0.8); samples whose label∪mask is empty are
excluded from the loss; SGD(momentum 0.9, weight-decay 5e-4) with per-element
gradient clamp ±1 and ExponentialLR(γ = 0.95) per epoch; checkpoint every 10
epochs to ``weights/assess_net``.

Documented divergence: the reference never calls ``optimizer.zero_grad()``
in its loop (``quality_assessment.py:265-270``) so its gradients accumulate
across steps — a bug, not a feature. This implementation computes fresh
gradients per step (jax.grad is inherently zero-grad-correct).

TPU-native design: the whole step — AssessNet train-mode forward with BN stat
updates, the on-device J&F target (boundary F as convolutions,
:mod:`ivosw_tpu.ops.metrics_jax`), masked loss, grads, clip, SGD — is ONE
jitted program; augmentation stays on host (:mod:`ivosw_tpu.data.augment`).

CLI: ``python -m ivosw_tpu.train.train_assess [key=value ...]``
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivosw_tpu.core.config import Config, load_config
from ivosw_tpu.models.assess import assess_forward, init_assess_variables
from ivosw_tpu.ops.metrics_jax import batched_f_measure_jax, batched_jaccard_jax
from ivosw_tpu.utils.misc import AverageMeter, create_stream_logger, set_random_seed

MASK_TH = 0.8  # reference: masks = (probs > 0.8) (quality_assessment.py:244)


def make_assess_optimizer(momentum: float, weight_decay: float):
    """clip(±1) → +wd·param → momentum trace, torch-SGD semantics; the
    learning rate (with its exponential epoch decay) scales updates in the
    step so one optimizer state serves the whole schedule."""
    return optax.chain(
        optax.clip(1.0),
        optax.add_decayed_weights(weight_decay),
        optax.trace(decay=momentum, nesterov=False),
    )


def _target_metric(labels, masks, metric: str):
    """Per-sample J/F/J&F between binary label and binarised prob mask."""
    lab = labels.astype(jnp.int32)
    msk = masks.astype(jnp.int32)
    if metric == "J":
        return batched_jaccard_jax(lab, msk, nb_objects=1)[:, 0]
    if metric == "F":
        return batched_f_measure_jax(lab, msk, nb_objects=1)[:, 0]
    j = batched_jaccard_jax(lab, msk, nb_objects=1)[:, 0]
    f = batched_f_measure_jax(lab, msk, nb_objects=1)[:, 0]
    return 0.5 * j + 0.5 * f


@functools.partial(
    jax.jit,
    static_argnames=("optimizer", "metric"),
    donate_argnames=("variables", "opt_state"),
)
def assess_train_step(
    variables, opt_state, batch, lr, optimizer, metric: str = "J_AND_F"
):
    """One fused device step. batch: img [B,H,W,3], prob [B,H,W],
    label [B,H,W]. Returns (variables, opt_state, loss, diff, n_valid)."""
    labels = batch["label"]
    masks = (batch["prob"] > MASK_TH).astype(jnp.float32)
    target = jax.lax.stop_gradient(_target_metric(labels, masks, metric))
    union = jnp.sum(
        jnp.logical_or(labels > 0, masks > 0), axis=(-2, -1)
    ).astype(jnp.float32)
    valid = (union > 0).astype(jnp.float32)
    n_valid = jnp.maximum(valid.sum(), 1.0)

    def loss_fn(params):
        vars_in = {"params": params, "batch_stats": variables["batch_stats"]}
        pred, mutated = assess_forward(
            vars_in, batch["img"], batch["prob"], train=True
        )
        pred = pred[:, 0]
        per_sample = (pred - target) ** 2
        loss = jnp.sum(per_sample * valid) / n_valid
        diff = jnp.sum(jnp.abs(pred - target) * valid) / n_valid
        return loss, (mutated["batch_stats"], diff)

    (loss, (new_stats, diff)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        variables["params"]
    )
    new_updates, new_opt_state = optimizer.update(
        grads, opt_state, variables["params"]
    )
    # all-invalid batch: gradients are zero but the weight-decay term would
    # still mutate params and the momentum trace — gate both so excluded
    # batches truly leave the optimisation state untouched (the reference
    # skips such batches entirely, quality_assessment.py:263)
    gate = (valid.sum() > 0).astype(jnp.float32)
    updates = jax.tree.map(lambda u: -lr * gate * u, new_updates)
    opt_state = jax.tree.map(
        lambda new, old: gate * new + (1.0 - gate) * old, new_opt_state, opt_state
    )
    params = optax.apply_updates(variables["params"], updates)
    return (
        {"params": params, "batch_stats": new_stats},
        opt_state,
        loss,
        diff,
        valid.sum(),
    )


def run(
    cfg: Config,
    registry=None,
    save_result_dir: str = os.path.join("data", "quality_assessment"),
    variables=None,
    num_epochs: Optional[int] = None,
    log=None,
    resume_path: Optional[str] = None,
    save_every: int = 200,
):
    """``resume_path`` mirrors :func:`ivosw_tpu.train.train_vos.run`'s
    mid-train snapshot/resume: a {variables, opt_state, epoch, step} tree is
    saved there every ``save_every`` steps and removed on completion; if it
    already exists, training resumes from it — the epoch's batch permutation
    is re-drawn identically and the consumed prefix skipped without loading
    (``QARegressionDataset.batches(skip=...)``). The augmentation rng is NOT
    replayed across the skipped prefix (additive_noise alone draws an
    image-sized tensor per sample — replaying would cost as much as
    loading), so a resumed run sees the same samples in the same order under
    fresh augmentation draws; training equivalence, not bit-equality. Needed because this image's
    tunnel client leaks host memory per transfer (CLAUDE.md): an HD-tier
    epoch sequence outlives the host's RAM, so the stage is OOM-killed and
    MUST continue across process restarts rather than restart at epoch 1."""
    import shutil

    from ivosw_tpu.data.augment import QAAugmentPipeline
    from ivosw_tpu.data.qa_dataset import QARegressionDataset
    from ivosw_tpu.data.registry import registry_from_config
    from ivosw_tpu.utils.checkpoint import (
        load_pytree,
        save_assess_checkpoint,
        save_pytree,
        upload_pytree,
    )

    log = log or create_stream_logger("train_assess")
    set_random_seed(cfg.seed)
    registry = registry or registry_from_config(cfg)
    a = cfg.assess_net
    num_epochs = num_epochs or a.num_epochs

    if variables is None:
        if a.imagenet_ckpt:
            from ivosw_tpu.utils.torch_import import init_assess_from_imagenet

            variables = init_assess_from_imagenet(a.imagenet_ckpt, seed=cfg.seed)
            if variables is None:
                raise FileNotFoundError(
                    f"assess_net.imagenet_ckpt={a.imagenet_ckpt!r} is not a "
                    "readable torchvision resnet50 state_dict"
                )
            log.info(f"AssessNet trunk initialised from {a.imagenet_ckpt}")
        else:
            variables = init_assess_variables(jax.random.PRNGKey(cfg.seed))
    optimizer = make_assess_optimizer(a.momentum, a.weight_decay)
    opt_state = optimizer.init(variables["params"])

    start_epoch, start_step = 1, 0
    if resume_path and os.path.exists(resume_path):
        # host tree first; start indices MUST come from numpy — a device
        # scalar fetch right after a checkpoint upload is the op that
        # wedged the tunnel 5/5 times (train_vos.py, 2026-08-19)
        tree = load_pytree(resume_path, device=False)
        start_epoch = int(tree["epoch"])
        start_step = int(tree["step"])
        log.info(
            f"restoring {resume_path} (host tree read, "
            f"epoch {start_epoch} step {start_step})"
        )
        variables = upload_pytree(tree["variables"])
        # Orbax round-trips optax NamedTuples as dicts; rebuild the typed
        # structure from a fresh template (same recipe as train_vos)
        template = optimizer.init(variables["params"])
        opt_state = jax.tree.unflatten(
            jax.tree.structure(template),
            jax.tree.leaves(upload_pytree(tree["opt_state"])),
        )
        log.info("restore upload complete")

    metric = cfg.davis_interactive.metric
    # resize target follows the data: the reference's fixed Resize(854x480)
    # (quality_assessment.py:216) is an identity on DAVIS; on other-sized
    # registries a fixed 480p target would upsample every sample ~100x
    # (measured: 9 s steps and multi-GB host batches on 64x48 demo clips)
    sizes = [info.image_size for info in registry.sequences.values()]
    size_wh = max(set(sizes), key=sizes.count) if sizes else (854, 480)
    loss_meter = AverageMeter()
    for epoch in range(start_epoch, num_epochs + 1):
        lr = a.lr * (a.gamma ** (epoch - 1))  # ExponentialLR
        transform = QAAugmentPipeline(size_wh=size_wh, seed=cfg.seed + epoch)
        dataset = QARegressionDataset(
            registry, save_result_dir, transform=transform, seed=cfg.seed + epoch
        )
        epoch_loss = AverageMeter()
        skip = start_step if epoch == start_epoch else 0
        for i, batch in enumerate(
            dataset.batches(a.train_batch_size, skip=skip), start=skip
        ):
            device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
            variables, opt_state, loss, diff, n_valid = assess_train_step(
                variables, opt_state, device_batch, jnp.float32(lr), optimizer, metric
            )
            if resume_path and (i + 1) % save_every == 0:
                save_pytree(
                    resume_path,
                    {
                        "variables": variables,
                        "opt_state": opt_state,
                        "epoch": epoch,
                        "step": i + 1,
                    },
                )
            if float(n_valid) == 0:
                continue
            loss_meter.update(float(loss))
            epoch_loss.update(float(loss))
            log.info(
                f"Epoch [{epoch}/{num_epochs}][{i}] loss:{float(loss):.4f} "
                f"diff:{float(diff):.4f} lr:{lr:.2e}"
            )
        log.info(f"* Epoch {epoch}: loss {epoch_loss.avg:.6f}")
        if resume_path and epoch < num_epochs:
            # epoch boundary: next process restart begins the next epoch
            save_pytree(
                resume_path,
                {
                    "variables": variables,
                    "opt_state": opt_state,
                    "epoch": epoch + 1,
                    "step": 0,
                },
            )
        if epoch % 10 == 0 or epoch == num_epochs:
            save_assess_checkpoint(variables, cfg.ckpt_dir)
    if resume_path and os.path.exists(resume_path):
        shutil.rmtree(resume_path)
    return {"loss_avg": loss_meter.avg, "variables": variables}


def main(argv=None):
    import sys

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    argv = argv if argv is not None else sys.argv[1:]
    cfg = load_config("configs/config.yaml", [a for a in argv if "=" in a])
    return run(cfg)


if __name__ == "__main__":
    main()
