"""XLA-native batched J/F metrics.

Same semantics as :mod:`ivosw_tpu.ops.metrics` (parity-tested) but expressed
as one jit-compiled device program batched over frames × objects:

- boundary extraction is a set of shifted XORs (VPU elementwise ops),
- the disk-tolerance dilation is a single convolution with a static disk
  kernel (maps onto the MXU / fused window reduction),
- Jaccard is two masked reductions.

Used for on-device reward/quality computation inside training steps, where a
host round-trip per frame would stall the pipeline. Host code paths use the
NumPy implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ivosw_tpu.ops.metrics import disk_kernel


def _boundary_map(seg: jnp.ndarray) -> jnp.ndarray:
    """seg2bmap semantics on a [..., H, W] boolean mask (see ops.metrics)."""
    seg = seg.astype(bool)
    e = jnp.concatenate([seg[..., :, 1:], seg[..., :, -1:]], axis=-1)
    s = jnp.concatenate([seg[..., 1:, :], seg[..., -1:, :]], axis=-2)
    se_row = jnp.concatenate([seg[..., 1:, 1:], seg[..., 1:, -1:]], axis=-1)
    se = jnp.concatenate([se_row, jnp.zeros_like(seg[..., -1:, :])], axis=-2)

    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    # last row/col: east/south comparisons only; corner is never boundary
    b_last_row = seg[..., -1:, :] ^ e[..., -1:, :]
    b = jnp.concatenate([b[..., :-1, :], b_last_row], axis=-2)
    b_last_col = seg[..., :, -1:] ^ s[..., :, -1:]
    b = jnp.concatenate([b[..., :, :-1], b_last_col], axis=-1)
    corner = jnp.zeros_like(b[..., -1:, -1:])
    last_row = jnp.concatenate([b[..., -1:, :-1], corner], axis=-1)
    b = jnp.concatenate([b[..., :-1, :], last_row], axis=-2)
    return b


def _dilate(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Binary dilation of [N, H, W] masks with a static [k, k] kernel."""
    n, h, w = mask.shape
    k = kernel.shape[0]
    x = mask.astype(jnp.float32)[:, None]  # N,1,H,W
    kern = jnp.asarray(kernel, dtype=jnp.float32)[None, None]  # 1,1,k,k
    y = jax.lax.conv_general_dilated(
        x,
        kern,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return (y[:, 0] > 0.5)


@functools.partial(jax.jit, static_argnames=("nb_objects",))
def batched_jaccard_jax(
    y_true: jnp.ndarray, y_pred: jnp.ndarray, nb_objects: int
) -> jnp.ndarray:
    """Per-frame, per-object Jaccard on device. Returns [T, nb_objects]."""
    obj_ids = jnp.arange(1, nb_objects + 1)

    def per_obj(obj_id):
        mt = y_true == obj_id
        mp = y_pred == obj_id
        inter = jnp.sum(mt & mp, axis=(-2, -1)).astype(jnp.float32)
        union = jnp.sum(mt | mp, axis=(-2, -1)).astype(jnp.float32)
        return jnp.where(union == 0, 1.0, inter / jnp.maximum(union, 1.0))

    return jax.vmap(per_obj)(obj_ids).T  # [T, O]


def _f_measure_flat(pred_b, gt_b, kernel):
    """pred_b/gt_b: [N, H, W] binary masks → [N] boundary F."""
    fg_boundary = _boundary_map(pred_b)
    gt_boundary = _boundary_map(gt_b)
    fg_dil = _dilate(fg_boundary, kernel)
    gt_dil = _dilate(gt_boundary, kernel)

    gt_match = jnp.sum(gt_boundary & fg_dil, axis=(-2, -1)).astype(jnp.float32)
    fg_match = jnp.sum(fg_boundary & gt_dil, axis=(-2, -1)).astype(jnp.float32)
    n_fg = jnp.sum(fg_boundary, axis=(-2, -1)).astype(jnp.float32)
    n_gt = jnp.sum(gt_boundary, axis=(-2, -1)).astype(jnp.float32)

    precision = jnp.where(
        n_fg == 0, jnp.where(n_gt > 0, 1.0, 1.0), fg_match / jnp.maximum(n_fg, 1.0)
    )
    precision = jnp.where((n_fg > 0) & (n_gt == 0), 0.0, precision)
    recall = jnp.where(
        n_gt == 0, jnp.where(n_fg > 0, 1.0, 1.0), gt_match / jnp.maximum(n_gt, 1.0)
    )
    recall = jnp.where((n_gt > 0) & (n_fg == 0), 0.0, recall)

    denom = precision + recall
    return jnp.where(denom == 0, 0.0, 2.0 * precision * recall / jnp.maximum(denom, 1e-12))


@functools.partial(jax.jit, static_argnames=("nb_objects", "bound_th"))
def batched_f_measure_jax(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    nb_objects: int,
    bound_th: float = 0.008,
) -> jnp.ndarray:
    """Per-frame, per-object boundary F on device. Returns [T, nb_objects]."""
    h, w = y_true.shape[-2:]
    bound_pix = (
        int(bound_th)
        if bound_th >= 1
        else int(np.ceil(bound_th * np.hypot(h, w)))
    )
    kernel = disk_kernel(bound_pix)

    T = y_true.shape[0]
    obj_ids = jnp.arange(1, nb_objects + 1)
    # flatten T x O into one batch for a single conv dispatch
    gt_b = (y_true[:, None] == obj_ids[None, :, None, None]).reshape(
        T * nb_objects, h, w
    )
    pr_b = (y_pred[:, None] == obj_ids[None, :, None, None]).reshape(
        T * nb_objects, h, w
    )
    f = _f_measure_flat(pr_b, gt_b, kernel)
    return f.reshape(T, nb_objects)


def sequence_metric_jax(
    metric_to_optimize: str,
    gt_masks: jnp.ndarray,
    pred_masks: jnp.ndarray,
    nb_objects: int,
) -> jnp.ndarray:
    """Per-frame metric curve, averaged over objects. Returns [T]."""
    if metric_to_optimize == "J":
        return batched_jaccard_jax(gt_masks, pred_masks, nb_objects).mean(axis=1)
    if metric_to_optimize == "F":
        return batched_f_measure_jax(gt_masks, pred_masks, nb_objects).mean(axis=1)
    if metric_to_optimize == "J_AND_F":
        j = batched_jaccard_jax(gt_masks, pred_masks, nb_objects).mean(axis=1)
        f = batched_f_measure_jax(gt_masks, pred_masks, nb_objects).mean(axis=1)
        return 0.5 * j + 0.5 * f
    raise NotImplementedError(metric_to_optimize)
