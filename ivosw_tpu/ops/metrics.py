"""Segmentation quality metrics: batched Jaccard (J) and boundary F-measure.

The reference consumes these from the external ``davisinteractive`` package
(``utils/misc.py:8,118-162``). This framework implements them natively with
DAVIS-benchmark semantics:

- J per (frame, object): |pred ∩ gt| / |pred ∪ gt|, with empty-∪-empty = 1.
- F per (frame, object): boundary precision/recall where boundaries are
  1-pixel maps (seg2bmap semantics) matched within a tolerance radius
  ``ceil(0.008 * ||(H, W)||)`` via disk dilation.

Host (NumPy/cv2) implementation here; a jit-compiled XLA implementation with
identical semantics lives in :mod:`ivosw_tpu.ops.metrics_jax` (parity-tested).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "batched_jaccard",
    "batched_f_measure",
    "sequence_metric",
    "auc_from_curve",
    "seg2bmap",
    "disk_kernel",
]


def disk_kernel(radius: int) -> np.ndarray:
    """Boolean disk structuring element of the given radius (skimage.disk)."""
    r = int(radius)
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    return (x * x + y * y <= r * r).astype(np.uint8)


def seg2bmap(seg: np.ndarray) -> np.ndarray:
    """1-pixel-wide boundary map of a binary segmentation (DAVIS semantics).

    A pixel is boundary if it differs from its east, south, or south-east
    neighbour; the last row/column compare against east/south only.
    """
    seg = seg.astype(bool)
    e = np.zeros_like(seg)
    s = np.zeros_like(seg)
    se = np.zeros_like(seg)
    e[:, :-1] = seg[:, 1:]
    s[:-1, :] = seg[1:, :]
    se[:-1, :-1] = seg[1:, 1:]

    b = (seg ^ e) | (seg ^ s) | (seg ^ se)
    b[-1, :] = seg[-1, :] ^ e[-1, :]
    b[:, -1] = seg[:, -1] ^ s[:, -1]
    b[-1, -1] = False
    return b


def _binary_dilate(mask: np.ndarray, kernel: np.ndarray) -> np.ndarray:
    try:
        import cv2

        return cv2.dilate(mask.astype(np.uint8), kernel).astype(bool)
    except ImportError:  # pure-NumPy fallback
        r = kernel.shape[0] // 2
        padded = np.pad(mask.astype(np.uint8), r)
        out = np.zeros_like(mask, dtype=bool)
        ys, xs = np.nonzero(kernel)
        for dy, dx in zip(ys, xs):
            out |= padded[dy : dy + mask.shape[0], dx : dx + mask.shape[1]].astype(
                bool
            )
        return out


def f_measure_single(
    pred_mask: np.ndarray, gt_mask: np.ndarray, bound_th: float = 0.008
) -> float:
    """Boundary F-measure of one binary (pred, gt) pair."""
    bound_pix = (
        bound_th
        if bound_th >= 1
        else int(np.ceil(bound_th * np.linalg.norm(pred_mask.shape)))
    )
    fg_boundary = seg2bmap(pred_mask)
    gt_boundary = seg2bmap(gt_mask)

    kernel = disk_kernel(bound_pix)
    fg_dil = _binary_dilate(fg_boundary, kernel)
    gt_dil = _binary_dilate(gt_boundary, kernel)

    gt_match = gt_boundary & fg_dil
    fg_match = fg_boundary & gt_dil

    n_fg = fg_boundary.sum()
    n_gt = gt_boundary.sum()

    if n_fg == 0 and n_gt > 0:
        precision, recall = 1.0, 0.0
    elif n_fg > 0 and n_gt == 0:
        precision, recall = 0.0, 1.0
    elif n_fg == 0 and n_gt == 0:
        precision, recall = 1.0, 1.0
    else:
        precision = fg_match.sum() / float(n_fg)
        recall = gt_match.sum() / float(n_gt)

    if precision + recall == 0:
        return 0.0
    return 2.0 * precision * recall / (precision + recall)


def _prefer_native() -> bool:
    """'auto' policy: the C++/OpenMP path wins when it can parallelise the
    (frame, object) batch or when cv2's SIMD dilate isn't available; on a
    single core with cv2 present, the NumPy/cv2 path is faster (measured)."""
    import os

    try:
        import cv2  # noqa: F401

        has_cv2 = True
    except ImportError:
        has_cv2 = False
    return (not has_cv2) or (os.cpu_count() or 1) >= 4


def _check_inputs(y_true, y_pred, nb_objects):
    y_true = np.asarray(y_true)
    y_pred = np.asarray(y_pred)
    if y_true.shape != y_pred.shape:
        raise ValueError(
            f"shape mismatch: gt {y_true.shape} vs pred {y_pred.shape}"
        )
    if y_true.ndim != 3:
        raise ValueError(f"expected [T, H, W] label masks, got {y_true.shape}")
    if nb_objects is None:
        nb_objects = int(max(y_true.max(), 1))
    return y_true, y_pred, int(nb_objects)


def batched_jaccard(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    average_over_objects: bool = True,
    nb_objects: int | None = None,
    backend: str = "auto",
) -> np.ndarray:
    """Per-frame Jaccard over object ids 1..nb_objects.

    Returns [T] if averaged over objects else [T, nb_objects]. backend:
    'auto' uses the C++/OpenMP library when it builds, else pure NumPy.
    """
    y_true, y_pred, nb_objects = _check_inputs(y_true, y_pred, nb_objects)
    if backend == "native" or (backend == "auto" and _prefer_native()):
        from ivosw_tpu.ops import metrics_native as mn

        if mn.available():
            jac = mn.batched_jaccard_native(y_true, y_pred, nb_objects)
            return jac.mean(axis=1) if average_over_objects else jac
        if backend == "native":
            raise RuntimeError("native metrics library unavailable")
    T = y_true.shape[0]
    jac = np.empty((T, nb_objects), dtype=np.float64)
    for t in range(T):
        for j in range(nb_objects):
            obj_id = j + 1
            mask_true = y_true[t] == obj_id
            mask_pred = y_pred[t] == obj_id
            union = np.count_nonzero(mask_true | mask_pred)
            inter = np.count_nonzero(mask_true & mask_pred)
            jac[t, j] = 1.0 if union == 0 else inter / union
    if average_over_objects:
        return jac.mean(axis=1)
    return jac


def batched_f_measure(
    y_true: np.ndarray,
    y_pred: np.ndarray,
    average_over_objects: bool = True,
    nb_objects: int | None = None,
    bound_th: float = 0.008,
    backend: str = "auto",
) -> np.ndarray:
    """Per-frame boundary F-measure over object ids 1..nb_objects.

    backend 'auto': the C++/OpenMP exact-EDT implementation when available
    (the host-side hot path of every interactive round), else NumPy/cv2.
    """
    y_true, y_pred, nb_objects = _check_inputs(y_true, y_pred, nb_objects)
    if backend == "native" or (backend == "auto" and _prefer_native()):
        from ivosw_tpu.ops import metrics_native as mn

        if mn.available():
            f = mn.batched_f_measure_native(y_true, y_pred, nb_objects, bound_th)
            return f.mean(axis=1) if average_over_objects else f
        if backend == "native":
            raise RuntimeError("native metrics library unavailable")
    T = y_true.shape[0]
    f = np.empty((T, nb_objects), dtype=np.float64)
    for t in range(T):
        for j in range(nb_objects):
            obj_id = j + 1
            f[t, j] = f_measure_single(
                y_pred[t] == obj_id, y_true[t] == obj_id, bound_th=bound_th
            )
    if average_over_objects:
        return f.mean(axis=1)
    return f


def sequence_metric(
    metric_to_optimize: str,
    gt_masks: np.ndarray,
    pred_masks: np.ndarray,
    nb_objects: int,
    average_over_objects: bool = True,
    convert_to_single_obj: bool = False,
) -> np.ndarray:
    """Per-frame J / F / J&F curve (reference utils/misc.py:118-162)."""
    if convert_to_single_obj:
        gt_masks = np.where(gt_masks > 0, 1, 0)
        pred_masks = np.where(pred_masks > 0, 1, 0)
        nb_objects = 1

    if metric_to_optimize == "J":
        return batched_jaccard(
            gt_masks, pred_masks, average_over_objects, nb_objects
        )
    if metric_to_optimize == "F":
        return batched_f_measure(
            gt_masks, pred_masks, average_over_objects, nb_objects
        )
    if metric_to_optimize == "J_AND_F":
        jac = batched_jaccard(
            gt_masks, pred_masks, average_over_objects, nb_objects
        )
        con = batched_f_measure(
            gt_masks, pred_masks, average_over_objects, nb_objects
        )
        return 0.5 * jac + 0.5 * con
    raise NotImplementedError(metric_to_optimize)


def auc_from_curve(curve) -> float:
    """AUC of the quality-vs-round curve (reference eval_agent_atnet.py:352-353):
    trapezoid over the first len-? points, normalised by (n-1)."""
    curve = np.asarray(curve, dtype=np.float64)
    if len(curve) < 2:
        return float(curve.mean()) if len(curve) else 0.0
    return float(np.trapezoid(curve) / (len(curve) - 1))
