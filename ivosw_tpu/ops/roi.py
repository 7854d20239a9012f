"""Device-side ROI geometry for mask-quality assessment.

Capability parity with the reference AssessNet preprocessing
(``models/assessment.py:75-161``): mask → (y, x, h, w) box with a minimum
128 px side, 1.5× context expansion clamped to ±5 px beyond the image, then a
256×256 bilinear ROI crop with align_corners=True / zeros-padding semantics.

TPU-native design — two deliberate departures from the reference mechanics:

1. The reference computes the bbox on HOST (``all2yxhw`` does
   ``.cpu().numpy()`` + a per-item ``np.where`` loop), forcing a
   device→host→device bounce inside every forward. Here the bbox is two
   masked min/max reductions on device (:func:`mask_to_yxhw`), so the whole
   scoring pass stays on-chip.

2. The affine grid_sample is axis-aligned (no rotation/shear), so bilinear
   sampling is SEPARABLE: build per-sample 1-D interpolation matrices
   Ry [256, H] and Rx [256, W] (≤2 nonzeros per row, materialised dense) and
   compute ``crop = Ry @ img @ Rxᵀ``. That turns a scatter/gather into two
   batched matmuls that run on the MXU (:func:`roi_crop`). Out-of-range rows
   are all-zero, which reproduces grid_sample's zeros padding exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mask_to_yxhw(mask: jnp.ndarray, scale: float = 1.5, min_side: float = 128.0):
    """Batched mask → (y, x, h, w) ROI boxes, on device.

    mask: [B, H, W] (values ≥ 0.49 are foreground, reference threshold), or
    an already-thresholded bool mask — callers that binarise with their own
    comparison (``probs > 0.5`` in score_clip) pass the bool directly so the
    bbox reductions read 1 byte/px instead of a materialised f32 plane
    (4 bytes/px × T·O·H·W is real HBM traffic at DAVIS scale).
    Returns [B, 4] float32. Empty masks fall back to the whole image
    (ymin=0, ymax=H — the reference uses the exclusive extent there).
    """
    b, h, w = mask.shape
    fg = mask if mask.dtype == jnp.bool_ else mask >= 0.49
    rows = jnp.any(fg, axis=2)  # [B, H]
    cols = jnp.any(fg, axis=1)  # [B, W]
    any_fg = jnp.any(rows, axis=1)  # [B]

    row_idx = jnp.arange(h, dtype=jnp.float32)
    col_idx = jnp.arange(w, dtype=jnp.float32)

    big = jnp.float32(1e9)
    ymin = jnp.min(jnp.where(rows, row_idx, big), axis=1)
    ymax = jnp.max(jnp.where(rows, row_idx, -big), axis=1)
    xmin = jnp.min(jnp.where(cols, col_idx, big), axis=1)
    xmax = jnp.max(jnp.where(cols, col_idx, -big), axis=1)

    # empty mask => whole image (reference: ymax = H, xmax = W)
    ymin = jnp.where(any_fg, ymin, 0.0)
    ymax = jnp.where(any_fg, ymax, jnp.float32(h))
    xmin = jnp.where(any_fg, xmin, 0.0)
    xmax = jnp.where(any_fg, xmax, jnp.float32(w))

    # enforce minimum box side (reference: int(res/2) truncation on each end)
    def expand(lo, hi):
        res = min_side - (hi - lo)
        half = jnp.floor(res / 2.0)
        lo2 = jnp.where(res > 0, lo - half, lo)
        hi2 = jnp.where(res > 0, hi + half, hi)
        return lo2, hi2

    ymin, ymax = expand(ymin, ymax)
    xmin, xmax = expand(xmin, xmax)

    # context expansion, clamped to ±5 px beyond the image
    orig_h = ymax - ymin + 1.0
    orig_w = xmax - xmin + 1.0
    grow = (scale - 1.0) / 2.0
    ymin = jnp.maximum(-5.0, ymin - grow * orig_h)
    ymax = jnp.minimum(jnp.float32(h) + 5.0, ymax + grow * orig_h)
    xmin = jnp.maximum(-5.0, xmin - grow * orig_w)
    xmax = jnp.minimum(jnp.float32(w) + 5.0, xmax + grow * orig_w)

    y = (ymax + ymin) / 2.0
    x = (xmax + xmin) / 2.0
    hh = ymax - ymin + 1.0
    ww = xmax - xmin + 1.0
    return jnp.stack([y, x, hh, ww], axis=1)


def yxhw_to_minmax(yxhw: jnp.ndarray, scale: float = 1.0):
    """(y, x, h, w) → (ymin, ymax, xmin, xmax), as get_ROI_grid does."""
    ry, rx, rh, rw = yxhw[:, 0], yxhw[:, 1], scale * yxhw[:, 2], scale * yxhw[:, 3]
    return ry - rh / 2.0, ry + rh / 2.0, rx - rw / 2.0, rx + rw / 2.0


def _interp_matrix(lo: jnp.ndarray, hi: jnp.ndarray, src_len: int, dst_len: int):
    """Per-sample 1-D bilinear sampling matrix R [B, dst, src].

    Sample coordinates follow align_corners=True affine-grid semantics:
    coord(i) = lo + (hi - lo) · i/(dst-1). Each row holds the two bilinear
    taps hat(1 - |coord - s|); coordinates outside [-1, src] produce all-zero
    rows — identical to grid_sample's zeros padding.
    """
    steps = jnp.arange(dst_len, dtype=jnp.float32) / (dst_len - 1)
    coords = lo[:, None] + (hi - lo)[:, None] * steps[None, :]  # [B, dst]
    src = jnp.arange(src_len, dtype=jnp.float32)  # [src]
    return jnp.maximum(0.0, 1.0 - jnp.abs(coords[:, :, None] - src[None, None, :]))


def roi_crop(
    images: jnp.ndarray,
    yxhw: jnp.ndarray,
    out_size: int = 256,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Batched separable bilinear ROI crop. images: [B, H, W, C] → [B, s, s, C].

    Equivalent to F.affine_grid(theta) + F.grid_sample(align_corners=True,
    padding_mode='zeros') for the axis-aligned theta of
    ``models/assessment.py:75-108``, but expressed as two MXU matmuls.
    """
    b, h, w, c = images.shape
    ymin, ymax, xmin, xmax = yxhw_to_minmax(yxhw)
    ry = _interp_matrix(ymin, ymax, h, out_size).astype(dtype)  # [B, s, H]
    rx = _interp_matrix(xmin, xmax, w, out_size).astype(dtype)  # [B, s, W]
    img = images.astype(dtype)
    # float32 inputs keep full-precision MXU accumulation (the TPU default
    # would silently drop to bf16 multiplicands); an explicit bf16 dtype is
    # the caller's opt-in fast path.
    precision = (
        jax.lax.Precision.HIGHEST if dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    # [B,s,H] @ [B,H,W*C] -> [B,s,W,C]; then contract W with Rx
    tmp = jnp.einsum(
        "bsh,bhwc->bswc", ry, img, precision=precision, preferred_element_type=dtype
    )
    out = jnp.einsum(
        "btw,bswc->bstc", rx, tmp, precision=precision, preferred_element_type=dtype
    )
    return out


def roi_theta(yxhw: jnp.ndarray, src_size, scale: float = 1.0) -> jnp.ndarray:
    """Normalised affine theta [B, 2, 3] (parity with get_ROI_grid's theta)."""
    h, w = src_size
    ymin, ymax, xmin, xmax = yxhw_to_minmax(yxhw, scale)
    b = yxhw.shape[0]
    theta = jnp.zeros((b, 2, 3), dtype=jnp.float32)
    theta = theta.at[:, 0, 0].set((xmax - xmin) / (w - 1))
    theta = theta.at[:, 0, 2].set((xmin + xmax - (w - 1)) / (w - 1))
    theta = theta.at[:, 1, 1].set((ymax - ymin) / (h - 1))
    theta = theta.at[:, 1, 2].set((ymin + ymax - (h - 1)) / (h - 1))
    return theta
