"""Visualization helpers: mask overlays, DAVIS palette, label conversion.

Capability parity with the reference's helper grab-bag
(``utils/utils_ipn.py:75-81`` To_np_label, ``:113-190`` checkerboard/overlay
visualisers) with a NumPy/PIL implementation.
"""

from __future__ import annotations

import os
import numpy as np

# standard DAVIS 2017 palette head (object ids 0..7)
DAVIS_PALETTE = np.array(
    [
        [0, 0, 0],
        [128, 0, 0],
        [0, 128, 0],
        [128, 128, 0],
        [0, 0, 128],
        [128, 0, 128],
        [0, 128, 128],
        [128, 128, 128],
    ],
    dtype=np.uint8,
)


def label_to_color(label: np.ndarray) -> np.ndarray:
    """[H, W] integer labels → [H, W, 3] uint8 palette colors."""
    label = np.asarray(label).astype(np.int64) % len(DAVIS_PALETTE)
    return DAVIS_PALETTE[label]


def overlay_mask(
    frame: np.ndarray, label: np.ndarray, alpha: float = 0.5
) -> np.ndarray:
    """Blend palette-colored labels over a frame.

    frame: [H, W, 3] float in [0,1] or uint8; label: [H, W] ints.
    Background (label 0) keeps the original pixels. Returns uint8.
    """
    img = np.asarray(frame)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    color = label_to_color(label)
    fg = (np.asarray(label) > 0)[..., None]
    blended = np.where(
        fg, (alpha * color + (1 - alpha) * img).astype(np.uint8), img
    )
    return blended


def overlay_scribbles(
    frame: np.ndarray, scribbles: dict, frame_idx: int, thickness: int = 2
) -> np.ndarray:
    """Draw scribble paths over a frame (uint8 output)."""
    from ivosw_tpu.data.scribbles import scribbles2mask

    img = np.asarray(frame)
    if img.dtype != np.uint8:
        img = np.clip(img * 255.0, 0, 255).astype(np.uint8)
    h, w = img.shape[:2]
    label = scribbles2mask(
        scribbles, (h, w), only_frame=frame_idx, thickness=thickness
    )
    drawn = label > 0
    out = img.copy()
    out[drawn] = label_to_color(np.where(label > 0, label, 0))[drawn]
    return out


def save_overlay_sequence(
    frames: np.ndarray, masks: np.ndarray, out_dir: str, alpha: float = 0.5
) -> None:
    """Dump overlay PNGs for a whole clip."""
    from PIL import Image

    os.makedirs(out_dir, exist_ok=True)
    for i in range(frames.shape[0]):
        Image.fromarray(overlay_mask(frames[i], masks[i], alpha)).save(
            os.path.join(out_dir, f"{i:05d}.png")
        )


def save_label_png(label: np.ndarray, path: str) -> None:
    """Save an integer label mask as a palettised PNG (DAVIS-style)."""
    from PIL import Image

    img = Image.fromarray(np.asarray(label, dtype=np.uint8), mode="P")
    img.putpalette(DAVIS_PALETTE.flatten().tolist() + [0] * (768 - DAVIS_PALETTE.size))
    img.save(path)
