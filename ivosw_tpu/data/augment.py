"""QA training augmentations (host-side, NumPy/cv2).

Capability parity with the reference pipeline
(``quality_assessment.py:216-223`` composing
``datasets/transforms_assess.py``): Resize(854×480) → RandomAffine
(crop 0–10 %, scale 0.9–1.1, shear ±15°, rotate ±25°, retried ≤10× until
every object label survives) → AdditiveNoise(±5/255) →
RandomContrast(×[0.97, 1.03]) → RandomHorizontalFlip.

The reference uses imgaug (not available here); the same geometric transform
is a single cv2.warpAffine with a composed 2×3 matrix shared between image,
prob map and label (nearest for labels, bilinear otherwise). Augmentation
stays on host CPU — it feeds the device train step asynchronously, which is
the right split on TPU (device does convs, host does data bending).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict

import numpy as np


def resize_sample(sample: Dict[str, np.ndarray], size_wh=(854, 480)) -> Dict:
    import cv2

    w, h = size_wh
    out = dict(sample)
    out["img"] = cv2.resize(sample["img"], (w, h), interpolation=cv2.INTER_LINEAR)
    out["prob"] = cv2.resize(sample["prob"], (w, h), interpolation=cv2.INTER_LINEAR)
    out["label"] = cv2.resize(
        sample["label"], (w, h), interpolation=cv2.INTER_NEAREST
    )
    return out


def _affine_matrix(h, w, rng, crop_frac, scale_rng, shear_deg, rot_deg):
    """Compose crop+scale+shear+rotate about the image centre → 2×3 matrix."""
    import cv2

    cy, cx = h / 2.0, w / 2.0
    angle = rng.uniform(-rot_deg, rot_deg)
    scale = rng.uniform(*scale_rng)
    shear = np.deg2rad(rng.uniform(-shear_deg, shear_deg))

    m_rot = cv2.getRotationMatrix2D((cx, cy), angle, scale)  # 2x3
    m_rot3 = np.vstack([m_rot, [0, 0, 1]])
    m_shear3 = np.array(
        [[1, np.tan(shear), -cy * np.tan(shear)], [0, 1, 0], [0, 0, 1]]
    )
    # crop: shift + zoom-in by up to crop_frac on each side
    cl = rng.uniform(0, crop_frac) * w
    cr = rng.uniform(0, crop_frac) * w
    ct = rng.uniform(0, crop_frac) * h
    cb = rng.uniform(0, crop_frac) * h
    sx = w / max(w - cl - cr, 1.0)
    sy = h / max(h - ct - cb, 1.0)
    m_crop3 = np.array([[sx, 0, -sx * cl], [0, sy, -sy * ct], [0, 0, 1]])
    m = m_crop3 @ m_shear3 @ m_rot3
    return m[:2]


def random_affine(
    sample: Dict[str, np.ndarray],
    rng: np.random.Generator,
    crop_frac: float = 0.10,
    scale_rng=(0.9, 1.1),
    shear_deg: float = 15.0,
    rot_deg: float = 25.0,
    max_tries: int = 10,
) -> Dict:
    """One shared affine for img/prob/label; retried until every label id
    present before the transform is still present after (reference
    transforms_assess.py:93-145 retry semantics)."""
    import cv2

    h, w = sample["label"].shape[:2]
    wanted = set(np.unique(sample["label"])) - {0}
    for _ in range(max_tries):
        m = _affine_matrix(h, w, rng, crop_frac, scale_rng, shear_deg, rot_deg)
        new_label = cv2.warpAffine(
            sample["label"], m, (w, h), flags=cv2.INTER_NEAREST
        )
        if wanted.issubset(set(np.unique(new_label))):
            out = dict(sample)
            out["img"] = cv2.warpAffine(sample["img"], m, (w, h), flags=cv2.INTER_LINEAR)
            out["prob"] = cv2.warpAffine(
                sample["prob"], m, (w, h), flags=cv2.INTER_LINEAR
            )
            out["label"] = new_label
            return out
    return dict(sample)  # give up, keep original (reference behaviour)


def additive_noise(sample: Dict, rng: np.random.Generator, magnitude=5.0 / 255.0) -> Dict:
    out = dict(sample)
    noise = rng.uniform(-magnitude, magnitude)
    out["img"] = np.clip(sample["img"] + noise, 0.0, 1.0).astype(np.float32)
    return out


def random_contrast(sample: Dict, rng: np.random.Generator, lo=0.97, hi=1.03) -> Dict:
    out = dict(sample)
    out["img"] = np.clip(sample["img"] * rng.uniform(lo, hi), 0.0, 1.0).astype(
        np.float32
    )
    return out


def random_hflip(sample: Dict, rng: np.random.Generator, p: float = 0.5) -> Dict:
    if rng.random() >= p:
        return sample
    out = dict(sample)
    for k in ("img", "prob", "label"):
        out[k] = np.ascontiguousarray(sample[k][:, ::-1])
    return out


@dataclass
class QAAugmentPipeline:
    """Compose of the five reference QA transforms; deterministic per seed."""

    size_wh: tuple = (854, 480)
    seed: int = 0
    enable_resize: bool = True

    def __post_init__(self):
        self.rng = np.random.default_rng(self.seed)

    def __call__(self, sample: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        if self.enable_resize:
            sample = resize_sample(sample, self.size_wh)
        sample = random_affine(sample, self.rng)
        sample = additive_noise(sample, self.rng)
        sample = random_contrast(sample, self.rng)
        sample = random_hflip(sample, self.rng)
        return sample
