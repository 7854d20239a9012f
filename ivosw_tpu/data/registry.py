"""Sequence registry + frame/annotation loaders (DAVIS & Scribble-YouTube-VOS).

Replaces the reference's dependency on ``davisinteractive.dataset.Davis``
(``eval_agent_atnet.py:17,84,210-211``) and its ytbvos monkeypatching
(``eval_agent_atnet.py:68-80``): one registry class with three constructors —
a DAVIS directory tree, a ``scb_ytbvos.json`` registry file, or fully
in-memory synthetic clips (the hermetic test path).

Frames load as float32 NHWC in [0, 1] (TPU layout) rather than the
reference's NCHW tensors (``eval_agent_atnet.py:219-222``).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class SequenceInfo:
    name: str
    set: str  # 'train' | 'val'
    num_frames: int
    image_size: Tuple[int, int]  # (width, height), davisinteractive convention
    num_objects: int
    num_scribbles: int = 3


def registry_from_config(cfg) -> "SequenceRegistry":
    """Config → registry (davis directory tree or ytbvos json)."""
    if cfg.dataset == "davis":
        return SequenceRegistry.from_davis_root(cfg.data.root_dir_davis)
    if cfg.dataset == "ytbvos":
        root = cfg.data.root_dir_scribble_youtube_vos
        return SequenceRegistry.from_json(
            os.path.join(root, "scb_ytbvos.json"), root=root
        )
    raise NotImplementedError(cfg.dataset)


@dataclass
class SequenceRegistry:
    root: Optional[str] = None
    sequences: Dict[str, SequenceInfo] = field(default_factory=dict)
    # in-memory data for synthetic registries: name -> (frames, annotations)
    _synthetic: Dict[str, Tuple[np.ndarray, np.ndarray]] = field(
        default_factory=dict, repr=False
    )
    # tiny LRU caches: eval/session/training visit the same sequence several
    # times in a row (scribble samples are consecutive); decoding a 480p
    # clip repeatedly is pure waste
    _ann_cache: Dict[str, np.ndarray] = field(default_factory=dict, repr=False)
    _img_cache: Dict[str, np.ndarray] = field(default_factory=dict, repr=False)
    cache_sequences: int = 2

    # ------------------------------------------------------------ queries --
    def subset(self, name: str) -> List[str]:
        if name == "trainval":
            return sorted(
                s.name for s in self.sequences.values() if s.set in ("train", "val")
            )
        return sorted(s.name for s in self.sequences.values() if s.set == name)

    def __contains__(self, name: str) -> bool:
        return name in self.sequences

    def info(self, name: str) -> SequenceInfo:
        return self.sequences[name]

    # ------------------------------------------------------------ loaders --
    def _lru(self, cache: Dict, name: str, loader):
        if name in cache:
            return cache[name]
        val = loader()
        while len(cache) >= max(self.cache_sequences, 1):
            cache.pop(next(iter(cache)))
        cache[name] = val
        return val

    def _files(self, kind: str, name: str) -> List[str]:
        seq_dir = os.path.join(self.root, kind, "480p", name)
        return [os.path.join(seq_dir, f) for f in sorted(os.listdir(seq_dir))]

    def load_annotations(self, name: str) -> np.ndarray:
        """Ground-truth label masks [T, H, W] uint8 (0 = background)."""
        if name in self._synthetic:
            return self._synthetic[name][1]
        from PIL import Image

        return self._lru(
            self._ann_cache,
            name,
            lambda: np.stack(
                [
                    np.array(Image.open(f), dtype=np.uint8)
                    for f in self._files("Annotations", name)
                ]
            ),
        )

    def load_images(self, name: str) -> np.ndarray:
        """Frames [T, H, W, 3] float32 in [0, 1], RGB."""
        if name in self._synthetic:
            return self._synthetic[name][0]
        from PIL import Image

        return self._lru(
            self._img_cache,
            name,
            lambda: np.stack(
                [
                    np.asarray(Image.open(f).convert("RGB"), dtype=np.float32)
                    / 255.0
                    for f in self._files("JPEGImages", name)
                ]
            ),
        )

    def load_image_frame(self, name: str, frame: int) -> np.ndarray:
        """ONE frame [H, W, 3] float32 — avoids whole-clip decodes in
        per-sample loaders (QA regression dataset)."""
        if name in self._synthetic:
            return self._synthetic[name][0][frame]
        if name in self._img_cache:
            return self._img_cache[name][frame]
        from PIL import Image

        return (
            np.asarray(
                Image.open(self._files("JPEGImages", name)[frame]).convert("RGB"),
                dtype=np.float32,
            )
            / 255.0
        )

    def load_annotation_frame(self, name: str, frame: int) -> np.ndarray:
        """ONE annotation [H, W] uint8."""
        if name in self._synthetic:
            return self._synthetic[name][1][frame]
        if name in self._ann_cache:
            return self._ann_cache[name][frame]
        from PIL import Image

        return np.array(
            Image.open(self._files("Annotations", name)[frame]), dtype=np.uint8
        )

    # ------------------------------------------------------- constructors --
    @classmethod
    def from_davis_root(cls, root: str, num_scribbles: int = 3) -> "SequenceRegistry":
        """Scan a DAVIS-layout tree (ImageSets/2017/{train,val}.txt)."""
        from PIL import Image

        reg = cls(root=root)
        sets_dir = os.path.join(root, "ImageSets", "2017")
        for split in ("train", "val"):
            split_file = os.path.join(sets_dir, f"{split}.txt")
            if not os.path.exists(split_file):
                continue
            with open(split_file) as fp:
                names = [line.strip() for line in fp if line.strip()]
            for name in names:
                img_dir = os.path.join(root, "JPEGImages", "480p", name)
                ann_dir = os.path.join(root, "Annotations", "480p", name)
                frames = sorted(os.listdir(img_dir))
                first_ann = sorted(os.listdir(ann_dir))[0]
                ann = np.array(
                    Image.open(os.path.join(ann_dir, first_ann)), dtype=np.uint8
                )
                with Image.open(os.path.join(img_dir, frames[0])) as im:
                    w, h = im.size
                reg.sequences[name] = SequenceInfo(
                    name=name,
                    set=split,
                    num_frames=len(frames),
                    image_size=(w, h),
                    num_objects=int(ann.max()),
                    num_scribbles=num_scribbles,
                )
        return reg

    @classmethod
    def from_json(cls, json_path: str, root: Optional[str] = None) -> "SequenceRegistry":
        """Load a scb_ytbvos.json-style registry
        (reference datasets/prepare_ytbvos.py:23-51 schema)."""
        with open(json_path) as fp:
            data = json.load(fp)
        reg = cls(root=root or os.path.dirname(json_path))
        for name, v in data["sequences"].items():
            reg.sequences[name] = SequenceInfo(
                name=v.get("name", name),
                set=v["set"],
                num_frames=int(v["num_frames"]),
                image_size=tuple(v["image_size"]),
                num_objects=int(v["num_objects"]),
                num_scribbles=int(v.get("num_scribbles", 3)),
            )
        return reg

    @classmethod
    def synthetic(
        cls,
        names: List[str],
        num_frames: int = 12,
        image_size: Tuple[int, int] = (64, 48),
        num_objects: int = 2,
        split: str = "val",
        seed: int = 0,
    ) -> "SequenceRegistry":
        """Deterministic in-memory clips: textured frames + moving objects.

        Objects are axis-aligned blobs drifting across the clip so that
        propagation quality, scribbles, and metrics all behave non-trivially
        in hermetic tests.
        """
        rng = np.random.default_rng(seed)
        w, h = image_size
        reg = cls()
        for name in names:
            frames = np.zeros((num_frames, h, w, 3), dtype=np.float32)
            anns = np.zeros((num_frames, h, w), dtype=np.uint8)
            base = rng.random((h, w, 3)).astype(np.float32) * 0.3
            centers = rng.random((num_objects, 2)) * 0.5 + 0.25
            vels = (rng.random((num_objects, 2)) - 0.5) * 0.04
            sizes = rng.integers(max(4, h // 6), max(6, h // 3), size=num_objects)
            colors = rng.random((num_objects, 3)).astype(np.float32) * 0.7 + 0.3
            for t in range(num_frames):
                frame = base + rng.normal(0, 0.02, (h, w, 3)).astype(np.float32)
                ann = np.zeros((h, w), dtype=np.uint8)
                for o in range(num_objects):
                    cy = int((centers[o, 0] + vels[o, 0] * t) * h) % h
                    cx = int((centers[o, 1] + vels[o, 1] * t) * w) % w
                    s = int(sizes[o])
                    y0, y1 = max(0, cy - s // 2), min(h, cy + s // 2 + 1)
                    x0, x1 = max(0, cx - s // 2), min(w, cx + s // 2 + 1)
                    frame[y0:y1, x0:x1] = colors[o]
                    ann[y0:y1, x0:x1] = o + 1
                frames[t] = np.clip(frame, 0, 1)
                anns[t] = ann
            reg.sequences[name] = SequenceInfo(
                name=name,
                set=split,
                num_frames=num_frames,
                image_size=(w, h),
                num_objects=num_objects,
            )
            reg._synthetic[name] = (frames, anns)
        return reg
