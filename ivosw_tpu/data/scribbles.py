"""Scribble data structures and rasterization.

Scribble dicts follow the davisinteractive wire format the reference consumes
(``eval_agent_atnet.py:199-200``, ``utils/utils_atnet.py:21-22``):

    {"sequence": str,
     "scribbles": [per-frame list of
         {"path": [[x, y], ...],   # normalized to [0, 1]
          "object_id": int,
          "start_time"/"end_time": int}]}

Rasterization draws each path as connected line segments onto a label mask
(host-side cv2; the reference delegates this to ATNet's ``scribble_to_image``
helpers). Masks then go to the device once per interaction.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def empty_scribbles(sequence: str, num_frames: int) -> Dict:
    return {"sequence": sequence, "scribbles": [[] for _ in range(num_frames)]}


def annotated_frames(scribbles: Dict) -> List[int]:
    """Frames that carry at least one scribble line
    (davisinteractive.utils.scribbles.annotated_frames equivalent)."""
    return [i for i, lines in enumerate(scribbles["scribbles"]) if len(lines) > 0]


def is_empty(scribbles: Dict) -> bool:
    return len(annotated_frames(scribbles)) == 0


def merge_scribbles(base: Dict, new: Dict) -> Dict:
    """Accumulate scribbles across rounds (get_scribbles(only_last=False))."""
    assert base["sequence"] == new["sequence"]
    merged = {
        "sequence": base["sequence"],
        "scribbles": [list(a) + list(b) for a, b in zip(base["scribbles"], new["scribbles"])],
    }
    return merged


def make_scribble(
    path_xy: np.ndarray, object_id: int, start_time: int = 0, end_time: int = 1000
) -> Dict:
    return {
        "path": [[float(x), float(y)] for x, y in path_xy],
        "object_id": int(object_id),
        "start_time": start_time,
        "end_time": end_time,
    }


def scribbles2mask(
    scribbles: Dict,
    output_resolution,
    only_frame: Optional[int] = None,
    default_value: int = -1,
    thickness: int = 1,
) -> np.ndarray:
    """Rasterize scribbles to label masks.

    output_resolution: (H, W). Returns [T, H, W] int32 (or [H, W] when
    only_frame is given) filled with ``default_value`` where unannotated —
    matching davisinteractive.utils.scribbles.scribbles2mask semantics the
    MANet adapter relies on (its rough_ROI treats -1 as background,
    reference utils/utils_manet.py:22-39).
    """
    import cv2

    h, w = output_resolution
    frames = scribbles["scribbles"]
    t = len(frames)
    out = np.full((t, h, w), default_value, dtype=np.int32)
    frame_range = [only_frame] if only_frame is not None else range(t)
    for fi in frame_range:
        for line in frames[fi]:
            path = np.asarray(line["path"], dtype=np.float64)
            if len(path) == 0:
                continue
            pts = np.empty_like(path)
            pts[:, 0] = np.clip(np.round(path[:, 0] * (w - 1)), 0, w - 1)
            pts[:, 1] = np.clip(np.round(path[:, 1] * (h - 1)), 0, h - 1)
            pts = pts.astype(np.int32)
            obj = int(line["object_id"])
            if len(pts) == 1:
                out[fi, pts[0, 1], pts[0, 0]] = obj
            else:
                canvas = out[fi].copy()
                cv2.polylines(
                    canvas,
                    [pts.reshape(-1, 1, 2)],
                    isClosed=False,
                    color=obj,
                    thickness=thickness,
                )
                out[fi] = canvas
    if only_frame is not None:
        return out[only_frame]
    return out


def rough_roi_filter(
    scribble_label: np.ndarray, dist: int = 20, background_value: int = 0
) -> np.ndarray:
    """Keep scribble labels only inside the ±dist bbox of all scribbles.

    Capability parity with MANet's rough_ROI (reference
    utils/utils_manet.py:22-39): pixels outside the padded bounding box of
    every non-background scribble are reset. scribble_label: [H, W] with -1
    (or background_value) marking no-scribble.
    """
    label = np.asarray(scribble_label)
    h, w = label.shape
    ys, xs = np.nonzero(label != -1)
    if len(ys) == 0:
        return label.copy()
    keep = np.zeros_like(label, dtype=bool)
    keep[
        max(int(ys.min()) - dist, 0) : min(int(ys.max()) + dist, h - 1),
        max(int(xs.min()) - dist, 0) : min(int(xs.max()) + dist, w - 1),
    ] = True
    return np.where(keep, label, background_value)


def scribble_masks_per_object(
    scribbles: Dict,
    output_resolution,
    frame: int,
    num_objects: int,
    dilation: int = 0,
) -> np.ndarray:
    """Per-object positive scribble masks for one frame: [O+1, H, W] float32
    (index 0 = background scribbles). Optionally dilated (the reference ATNet
    adapter dilates scribbles by ``scribble_dilation_param``)."""
    import cv2

    label = scribbles2mask(scribbles, output_resolution, only_frame=frame)
    out = np.zeros((num_objects + 1,) + tuple(output_resolution), dtype=np.float32)
    for obj in range(num_objects + 1):
        m = (label == obj).astype(np.float32)
        if dilation > 0 and m.any():
            kernel = np.ones((2 * dilation + 1, 2 * dilation + 1), np.uint8)
            m = cv2.dilate(m, kernel)
        out[obj] = m
    return out
