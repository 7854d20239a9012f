"""Simulated human annotator ("scribble robot").

Standalone replacement for the davisinteractive robot the reference drives
through its session (``eval_agent_atnet.py:193`` tunes
``robot.min_nb_nodes``). Given ground truth and the current prediction it
draws scribbles inside the largest mislabelled region of each object (and the
background) on one frame:

1. error region per object id o: pixels where gt == o but pred != o;
2. keep the largest connected component (cv2);
3. extract a curve that stays inside the region: two wavefront-BFS passes
   (seed → farthest point p1; p1 → farthest point p2) approximate the
   geodesic diameter, then a steepest-descent backtrack from p2 yields the
   path — an all-NumPy/cv2 analogue of the reference robot's
   skeletonize+longest-path (networkx) approach;
4. jitter-free subsampling to ≤ nb_points, normalized [0,1] coordinates.

Deterministic given the constructor seed. Regions whose path would have fewer
than ``min_nb_nodes`` points are skipped, mirroring the knob the reference
tunes on the davisinteractive robot.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ivosw_tpu.data.scribbles import empty_scribbles, make_scribble


def _largest_component(mask: np.ndarray) -> Optional[np.ndarray]:
    import cv2

    m = mask.astype(np.uint8)
    if not m.any():
        return None
    n, labels, stats, _ = cv2.connectedComponentsWithStats(m, connectivity=8)
    if n <= 1:
        return None
    areas = stats[1:, cv2.CC_STAT_AREA]
    best = 1 + int(np.argmax(areas))
    return labels == best


def _wavefront(mask: np.ndarray, seed_yx) -> np.ndarray:
    """Geodesic distance (8-connected wavefront) from seed within mask.
    Unreached/outside pixels get -1. Vectorised: one cv2.dilate per ring."""
    import cv2

    dist = np.full(mask.shape, -1, dtype=np.int32)
    frontier = np.zeros(mask.shape, dtype=np.uint8)
    frontier[seed_yx] = 1
    dist[seed_yx] = 0
    kernel = np.ones((3, 3), np.uint8)
    d = 0
    visited = frontier.astype(bool)
    mask_u8 = mask.astype(bool)
    while True:
        d += 1
        grown = cv2.dilate(frontier, kernel).astype(bool)
        new = grown & mask_u8 & ~visited
        if not new.any():
            break
        dist[new] = d
        visited |= new
        frontier = new.astype(np.uint8)
    return dist


def _farthest(dist: np.ndarray):
    idx = int(np.argmax(dist))
    return np.unravel_index(idx, dist.shape)


def _backtrack(dist: np.ndarray, start_yx) -> np.ndarray:
    """Walk from start down the distance field to its 0-seed → path [N, 2]."""
    h, w = dist.shape
    path = [start_yx]
    y, x = start_yx
    d = dist[y, x]
    while d > 0:
        found = False
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                ny, nx = y + dy, x + dx
                if 0 <= ny < h and 0 <= nx < w and dist[ny, nx] == d - 1:
                    y, x, d = ny, nx, d - 1
                    path.append((y, x))
                    found = True
                    break
            if found:
                break
        if not found:  # disconnected field (shouldn't happen)
            break
    return np.asarray(path, dtype=np.float64)


def robot_from_config(cfg, seed: int = 0) -> "ScribbleRobot":
    """Robot tuned by config knobs (reference tunes the davisinteractive
    robot's min_nb_nodes per driver, eval_agent_atnet.py:193)."""
    di = cfg.davis_interactive
    return ScribbleRobot(
        min_nb_nodes=di.robot_min_nb_nodes,
        nb_points=di.robot_nb_points,
        seed=seed,
    )


class ScribbleRobot:
    """Deterministic scribble synthesiser over prediction errors."""

    def __init__(
        self,
        min_nb_nodes: int = 4,
        nb_points: int = 25,
        erosion: int = 1,
        seed: int = 0,
    ):
        self.min_nb_nodes = min_nb_nodes
        self.nb_points = nb_points
        self.erosion = erosion
        self.rng = np.random.default_rng(seed)

    def _region_path(self, region: np.ndarray) -> Optional[np.ndarray]:
        import cv2

        comp = _largest_component(region)
        if comp is None:
            return None
        if self.erosion > 0:
            k = np.ones((3, 3), np.uint8)
            eroded = cv2.erode(comp.astype(np.uint8), k, iterations=self.erosion)
            if eroded.any():
                comp2 = _largest_component(eroded)
                if comp2 is not None:
                    comp = comp2
        ys, xs = np.nonzero(comp)
        if len(ys) < self.min_nb_nodes:
            return None
        seed = (int(ys[0]), int(xs[0]))
        d1 = _wavefront(comp, seed)
        p1 = _farthest(d1)
        d2 = _wavefront(comp, p1)
        p2 = _farthest(d2)
        path = _backtrack(d2, p2)
        if len(path) < self.min_nb_nodes:
            return None
        if len(path) > self.nb_points:
            sel = np.linspace(0, len(path) - 1, self.nb_points).astype(int)
            path = path[sel]
        return path

    def interact(
        self,
        sequence: str,
        pred_masks: np.ndarray,
        gt_masks: np.ndarray,
        nb_objects: int,
        frame: int,
        include_background: bool = True,
    ) -> Dict:
        """Scribbles for one frame over all mislabelled regions.

        pred_masks/gt_masks: [T, H, W] integer label masks. Round 1 callers
        pass an all-zero prediction so the error region of each object is the
        object itself (self-bootstrapping first scribble).
        """
        t, h, w = gt_masks.shape
        scribbles = empty_scribbles(sequence, t)
        gt_f = gt_masks[frame]
        pred_f = pred_masks[frame]
        obj_range: List[int] = list(range(0 if include_background else 1, nb_objects + 1))
        for obj in obj_range:
            region = (gt_f == obj) & (pred_f != obj)
            if obj == 0:
                # only scribble background over false-positive areas
                region = region & (pred_f > 0)
            path_yx = self._region_path(region)
            if path_yx is None:
                continue
            path_xy = np.stack(
                [path_yx[:, 1] / max(w - 1, 1), path_yx[:, 0] / max(h - 1, 1)], axis=1
            )
            scribbles["scribbles"][frame].append(make_scribble(path_xy, obj))
        return scribbles
