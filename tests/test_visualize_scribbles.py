"""Visualization helpers + scribble utilities."""

import numpy as np

from ivosw_tpu.data.scribbles import (
    annotated_frames,
    empty_scribbles,
    make_scribble,
    merge_scribbles,
    rough_roi_filter,
    scribbles2mask,
)
from ivosw_tpu.utils.visualize import label_to_color, overlay_mask


def _simple_scribbles():
    s = empty_scribbles("seq", 3)
    s["scribbles"][1].append(
        make_scribble(np.array([[0.1, 0.1], [0.5, 0.5]]), object_id=1)
    )
    s["scribbles"][1].append(
        make_scribble(np.array([[0.8, 0.2], [0.8, 0.8]]), object_id=2)
    )
    return s


def test_scribbles2mask_rasterizes_lines():
    s = _simple_scribbles()
    mask = scribbles2mask(s, (20, 30))
    assert mask.shape == (3, 20, 30)
    assert set(np.unique(mask[0])) == {-1}
    vals = set(np.unique(mask[1]))
    assert {1, 2} <= vals
    # endpoints present: (0.1,0.1) -> x=3, y=2 (round to (w-1),(h-1) grid)
    assert mask[1, 2, 3] == 1
    assert annotated_frames(s) == [1]


def test_merge_scribbles_accumulates():
    a, b = _simple_scribbles(), _simple_scribbles()
    m = merge_scribbles(a, b)
    assert len(m["scribbles"][1]) == 4


def test_rough_roi_filter():
    label = np.full((50, 60), -1, dtype=np.int32)
    label[25, 30] = 1
    out = rough_roi_filter(label, dist=5)
    assert out[25, 30] == 1
    # outside the ±5 box everything is reset to background 0
    assert out[0, 0] == 0
    assert out[25, 40] == 0


def test_overlay_mask_blends_only_foreground():
    frame = np.zeros((8, 8, 3), dtype=np.float32)
    label = np.zeros((8, 8), dtype=np.int32)
    label[2:4, 2:4] = 1
    out = overlay_mask(frame, label, alpha=1.0)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out[0, 0], [0, 0, 0])
    np.testing.assert_array_equal(out[2, 2], label_to_color(np.array([[1]]))[0, 0])
