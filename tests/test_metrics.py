"""Metric tests: hand-computed golden values + NumPy↔XLA parity."""

import numpy as np
import pytest

from ivosw_tpu.ops.metrics import (
    auc_from_curve,
    batched_f_measure,
    batched_jaccard,
    f_measure_single,
    seg2bmap,
    sequence_metric,
)


def test_jaccard_perfect_and_empty():
    gt = np.zeros((2, 8, 8), dtype=np.int32)
    gt[0, 2:5, 2:5] = 1
    pred = gt.copy()
    j = batched_jaccard(gt, pred, nb_objects=1)
    # frame 0 perfect, frame 1 both-empty => 1.0 by convention
    np.testing.assert_allclose(j, [1.0, 1.0])


def test_jaccard_half_overlap():
    gt = np.zeros((1, 10, 10), dtype=np.int32)
    pred = np.zeros((1, 10, 10), dtype=np.int32)
    gt[0, 0:4, 0:4] = 1      # 16 px
    pred[0, 2:6, 0:4] = 1    # 16 px, overlap 8 px, union 24 px
    j = batched_jaccard(gt, pred, nb_objects=1)
    np.testing.assert_allclose(j, [8 / 24])


def test_jaccard_multi_object_average():
    gt = np.zeros((1, 10, 10), dtype=np.int32)
    pred = np.zeros((1, 10, 10), dtype=np.int32)
    gt[0, 0:2, 0:2] = 1
    pred[0, 0:2, 0:2] = 1          # obj 1 perfect
    gt[0, 5:7, 5:7] = 2            # obj 2 missed entirely
    j_obj = batched_jaccard(gt, pred, average_over_objects=False, nb_objects=2)
    np.testing.assert_allclose(j_obj, [[1.0, 0.0]])
    j_avg = batched_jaccard(gt, pred, average_over_objects=True, nb_objects=2)
    np.testing.assert_allclose(j_avg, [0.5])


def test_seg2bmap_square():
    seg = np.zeros((8, 8), dtype=bool)
    seg[2:5, 2:5] = True
    b = seg2bmap(seg)
    # interior pixel (3,3) is not boundary
    assert not b[3, 3]
    # DAVIS semantics: a transition between (i,j) and its east/south/se
    # neighbour marks the lower-index pixel. So the outside pixels just
    # north-west of the square are boundary, the square's own top-left
    # corner (all three neighbours inside) is not, and the bottom-right
    # inside edge is.
    assert b[1, 1] and b[1, 2] and b[2, 1]
    assert not b[2, 2]
    assert b[4, 4]


def test_f_measure_identical_masks_is_one():
    m = np.zeros((32, 32), dtype=bool)
    m[8:20, 10:22] = True
    assert f_measure_single(m, m) == pytest.approx(1.0)


def test_f_measure_empty_cases():
    empty = np.zeros((16, 16), dtype=bool)
    full = np.zeros((16, 16), dtype=bool)
    full[4:10, 4:10] = True
    assert f_measure_single(empty, empty) == pytest.approx(1.0)
    assert f_measure_single(empty, full) == pytest.approx(0.0)
    assert f_measure_single(full, empty) == pytest.approx(0.0)


def test_f_measure_tolerance():
    # shifted by 1 px: within the dilation radius => still perfect match
    a = np.zeros((64, 64), dtype=bool)
    b = np.zeros((64, 64), dtype=bool)
    a[10:30, 10:30] = True
    b[11:31, 10:30] = True
    assert f_measure_single(a, b) == pytest.approx(1.0)


def test_sequence_metric_j_and_f_is_mean():
    rng = np.random.default_rng(0)
    gt = (rng.random((3, 24, 24)) > 0.5).astype(np.int32)
    pred = (rng.random((3, 24, 24)) > 0.5).astype(np.int32)
    j = batched_jaccard(gt, pred, nb_objects=1)
    f = batched_f_measure(gt, pred, nb_objects=1)
    jf = sequence_metric("J_AND_F", gt, pred, 1)
    np.testing.assert_allclose(jf, 0.5 * j + 0.5 * f)


def test_auc_from_curve():
    # reference formula: trapz(curve)/(len-1)
    curve = [0.5, 0.7, 0.9]
    assert auc_from_curve(curve) == pytest.approx(np.trapezoid(curve) / 2)
    assert auc_from_curve([0.6]) == pytest.approx(0.6)


def test_jax_parity_jaccard():
    from ivosw_tpu.ops.metrics_jax import batched_jaccard_jax

    rng = np.random.default_rng(1)
    gt = rng.integers(0, 3, size=(4, 33, 47)).astype(np.int32)
    pred = rng.integers(0, 3, size=(4, 33, 47)).astype(np.int32)
    j_np = batched_jaccard(gt, pred, average_over_objects=False, nb_objects=2)
    j_jx = np.asarray(batched_jaccard_jax(gt, pred, nb_objects=2))
    np.testing.assert_allclose(j_np, j_jx, atol=1e-6)


def test_jax_parity_f_measure():
    from ivosw_tpu.ops.metrics_jax import batched_f_measure_jax

    rng = np.random.default_rng(2)
    gt = np.zeros((3, 40, 56), dtype=np.int32)
    pred = np.zeros((3, 40, 56), dtype=np.int32)
    for t in range(3):
        y, x = rng.integers(4, 20, size=2)
        gt[t, y : y + 12, x : x + 16] = 1
        pred[t, y + rng.integers(-2, 3) : y + 12, x : x + 17] = 1
    gt[1, 25:35, 30:50] = 2
    pred[1, 26:34, 31:49] = 2
    f_np = batched_f_measure(gt, pred, average_over_objects=False, nb_objects=2)
    f_jx = np.asarray(batched_f_measure_jax(gt, pred, nb_objects=2))
    np.testing.assert_allclose(f_np, f_jx, atol=1e-5)
