"""Native (C++/OpenMP) metrics: parity with the NumPy implementation."""

import numpy as np
import pytest

from ivosw_tpu.ops import metrics_native as mn
from ivosw_tpu.ops.metrics import batched_f_measure, batched_jaccard

pytestmark = pytest.mark.skipif(
    not mn.available(), reason="native metrics library failed to build"
)


def _random_masks(seed=0, t=3, h=60, w=80, n_obj=2):
    rng = np.random.default_rng(seed)
    gt = np.zeros((t, h, w), dtype=np.int32)
    pred = np.zeros((t, h, w), dtype=np.int32)
    for ti in range(t):
        for o in range(1, n_obj + 1):
            y, x = rng.integers(2, h // 2), rng.integers(2, w // 2)
            s = rng.integers(8, 20)
            gt[ti, y : y + s, x : x + s] = o
            dy, dx = rng.integers(-3, 4, size=2)
            pred[ti, y + dy : y + dy + s, x + dx : x + dx + s] = o
    return gt, pred


def test_native_jaccard_parity():
    gt, pred = _random_masks()
    ref = batched_jaccard(gt, pred, False, 2, backend="numpy")
    nat = mn.batched_jaccard_native(gt, pred, 2)
    np.testing.assert_allclose(nat, ref, atol=1e-12)


def test_native_f_measure_parity():
    gt, pred = _random_masks(seed=3)
    ref = batched_f_measure(gt, pred, False, 2, backend="numpy")
    nat = mn.batched_f_measure_native(gt, pred, 2)
    np.testing.assert_allclose(nat, ref, atol=1e-12)


def test_native_f_measure_edge_cases():
    empty = np.zeros((1, 32, 32), dtype=np.int32)
    full = empty.copy()
    full[0, 8:20, 8:20] = 1
    # empty-empty => 1; one empty => 0 (matching ops.metrics)
    np.testing.assert_allclose(mn.batched_f_measure_native(empty, empty, 1), [[1.0]])
    np.testing.assert_allclose(mn.batched_f_measure_native(full, empty, 1), [[0.0]])
    np.testing.assert_allclose(mn.batched_f_measure_native(empty, full, 1), [[0.0]])
    np.testing.assert_allclose(mn.batched_f_measure_native(full, full, 1), [[1.0]])


def test_auto_backend_dispatches():
    gt, pred = _random_masks(seed=5)
    auto = batched_f_measure(gt, pred, False, 2, backend="auto")
    native = batched_f_measure(gt, pred, False, 2, backend="native")
    np.testing.assert_allclose(auto, native)
