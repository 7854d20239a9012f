"""Vendored davisinteractive metric goldens.

The reference computes J/F through ``davisinteractive.metrics.batched_jaccard /
batched_f_measure`` (reference utils/misc.py:8,118-162). That package is not
installed in this image, so this file pins its semantics two ways:

1. ``di_*`` below is an independent transcription of the davisinteractive
   algorithm (davisinteractive/metrics/{jaccard,f_measure}.py): seg2bmap
   boundary extraction, skimage-disk tolerance dilation with radius
   ``ceil(0.008 * ||(H, W)||)``, its exact empty-mask conventions
   (J: empty-union -> 1; F: n_fg==0 xor n_gt==0 -> 0, both empty -> 1),
   implemented with brute-force shift-OR dilation (no cv2/skimage) so it
   shares no code with any production backend.
2. ``GOLDEN`` stores the transcription-time numeric outputs on deterministic
   fixture masks as literals, so later edits to the oracle itself cannot
   silently drift.

Every production backend (NumPy/cv2, C++ native, XLA) must match the pinned
constants — ruling out a systematic empty-mask / boundary-radius offset that
internal parity tests alone could never catch.
"""

import numpy as np
import pytest

from ivosw_tpu.ops.metrics import batched_f_measure, batched_jaccard

# --------------------------------------------------------------------------
# Independent oracle: davisinteractive transcription (pure NumPy, loop-based)
# --------------------------------------------------------------------------


def di_seg2bmap(seg):
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


def di_disk(radius):
    # skimage.morphology.disk: grid over [-r, r], x*x + y*y <= r*r
    r = int(radius)
    y, x = np.mgrid[-r : r + 1, -r : r + 1]
    return (x * x + y * y) <= radius * radius


def di_dilate(mask, selem):
    r = selem.shape[0] // 2
    h, w = mask.shape
    padded = np.pad(mask, r)
    out = np.zeros_like(mask, dtype=bool)
    for dy, dx in zip(*np.nonzero(selem)):
        out |= padded[dy : dy + h, dx : dx + w]
    return out


def di_f_measure(foreground_mask, gt_mask, bound_th=0.008):
    bound_pix = (
        bound_th
        if bound_th >= 1
        else np.ceil(bound_th * np.linalg.norm(foreground_mask.shape))
    )
    fg_boundary = di_seg2bmap(foreground_mask)
    gt_boundary = di_seg2bmap(gt_mask)
    selem = di_disk(bound_pix)
    fg_dil = di_dilate(fg_boundary, selem)
    gt_dil = di_dilate(gt_boundary, selem)
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


def di_batched_jaccard(y_true, y_pred, nb_objects):
    T = len(y_true)
    jac = np.empty((T, nb_objects))
    for i in range(nb_objects):
        obj = i + 1
        mt, mp = y_true == obj, y_pred == obj
        union = (mt | mp).sum(axis=(1, 2))
        inter = (mt & mp).sum(axis=(1, 2))
        for t in range(T):
            jac[t, i] = 1.0 if union[t] == 0 else inter[t] / union[t]
    return jac


def di_batched_f(y_true, y_pred, nb_objects, bound_th=0.008):
    T = len(y_true)
    f = np.empty((T, nb_objects))
    for i in range(nb_objects):
        for t in range(T):
            f[t, i] = di_f_measure(
                y_pred[t] == i + 1, y_true[t] == i + 1, bound_th
            )
    return f


# --------------------------------------------------------------------------
# Fixture masks (deterministic) + pinned oracle outputs
# --------------------------------------------------------------------------


def fixtures():
    out = {}

    # A: multi-object, every empty-mask convention, 3 frames 48x64 (radius 1)
    gt = np.zeros((3, 48, 64), np.int32)
    pred = np.zeros((3, 48, 64), np.int32)
    gt[0, 5:20, 8:30] = 1
    pred[0, 7:22, 8:30] = 1  # obj1 shifted 2px > radius 1
    gt[0, 30:40, 40:60] = 2  # pred obj2 absent -> J=0, F=0
    pred[1, 10:18, 10:26] = 1  # gt obj1 absent -> spurious pred
    gt[1, 30:40, 40:60] = 2
    pred[1, 30:40, 40:60] = 2  # perfect
    # frame 2: both empty -> J=1, F=1 by convention
    out["A"] = (gt, pred, 2)

    # B: non-square aspect, 1px vs 3px-diag shifts at radius 2, 120x200
    gt = np.zeros((2, 120, 200), np.int32)
    pred = np.zeros((2, 120, 200), np.int32)
    gt[0, 20:70, 30:130] = 1
    pred[0, 21:71, 30:130] = 1
    gt[1, 20:70, 30:130] = 1
    pred[1, 23:73, 33:133] = 1
    out["B"] = (gt, pred, 1)

    # C: full DAVIS 480p resolution -> bound_pix = ceil(0.008*||(480,854)||) = 8
    gt = np.zeros((1, 480, 854), np.int32)
    pred = np.zeros((1, 480, 854), np.int32)
    gt[0, 100:300, 200:600] = 1
    pred[0, 106:306, 200:600] = 1  # 6px shift: inside radius 8
    gt[0, 350:430, 650:800] = 2
    pred[0, 340:420, 640:790] = 2  # 10px diag shift: outside radius 8
    out["C"] = (gt, pred, 2)

    # D: ragged random blobs (irregular dense boundaries), 96x96
    rng = np.random.default_rng(12345)
    base = rng.random((96, 96))
    gt = np.zeros((2, 96, 96), np.int32)
    pred = np.zeros((2, 96, 96), np.int32)
    gt[0] = (base > 0.55).astype(np.int32)
    pred[0] = (np.roll(base, (1, 2), (0, 1)) > 0.55).astype(np.int32)
    gt[1] = (base > 0.7).astype(np.int32)
    pred[1] = (base > 0.62).astype(np.int32)
    out["D"] = (gt, pred, 1)

    return out


# Literal outputs of the di_* oracle on the fixtures, recorded 2026-08-16.
GOLDEN = {
    "A_J": [[0.7647058823529411, 0.0], [0.0, 1.0], [1.0, 1.0]],
    "A_F": [[0.43243243243243246, 0.0], [0.0, 1.0], [1.0, 1.0]],
    "B_J": [[0.9607843137254902], [0.837897445322551]],
    "B_F": [[1.0], [0.03333333333333333]],
    "C_J": [[0.941747572815534, 0.6901408450704225]],
    "C_F": [[1.0, 0.07391304347826087]],
    "D_J": [[0.2870662460567823], [0.795268691588785]],
    "D_F": [[0.9999365683476054], [1.0]],
}

FIXTURE_IDS = ["A", "B", "C", "D"]


@pytest.fixture(scope="module")
def fixture_data():
    return fixtures()


@pytest.mark.parametrize("name", FIXTURE_IDS)
def test_oracle_matches_pinned_constants(fixture_data, name):
    """Guards the transcription itself against later drift."""
    gt, pred, n = fixture_data[name]
    np.testing.assert_allclose(
        di_batched_jaccard(gt, pred, n), GOLDEN[f"{name}_J"], atol=1e-12
    )
    np.testing.assert_allclose(
        di_batched_f(gt, pred, n), GOLDEN[f"{name}_F"], atol=1e-12
    )


@pytest.mark.parametrize("name", FIXTURE_IDS)
def test_numpy_backend_matches_goldens(fixture_data, name):
    gt, pred, n = fixture_data[name]
    j = batched_jaccard(
        gt, pred, average_over_objects=False, nb_objects=n, backend="numpy"
    )
    f = batched_f_measure(
        gt, pred, average_over_objects=False, nb_objects=n, backend="numpy"
    )
    np.testing.assert_allclose(j, GOLDEN[f"{name}_J"], atol=1e-9)
    np.testing.assert_allclose(f, GOLDEN[f"{name}_F"], atol=1e-9)


@pytest.mark.parametrize("name", FIXTURE_IDS)
def test_native_backend_matches_goldens(fixture_data, name):
    from ivosw_tpu.ops import metrics_native as mn

    if not mn.available():
        pytest.skip("native metrics library unavailable")
    gt, pred, n = fixture_data[name]
    j = batched_jaccard(
        gt, pred, average_over_objects=False, nb_objects=n, backend="native"
    )
    f = batched_f_measure(
        gt, pred, average_over_objects=False, nb_objects=n, backend="native"
    )
    np.testing.assert_allclose(j, GOLDEN[f"{name}_J"], atol=1e-9)
    np.testing.assert_allclose(f, GOLDEN[f"{name}_F"], atol=1e-9)


@pytest.mark.parametrize("name", ["A", "B", "D"])  # C is 480p: too slow to jit on CPU
def test_jax_backend_matches_goldens(fixture_data, name):
    from ivosw_tpu.ops.metrics_jax import batched_f_measure_jax, batched_jaccard_jax

    gt, pred, n = fixture_data[name]
    j = np.asarray(batched_jaccard_jax(gt, pred, nb_objects=n))
    f = np.asarray(batched_f_measure_jax(gt, pred, nb_objects=n))
    np.testing.assert_allclose(j, GOLDEN[f"{name}_J"], atol=1e-6)
    np.testing.assert_allclose(f, GOLDEN[f"{name}_F"], atol=1e-5)
