"""TAPNet backbone tests: propagation geometry, adapter contract, and a full
interactive episode through the session."""

import numpy as np
import pytest

from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.models.vos.tapnet import (
    TAPNetAdapter,
    compute_alpha,
    init_tapnet_params,
    prop_order,
)


def test_prop_order_backward_then_forward():
    order, reset, valid = prop_order(6, 2)
    np.testing.assert_array_equal(order, [1, 0, 3, 4, 5])
    np.testing.assert_array_equal(reset, [0, 0, 1, 0, 0])
    assert valid.all()
    # edge: annotate frame 0 → forward only, no reset needed mid-scan
    order0, reset0, _ = prop_order(4, 0)
    np.testing.assert_array_equal(order0, [1, 2, 3])
    np.testing.assert_array_equal(reset0, [1, 0, 0])
    # edge: annotate last frame → backward only
    orderl, resetl, _ = prop_order(4, 3)
    np.testing.assert_array_equal(orderl, [2, 1, 0])
    np.testing.assert_array_equal(resetl, [0, 0, 0])


def test_prop_order_forward_then_backward():
    # MANet parity direction (reference utils/utils_manet.py:87-154)
    order, reset, valid = prop_order(6, 2, direction="fwd_bwd")
    np.testing.assert_array_equal(order, [3, 4, 5, 1, 0])
    np.testing.assert_array_equal(reset, [0, 0, 0, 1, 0])
    assert valid.all()
    order0, reset0, _ = prop_order(4, 0, direction="fwd_bwd")
    np.testing.assert_array_equal(order0, [1, 2, 3])
    np.testing.assert_array_equal(reset0, [0, 0, 0])
    orderl, resetl, _ = prop_order(4, 3, direction="fwd_bwd")
    np.testing.assert_array_equal(orderl, [2, 1, 0])
    np.testing.assert_array_equal(resetl, [1, 0, 0])


def test_compute_alpha_reference_semantics():
    # no other annotated frames: alpha = 1 everywhere
    a = compute_alpha(6, np.array([], dtype=np.int64), 3)
    np.testing.assert_allclose(a, 1.0)
    # previous annotation at 0, current at 4: backward frames blend toward it
    a = compute_alpha(6, np.array([0]), 4)
    # frame 1 is closest to old annotation → alpha near smallest (0.5+0.5*1/4)
    assert a[1] == pytest.approx(0.5 + 0.5 * 1 / 4)
    assert a[3] == pytest.approx(0.5 + 0.5 * 3 / 4)
    assert a[5] == pytest.approx(1.0)  # forward side: no upper annotation


@pytest.fixture(scope="module")
def setup():
    registry = SequenceRegistry.synthetic(
        ["tap-a"], num_frames=5, image_size=(64, 48), num_objects=2, seed=4
    )
    params = init_tapnet_params(seed=0, hw=(48, 64))
    adapter = TAPNetAdapter(params, encode_chunk=4)
    return registry, adapter


def test_adapter_contract_shapes(setup):
    registry, adapter = setup
    frames = registry.load_images("tap-a")
    gt = registry.load_annotations("tap-a")
    state = adapter.begin_sequence(frames, 2)

    from ivosw_tpu.interact.robot import ScribbleRobot

    robot = ScribbleRobot(seed=0)
    scrib = robot.interact("tap-a", np.zeros_like(gt), gt, 2, frame=2)
    masks, all_p, state = adapter.segment(state, scrib, 2, 1)

    assert masks.shape == (5, 48, 64)
    assert all_p.shape == (5, 3, 48, 64)
    # labels travel host-ward as uint8 (tunnel-bandwidth optimisation)
    assert masks.dtype == np.uint8
    assert np.isfinite(all_p).all()
    assert 0.0 <= all_p.min() and all_p.max() <= 1.0
    assert len(state.annotated) == 1

    # round 2 on a different frame: memory grows, probs update in place
    scrib2 = robot.interact("tap-a", masks, gt, 2, frame=4)
    masks2, all_p2, state = adapter.segment(state, scrib2, 4, 2)
    assert len(state.annotated) == 2
    assert masks2.shape == (5, 48, 64)


def test_tapnet_full_episode_via_driver(setup, tmp_path):
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.eval.eval_agent import evaluate

    registry, adapter = setup
    cfg = Config(phase="eval", setting="wild", method="random", vos="tapnet")
    summary = evaluate(
        cfg,
        registry,
        adapter,
        subset="val",
        max_nb_interactions=2,
        report_save_dir=str(tmp_path),
    )
    assert len(summary["curve"]["J_AND_F"]) == 2
    assert np.isfinite(summary["auc"])
