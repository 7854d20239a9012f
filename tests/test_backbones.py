"""MatchNet + IPNet backbone tests: adapter contract and fusion semantics."""

import numpy as np
import pytest

from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.interact.robot import ScribbleRobot
from ivosw_tpu.models.vos.ipnet import IPNetAdapter, get_weight, init_ipnet_params
from ivosw_tpu.models.vos.matchnet import MatchNetAdapter, init_matchnet_params


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["bb-a"], num_frames=4, image_size=(64, 48), num_objects=2, seed=7
    )


def test_get_weight_linear_ramp():
    # no other annotations: full weight everywhere
    w = get_weight(6, np.array([], dtype=np.int64), 2)
    np.testing.assert_allclose(w, 1.0)
    # previous annotation at 0, new at 4: ramp 0→1 between them, 0 below
    w = get_weight(8, np.array([0]), 4)
    assert w[4] == 1.0
    assert w[2] == pytest.approx(0.5)
    assert w[0] == 0.0
    assert w[6] == 1.0  # beyond the extremes: new round wins
    # annotations both sides
    w = get_weight(9, np.array([0, 8]), 4)
    assert w[4] == 1.0 and w[2] == pytest.approx(0.5) and w[6] == pytest.approx(0.5)
    assert w[0] == 0.0 and w[8] == 0.0


def _run_two_rounds(adapter, registry):
    frames = registry.load_images("bb-a")
    gt = registry.load_annotations("bb-a")
    robot = ScribbleRobot(seed=0)
    state = adapter.begin_sequence(frames, 2)
    scrib = robot.interact("bb-a", np.zeros_like(gt), gt, 2, frame=1)
    masks, all_p, state = adapter.segment(state, scrib, 1, 1)
    assert masks.shape == (4, 48, 64)
    assert all_p.shape == (4, 3, 48, 64)
    assert np.isfinite(all_p).all()
    scrib2 = robot.interact("bb-a", masks, gt, 2, frame=3)
    masks2, all_p2, state = adapter.segment(state, scrib2, 3, 2)
    assert masks2.shape == (4, 48, 64)
    assert len(state.annotated) == 2
    return all_p2


def test_matchnet_adapter(registry):
    adapter = MatchNetAdapter(init_matchnet_params(0, hw=(48, 64)), encode_chunk=4)
    all_p = _run_two_rounds(adapter, registry)
    assert 0.0 <= all_p.min() and all_p.max() <= 1.0


def test_ipnet_adapter(registry):
    adapter = IPNetAdapter(init_ipnet_params(0, hw=(48, 64)), encode_chunk=4)
    all_p = _run_two_rounds(adapter, registry)
    assert 0.0 <= all_p.min() and all_p.max() <= 1.0
