"""Session/robot tuning knobs: max_time budget, robot density, CLI plumbing.

The reference tunes the davisinteractive robot per driver
(``sess.connector.service.robot.min_nb_nodes = ...``, eval_agent_atnet.py:193)
and declares a ``max_time_per_interaction`` YAML knob it never reads (its
drivers hardcode ``max_time=None``, eval_agent_atnet.py:62). Here both are
first-class config knobs; these tests pin their behaviour.
"""

import numpy as np
import pytest

from ivosw_tpu.core.config import Config, apply_overrides
from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.data.scribbles import annotated_frames
from ivosw_tpu.interact.robot import ScribbleRobot, robot_from_config
from ivosw_tpu.interact.session import InteractiveSession
from ivosw_tpu.models.vos.fake import FakeVOS


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["alpha"], num_frames=6, image_size=(64, 48), num_objects=2, seed=3
    )


def _scribble_points(scrib):
    return [
        len(path["path"])
        for frame in scrib["scribbles"]
        for path in frame
    ]


def test_robot_nb_points_caps_path_length(registry):
    gt = registry.load_annotations("alpha")
    dense = ScribbleRobot(nb_points=25, seed=0).interact(
        "alpha", np.zeros_like(gt), gt, 2, frame=2
    )
    sparse = ScribbleRobot(nb_points=5, seed=0).interact(
        "alpha", np.zeros_like(gt), gt, 2, frame=2
    )
    assert max(_scribble_points(sparse)) <= 5
    assert max(_scribble_points(dense)) > 5
    assert sum(_scribble_points(dense)) > sum(_scribble_points(sparse))


def test_robot_min_nb_nodes_skips_small_regions(registry):
    gt = registry.load_annotations("alpha")
    permissive = ScribbleRobot(min_nb_nodes=4, seed=0).interact(
        "alpha", np.zeros_like(gt), gt, 2, frame=2
    )
    # a threshold larger than any region's geodesic path suppresses scribbles
    strict = ScribbleRobot(min_nb_nodes=10_000, seed=0).interact(
        "alpha", np.zeros_like(gt), gt, 2, frame=2
    )
    assert len(annotated_frames(permissive)) > 0
    assert len(annotated_frames(strict)) == 0


def test_robot_knobs_reachable_from_cli_overrides():
    cfg = Config()
    apply_overrides(
        cfg,
        [
            "davis_interactive.robot_min_nb_nodes=7",
            "davis_interactive.robot_nb_points=11",
        ],
    )
    robot = robot_from_config(cfg, seed=5)
    assert robot.min_nb_nodes == 7
    assert robot.nb_points == 11


def test_max_time_budget_ends_sample_early(registry):
    """With an exhausted per-sample budget every sample gets exactly one
    round: the session moves on instead of requesting more scribbles."""
    adapter = FakeVOS(registry, max_quality=0.6)
    with InteractiveSession(
        registry,
        subset="val",
        max_nb_interactions=4,
        max_time=0.0,  # budget 0 s x n_objects: exhausted after round 1
        seed=0,
    ) as sess:
        rounds_per_start = []
        while sess.next():
            sequence, scribbles, first = sess.get_scribbles()
            if first:
                info = registry.info(sequence)
                state = adapter.begin_sequence(
                    registry.load_images(sequence),
                    info.num_objects,
                    sequence=sequence,
                )
                rounds_per_start.append(0)
            rounds_per_start[-1] += 1
            masks, _, state = adapter.segment(
                state, scribbles, annotated_frames(sess.sample_last_scribble)[0], 1
            )
            sess.submit_masks(masks)
        report = sess.get_report()
    assert rounds_per_start and all(r == 1 for r in rounds_per_start)
    assert all(row["interaction"] == 1 for row in report)


def test_no_max_time_runs_full_budget(registry):
    adapter = FakeVOS(registry, max_quality=0.6)
    with InteractiveSession(
        registry, subset="val", max_nb_interactions=3, max_time=None, seed=0
    ) as sess:
        n_rounds = 0
        while sess.next():
            sequence, scribbles, first = sess.get_scribbles()
            if first:
                info = registry.info(sequence)
                state = adapter.begin_sequence(
                    registry.load_images(sequence),
                    info.num_objects,
                    sequence=sequence,
                )
            masks, _, state = adapter.segment(
                state, scribbles, annotated_frames(sess.sample_last_scribble)[0], 1
            )
            sess.submit_masks(masks)
            n_rounds += 1
    # every sample ran its full 3-round budget (robot kept finding errors
    # because FakeVOS quality is capped at 0.6)
    assert n_rounds == 3 * len(sess.samples)
