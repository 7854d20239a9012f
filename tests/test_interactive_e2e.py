"""Hermetic end-to-end: synthetic clips + fake backbone + real session/robot
through every setting×method branch, producing reference-format summary.json.
"""

import json
import os

import numpy as np
import pytest

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.data.scribbles import annotated_frames, scribbles2mask
from ivosw_tpu.eval.eval_agent import evaluate
from ivosw_tpu.interact.robot import ScribbleRobot
from ivosw_tpu.interact.session import InteractiveSession
from ivosw_tpu.models.vos.fake import FakeVOS


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["alpha", "beta"], num_frames=8, image_size=(64, 48), num_objects=2, seed=0
    )


def test_robot_scribbles_inside_error_region(registry):
    gt = registry.load_annotations("alpha")
    robot = ScribbleRobot(seed=0)
    scrib = robot.interact("alpha", np.zeros_like(gt), gt, 2, frame=3)
    frames = annotated_frames(scrib)
    assert frames == [3]
    # every rasterized scribble pixel of object o must lie on gt object o
    h, w = gt.shape[1:]
    label = scribbles2mask(scrib, (h, w), only_frame=3)
    for obj in (1, 2):
        pix = label == obj
        if pix.any():
            assert (gt[3][pix] == obj).all()


def test_session_protocol_and_curve(registry):
    # cap quality below saturation so the robot always finds an error
    # region large enough to scribble (otherwise episodes legitimately
    # terminate early once the prediction is near-perfect)
    adapter = FakeVOS(registry, max_quality=0.85)
    rounds_seen = []
    with InteractiveSession(
        registry, subset="val", max_nb_interactions=4, seed=0
    ) as sess:
        while sess.next():
            sequence, scribbles, first = sess.get_scribbles(only_last=False)
            af = annotated_frames(sess.sample_last_scribble)
            assert len(af) > 0
            if first:
                info = registry.info(sequence)
                state = adapter.begin_sequence(
                    registry.load_images(sequence), info.num_objects, sequence=sequence
                )
                n_inter = 1
            else:
                n_inter += 1
            masks, probs, state = adapter.segment(state, scribbles, af[-1], n_inter)
            assert probs.shape == (info.num_frames, info.num_objects + 1, 48, 64)
            rounds_seen.append((sequence, n_inter))
            sess.submit_masks(masks)
        summary = sess.get_global_summary()

    # 2 sequences × 3 scribbles × 4 rounds
    assert len(rounds_seen) == 2 * 3 * 4
    curve = summary["curve"]["J_AND_F"]
    assert len(curve) == 5  # 4 rounds + trailing duplicate
    # interactive loop must improve quality monotonically-ish
    assert curve[3] > curve[0]
    assert 0 <= summary["auc"] <= 1


@pytest.mark.parametrize(
    "setting,method",
    [("wild", "random"), ("wild", "linspace"), ("oracle", "worst"), ("oracle", "ours")],
)
def test_eval_driver_all_methods(registry, tmp_path, setting, method):
    cfg = Config(phase="eval", setting=setting, method=method, vos="fake")
    agent = None
    if method == "ours":
        from ivosw_tpu.models.agent import Agent

        agent = Agent(cfg, seed=0)
    adapter = FakeVOS(registry)
    out = str(tmp_path / f"{setting}_{method}")
    summary = evaluate(
        cfg,
        registry,
        adapter,
        agent=agent,
        subset="val",
        max_nb_interactions=3,
        report_save_dir=out,
    )
    with open(os.path.join(out, "summary.json")) as fp:
        on_disk = json.load(fp)
    assert on_disk["auc"] == pytest.approx(summary["auc"])
    assert len(on_disk["curve"]["J_AND_F"]) == 3
    assert 0.2 < on_disk["auc"] <= 1.0


def test_session_report_davisinteractive_schema(registry, tmp_path):
    """session_report.csv column parity with the davisinteractive package's
    EvaluationService report (one row per object×frame, jaccard+contour)."""
    import csv

    adapter = FakeVOS(registry, max_quality=0.85)
    out = str(tmp_path / "report")
    with InteractiveSession(
        registry, subset="val", max_nb_interactions=2, seed=0, report_save_dir=out
    ) as sess:
        sess.samples = [("alpha", 1)]
        while sess.next():
            sequence, scribbles, first = sess.get_scribbles(only_last=False)
            af = annotated_frames(sess.sample_last_scribble)
            if first:
                info = registry.info(sequence)
                state = adapter.begin_sequence(
                    registry.load_images(sequence), info.num_objects, sequence=sequence
                )
                n_inter = 1
            else:
                n_inter += 1
            masks, probs, state = adapter.segment(state, scribbles, af[-1], n_inter)
            sess.submit_masks(masks)
        summary = sess.get_global_summary()

    with open(os.path.join(out, "session_report.csv")) as fp:
        rows = list(csv.DictReader(fp))
    assert list(rows[0].keys()) == InteractiveSession.REPORT_COLUMNS
    info = registry.info("alpha")
    # 2 interactions × T frames × O objects
    assert len(rows) == 2 * info.num_frames * info.num_objects
    assert {int(r["object_id"]) for r in rows} == {1, 2}
    assert {int(r["interaction"]) for r in rows} == {1, 2}
    assert {int(r["frame"]) for r in rows} == set(range(info.num_frames))
    for r in rows:
        assert 0.0 <= float(r["jaccard"]) <= 1.0
        assert 0.0 <= float(r["contour"]) <= 1.0
        assert float(r["timing"]) >= 0.0
    # the summary curve must equal the per-row mean of 0.5(J+F) per round
    round1 = [r for r in rows if int(r["interaction"]) == 1]
    mean1 = np.mean(
        [0.5 * (float(r["jaccard"]) + float(r["contour"])) for r in round1]
    )
    assert summary["curve"]["J_AND_F"][0] == pytest.approx(mean1)


def test_evaluate_refuses_to_clobber_default_results_tree(registry, tmp_path, monkeypatch):
    """Defaulted report_save_dir lands in the committed results/ tree; an
    existing summary.json there must refuse to be overwritten (the
    stale-artifact trap that cost an eval round — CLAUDE.md)."""
    monkeypatch.chdir(tmp_path)
    cfg = Config(phase="eval", setting="oracle", method="worst", vos="fake")
    stale = tmp_path / "results" / "fake" / "oracle" / "davis" / "worst"
    stale.mkdir(parents=True)
    (stale / "summary.json").write_text('{"auc": 0.0}')
    with pytest.raises(FileExistsError):
        evaluate(
            cfg, registry, FakeVOS(registry), subset="val", max_nb_interactions=1
        )
    # committed artifact untouched
    assert json.loads((stale / "summary.json").read_text())["auc"] == 0.0
    # explicit dirs and overwrite=True both proceed
    summary = evaluate(
        cfg,
        registry,
        FakeVOS(registry),
        subset="val",
        max_nb_interactions=1,
        samples=[("alpha", 1)],
        overwrite=True,
    )
    assert json.loads((stale / "summary.json").read_text())["auc"] == pytest.approx(
        summary["auc"]
    )


def test_eval_driver_wild_ours_with_assessnet(registry, tmp_path):
    """Full wild pipeline: fused AssessNet scoring feeds the agent."""
    import jax

    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.models.assess import init_assess_variables

    cfg = Config(phase="eval", setting="wild", method="ours", vos="fake")
    agent = Agent(cfg, seed=0)
    variables = init_assess_variables(jax.random.PRNGKey(0))
    adapter = FakeVOS(registry)
    # restrict to one sample for runtime: one sequence, one scribble
    out = str(tmp_path / "wild_ours")
    registry.sequences["beta"].set = "train"  # leave only alpha in val
    try:
        summary = evaluate(
            cfg,
            registry,
            adapter,
            agent=agent,
            assess_variables=variables,
            subset="val",
            max_nb_interactions=2,
            report_save_dir=out,
        )
    finally:
        registry.sequences["beta"].set = "val"
    assert os.path.exists(os.path.join(out, "summary.json"))
    assert len(summary["curve"]["J_AND_F"]) == 2
