"""scripts/demo_ytbvos.py plumbing: demo clips → ytbvos tree → eval.

Guards the results-level YouTube-VOS demonstration chain (reference
``datasets/prepare_ytbvos.py`` + the ytbvos cells of its results table):
fabricated source tree round-trips through the converter, the json
registry, the session's human-scribble branch, and the eval driver.
Runs on 2 sequences with the fake backbone to stay hermetic and fast."""

import json
import os

import numpy as np


def test_fabricate_convert_evaluate(tmp_path, monkeypatch):
    import scripts.demo_ytbvos as dy
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.data import demo
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.eval.eval_agent import evaluate
    from ivosw_tpu.models.vos.fake import FakeVOS

    monkeypatch.setattr(dy, "SRC", str(tmp_path / "src"))
    monkeypatch.setattr(dy, "SCB", str(tmp_path / "scb"))
    monkeypatch.setattr(dy, "DST", str(tmp_path / "dst"))
    # trim the registry to 2 val clips: fabricate iterates subset("val")
    monkeypatch.setattr(demo, "VAL_SEQS", demo.VAL_SEQS[:2])

    dy.stage_fabricate(force=False)
    dy.stage_convert(force=False)

    json_path = tmp_path / "dst" / "scb_ytbvos.json"
    assert json_path.exists()
    with open(json_path) as fp:
        data = json.load(fp)
    assert len(data["sequences"]) == 2
    info = next(iter(data["sequences"].values()))
    assert info["num_frames"] == demo.DEFAULT_SPEC.num_frames
    assert info["num_objects"] == demo.DEFAULT_SPEC.num_objects

    reg = SequenceRegistry.from_json(str(json_path))
    seqs = reg.subset("val")
    assert len(seqs) == 2
    # converted annotations preserve the object ids (palette png round-trip)
    anns = reg.load_annotations(seqs[0])
    assert set(np.unique(anns)) <= set(range(demo.DEFAULT_SPEC.num_objects + 1))
    assert anns.max() >= 1
    # human scribbles landed in the converted tree and parse
    scb = os.path.join(str(tmp_path / "dst"), "Scribbles", seqs[0], "001.json")
    with open(scb) as fp:
        scrib = json.load(fp)
    assert len(scrib["scribbles"]) == demo.DEFAULT_SPEC.num_frames
    assert any(scrib["scribbles"])  # at least one annotated frame

    cfg = Config(phase="eval", setting="wild", method="random", dataset="ytbvos")
    summary = evaluate(
        cfg, reg, FakeVOS(reg, max_quality=0.8), subset="val",
        max_nb_interactions=2, report_save_dir=str(tmp_path / "out"),
    )
    assert len(summary["curve"]["J_AND_F"]) == 2
    assert 0 < summary["auc"] <= 1
