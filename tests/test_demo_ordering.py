"""Capability-demonstration regression: "ours" beats the baselines.

Guards the committed `results/tapnet/*/synthetic/*/summary.json` artifacts
produced by `scripts/demo_ordering.py` — the demo-scale reproduction of the
ordering the reference's results table proves (reference
`results/**/summary.json`: ours > worst/random/linspace in the wild setting,
ours > worst in oracle).
"""

import json
import os

import numpy as np
import pytest

RESULTS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "results",
    "tapnet",
)
# the demonstration requires a real margin, not a 1e-9 tie-break: committed
# gaps are 0.0023-0.0073 AUC, so 0.002 guards "ours actually wins" while
# leaving room for the hair-level wobble regeneration across jax/cv2
# versions can introduce
MARGIN = 0.002
# oracle's committed gap (0.0045) sits inside the measured ±0.004 noise band
# for saturated variants; guard ordering-only there
ORACLE_MARGIN = 0.0


def _auc(
    setting: str, method: str, dataset: str = "synthetic", vos: str = "tapnet"
) -> float:
    path = os.path.join(
        os.path.dirname(RESULTS), vos, setting, dataset, method, "summary.json"
    )
    if not os.path.exists(path):
        pytest.skip(f"demo artifacts not generated ({path} missing)")
    with open(path) as fp:
        summary = json.load(fp)
    return float(summary["auc"])


def test_wild_ours_beats_every_baseline():
    ours = _auc("wild", "ours")
    for method in ("worst", "random", "linspace"):
        assert ours > _auc("wild", method) + MARGIN, (
            method,
            ours,
            _auc("wild", method),
        )


def test_oracle_ours_beats_worst():
    assert _auc("oracle", "ours") > _auc("oracle", "worst") + ORACLE_MARGIN


def test_ours_beats_worst_on_every_seed():
    """Multi-seed robustness (results/README.md): the agent's edge over the
    worst-frame policy — the claim the reference's table makes — holds on
    every committed registry seed, in both settings."""
    for dataset in (
        "synthetic",
        "synthetic-seed1",
        "synthetic-seed2",
        "synthetic-seed3",
        "synthetic-seed4",
        "synthetic-seed5",
    ):
        for setting in ("oracle", "wild"):
            ours = _auc(setting, "ours", dataset)
            worst = _auc(setting, "worst", dataset)
            assert ours > worst, (dataset, setting, ours, worst)


def test_wild_win_survives_without_smoothing():
    """Smoothing ablation: with smooth_quality=1 (the reference's exact
    state construction) ours still beats worst — the wild margin is the
    policy, not the smoothing knob."""
    ours = _auc("wild", "ours", "synthetic-smooth1")
    worst = _auc("wild", "worst", "synthetic-smooth1")
    assert ours > worst + MARGIN, (ours, worst)


@pytest.mark.parametrize("vos", ["matchnet", "ipnet"])
def test_transfer_backbone_ordering(vos):
    """Cross-backbone transfer (reference results/{MANet,IPN}): the SAME
    trained agent + AssessNet — trained once against the tapnet adapter —
    drive a different segmentation family, and the ordering the reference's
    table proves still holds: ours > every baseline (wild), ours > worst
    (oracle). Ordering-only margins: transfer runs the policy out of its
    training distribution, matching the reference's own thin transfer gaps
    (MANet wild ours-worst = 0.0107, IPN oracle ours-worst = 0.0020)."""
    ours = _auc("wild", "ours", vos=vos)
    for method in ("worst", "random", "linspace"):
        assert ours > _auc("wild", method, vos=vos), (
            vos,
            method,
            ours,
            _auc("wild", method, vos=vos),
        )
    assert _auc("oracle", "ours", vos=vos) > _auc("oracle", "worst", vos=vos)


def test_ytbvos_demo_ordering():
    """YouTube-VOS-format matrix (results/README.md, reference
    results/*/*/ytbvos): the same trained weights evaluated through the
    full ytbvos ingestion chain (converter → JSON registry → JPEG/PNG
    round-trips → committed human scribbles) keep the reference's complete
    wild ordering ours > worst > linspace > random and oracle ours > worst."""
    aucs = {
        m: _auc("wild", m, dataset="ytbvos-demo")
        for m in ("ours", "worst", "linspace", "random")
    }
    assert aucs["ours"] > aucs["worst"] > aucs["linspace"] > aucs["random"], aucs
    assert _auc("oracle", "ours", dataset="ytbvos-demo") > _auc(
        "oracle", "worst", dataset="ytbvos-demo"
    )


@pytest.mark.parametrize("vos", ["matchnet", "ipnet"])
def test_ytbvos_cross_backbone_ordering(vos):
    """The full 3-backbone × 2-dataset cross product (reference results/
    {ATNet,MANet,IPN}/*/{davis,ytbvos}): transfer backbones keep `ours` on
    top of every WILD ytbvos column. Oracle is guarded for ipnet only:
    matchnet/oracle/ytbvos-demo is a documented miss (ours −0.003, see
    results/README.md) with a reference-table precedent
    (IPN/oracle/ytbvos: ours 0.4386 < worst 0.4468)."""
    ours = _auc("wild", "ours", dataset="ytbvos-demo", vos=vos)
    for method in ("worst", "random", "linspace"):
        assert ours > _auc("wild", method, dataset="ytbvos-demo", vos=vos), (
            vos,
            method,
            ours,
            _auc("wild", method, dataset="ytbvos-demo", vos=vos),
        )
    if vos == "ipnet":
        assert _auc("oracle", "ours", dataset="ytbvos-demo", vos=vos) > _auc(
            "oracle", "worst", dataset="ytbvos-demo", vos=vos
        )


def test_hd_tier_ordering():
    """HD tier (192×256, 3 objects — results/README.md): the ordering
    reproduces as the task approaches DAVIS conditions, not just at 48×64."""
    ours = _auc("wild", "ours", dataset="synthetic-hd")
    for method in ("worst", "random", "linspace"):
        assert ours > _auc("wild", method, dataset="synthetic-hd"), (
            method,
            ours,
            _auc("wild", method, dataset="synthetic-hd"),
        )
    assert _auc("oracle", "ours", dataset="synthetic-hd") > _auc(
        "oracle", "worst", dataset="synthetic-hd"
    )


def test_curves_are_sane():
    """Every committed curve starts below where it ends (interaction helps)
    and stays in [0, 1]."""
    for setting, methods in (
        ("oracle", ("ours", "worst")),
        ("wild", ("ours", "worst", "random", "linspace")),
    ):
        for method in methods:
            path = os.path.join(
                RESULTS, setting, "synthetic", method, "summary.json"
            )
            if not os.path.exists(path):
                pytest.skip("demo artifacts not generated")
            with open(path) as fp:
                curve = np.asarray(json.load(fp)["curve"]["J_AND_F"])
            assert ((curve >= 0) & (curve <= 1)).all()
            assert curve[-1] > curve[0], (setting, method, curve)


def test_demo_registry_is_deterministic():
    from ivosw_tpu.data.demo import demo_registry

    a = demo_registry(seed=0)
    b = demo_registry(seed=0)
    assert a.subset("train") == b.subset("train")
    for seq in ("dm-t0", "dm-v3"):
        np.testing.assert_array_equal(a.load_images(seq), b.load_images(seq))
        np.testing.assert_array_equal(
            a.load_annotations(seq), b.load_annotations(seq)
        )
    assert a.hard_starts == b.hard_starts
    assert a.churn_starts == b.churn_starts


def test_default_spec_stream_is_frozen():
    """The DemoSpec refactor must keep the default tier bit-for-bit: the
    committed round-2 artifacts and trained weights depend on these exact
    rng streams. Pin a content hash of one train and one val clip."""
    import hashlib

    from ivosw_tpu.data.demo import demo_registry

    reg = demo_registry(seed=0)
    digest = hashlib.sha256()
    for seq in ("dm-t0", "dm-v7"):
        digest.update(reg.load_images(seq).tobytes())
        digest.update(reg.load_annotations(seq).tobytes())
    assert digest.hexdigest() == (
        "c3b9799ea1ab231fd347d4a430ea8bdd0b2698a3927a87c039bfea344dcd67b1"
    )


def test_hd_spec_registry():
    """HD tier: 192×256, 3 objects, same structural guarantees (hard bands
    + churn window per clip, deterministic across constructions)."""
    from ivosw_tpu.data.demo import HD_SPEC, demo_registry

    a = demo_registry(seed=0, spec=HD_SPEC)
    b = demo_registry(seed=0, spec=HD_SPEC)
    img = a.load_images("dm-t0")
    ann = a.load_annotations("dm-t0")
    assert img.shape == (48, 192, 256, 3)
    assert ann.max() == 3  # all three objects present
    np.testing.assert_array_equal(img, b.load_images("dm-t0"))
    for seq in a.subset("train") + a.subset("val"):
        assert len(a.hard_starts[seq]) == 2
        assert a.churn_starts[seq] > 0 or a.churn_starts[seq] == 0


def test_stage_qadata_skips_when_assess_checkpoint_exists(tmp_path, monkeypatch):
    """Cross-host resume: with the trained assess checkpoint restored from
    git but the bulky dump tree absent, stage_qadata must skip outright
    (the dumps' only consumer is stage_assess) — BEFORE touching the
    generator pool, whose construction costs minutes at the HD tier."""
    import sys

    sys.path.insert(0, os.path.dirname(RESULTS).rsplit("/results", 1)[0])
    import scripts.demo_ordering as demo

    ckpt = tmp_path / "weights" / "assess_net.orbax"
    ckpt.mkdir(parents=True)
    monkeypatch.setattr(demo, "CKPT_DIR", str(tmp_path / "weights"))
    monkeypatch.setattr(demo, "QA_DIR", str(tmp_path / "train" / "qa"))
    monkeypatch.setattr(
        demo, "training_pool", lambda: pytest.fail("pool must not be built")
    )
    demo.stage_qadata(None, force=False)  # returns without raising

    # without the checkpoint the stage must NOT skip (it would then build
    # the pool — the failing stub proves the code path went past the guard)
    ckpt.rmdir()
    with pytest.raises(BaseException, match="pool must not be built"):
        demo.stage_qadata(None, force=False)
