"""Diagnostics for the capability-demo task design (not part of the demo).

Checks the two properties the hard-band registry must have for the
BASELINE-style ordering (ours > worst/random/linspace) to be learnable:

1. headroom: quality after round 1 is far from saturated, and the curve
   over 8 rounds has room to differentiate policies;
2. band mechanism: annotating an in-band frame pays off less (globally)
   than annotating an out-of-band frame.

Usage: python scripts/demo_probe.py [probe ...] [--tier hd]
Probes: bands, policies, qa (held-out AssessNet correlation).
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import scripts.demo_ordering as demo  # noqa: E402
from scripts.demo_ordering import adapter, base_config, registry  # noqa: E402

from ivosw_tpu.data.demo import HARD_LEN  # noqa: E402
from ivosw_tpu.interact.robot import ScribbleRobot  # noqa: E402
from ivosw_tpu.ops.metrics import sequence_metric  # noqa: E402


def probe_bands():
    """Round-2 payoff: annotate in-band vs out-of-band, compare mean J&F."""
    reg = registry()
    adp = adapter(reg)
    robot = ScribbleRobot(seed=0)
    gains = {"in_band": [], "out_band": []}
    for seq in reg.subset("val"):
        info = reg.info(seq)
        gt = reg.load_annotations(seq)
        frames = reg.load_images(seq)
        bands = reg.hard_starts[seq]
        in_band = set()
        for s in bands:
            in_band.update(range(s, s + HARD_LEN))
        first = min(set(range(info.num_frames)) - in_band)

        def fresh_round1():
            state = adp.begin_sequence(frames, info.num_objects)
            zero = np.zeros_like(gt)
            scrib = robot.interact(seq, zero, gt, info.num_objects, first)
            masks, probs, state = adp.segment(state, scrib, first, 1)
            per = sequence_metric("J_AND_F", gt, np.asarray(masks), info.num_objects)
            return per, np.asarray(masks), state

        per1, masks1, _ = fresh_round1()
        # candidate round-2 frames: worst in-band frame vs worst out-band frame
        order = np.argsort(per1)
        worst_in = next(int(f) for f in order if int(f) in in_band)
        worst_out = next(
            int(f) for f in order if int(f) not in in_band and int(f) != first
        )
        for key, frame in (("in_band", worst_in), ("out_band", worst_out)):
            per1b, masks1b, state1b = fresh_round1()
            scrib2 = robot.interact(seq, masks1b, gt, info.num_objects, frame)
            masks2, _, _ = adp.segment(state1b, scrib2, frame, 2)
            per2 = sequence_metric(
                "J_AND_F", gt, np.asarray(masks2), info.num_objects
            )
            gains[key].append(float(per2.mean() - per1b.mean()))
        print(
            f"{seq}: r1={per1.mean():.3f} "
            f"gain(in-band @f{worst_in})={gains['in_band'][-1]:+.3f} "
            f"gain(out-band @f{worst_out})={gains['out_band'][-1]:+.3f}"
        )
    print(
        f"\nmean round-2 gain: in-band {np.mean(gains['in_band']):+.4f}  "
        f"out-band {np.mean(gains['out_band']):+.4f}"
    )


def probe_policies():
    """Quick curves for the model-free policies (random / linspace / worst-oracle)."""
    from ivosw_tpu.eval.eval_agent import evaluate

    reg = registry()
    for setting, method in (("wild", "random"), ("wild", "linspace"), ("oracle", "worst")):
        cfg = base_config()
        cfg.setting, cfg.method = setting, method
        # explicit throwaway report dir: evaluate() defaults to the real
        # results/ tree, and a stale probe summary there makes the demo
        # pipeline skip that config's evaluation
        summary = evaluate(
            cfg, reg, adapter(reg), subset="val", max_nb_interactions=8,
            vos_name="tapnet", report_save_dir=f"/tmp/demo_probe/{setting}_{method}",
        )
        curve = [round(float(x), 3) for x in summary["curve"]["J_AND_F"][:-1]]
        print(f"{setting}/{method}: auc={summary['auc']:.4f} curve={curve}")


def probe_qa():
    """Held-out QA fidelity: Pearson corr between AssessNet-predicted and
    true per-frame J&F on val-clip round-1 predictions — the number the
    wild setting's usefulness rides on (reference gets ~high corr for free
    from its ImageNet-pretrained encoder; the from-scratch demo must earn
    it). Run BETWEEN the assess and reward stages: a corr collapse here
    means the RL hours downstream are wasted."""
    from ivosw_tpu.interact.recommend import predict_clip_quality
    from ivosw_tpu.utils.checkpoint import load_assess_variables_ckpt

    assess_variables = load_assess_variables_ckpt(demo.CKPT_DIR)
    assert assess_variables is not None, f"no assess ckpt in {demo.CKPT_DIR}"
    reg = registry()
    adp = adapter(reg)
    robot = ScribbleRobot(seed=0)
    corrs = []
    for seq in reg.subset("val"):
        info = reg.info(seq)
        gt = reg.load_annotations(seq)
        frames = reg.load_images(seq)
        first = info.num_frames // 2
        state = adp.begin_sequence(frames, info.num_objects)
        scrib = robot.interact(
            seq, np.zeros_like(gt), gt, info.num_objects, first
        )
        masks, probs, state = adp.segment(state, scrib, first, 1)
        true_q = sequence_metric(
            "J_AND_F", gt, np.asarray(masks), info.num_objects
        )
        pred_q, _ = predict_clip_quality(
            assess_variables, frames, probs, info.num_objects
        )
        c = float(np.corrcoef(pred_q, true_q)[0, 1])
        corrs.append((seq, c))
        print(f"  {seq}: corr={c:.3f}")
    vals = [c for _, c in corrs]
    print(f"qa held-out corr: mean={np.mean(vals):.3f} min={np.min(vals):.3f}")
    # committed evidence (hosts are ephemeral; probe stdout lives only in a
    # /tmp log): results/qa_probe_{tier}.json records the QA fidelity number
    # the wild-setting tables ride on (VERDICT r4 ask #3)
    import json

    path = os.path.join("results", f"qa_probe_{demo.TIER}.json")
    with open(path, "w") as f:
        json.dump(
            {
                "tier": demo.TIER,
                "what": "Pearson corr of AssessNet-predicted vs true per-frame"
                        " J&F on round-1 val-clip predictions (held-out)",
                "per_sequence": dict(corrs),
                "mean": float(np.mean(vals)),
                "min": float(np.min(vals)),
            },
            f,
            indent=1,
        )
    print(f"wrote {path}")


PROBES = {"bands": probe_bands, "policies": probe_policies, "qa": probe_qa}

if __name__ == "__main__":
    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()
    argv = sys.argv[1:]
    if "--tier" in argv:
        demo.set_tier(argv[argv.index("--tier") + 1])
    if "--vos" in argv:
        demo.set_vos(argv[argv.index("--vos") + 1])
    names = [a for a in argv if a in PROBES] or list(PROBES)
    for name in names:
        print(f"=== probe {name} ===")
        PROBES[name]()
