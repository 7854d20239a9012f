"""Results-level demonstration of the YouTube-VOS ingestion path.

The reference's results table spans two datasets per backbone; its ytbvos
cells run the SAME eval drivers over a converted YouTube-VOS tree
(reference ``datasets/prepare_ytbvos.py`` + ``eval_agent_atnet.py``'s
``_DATASET`` switch). This script exercises the rebuild's full equivalent
chain at results level with TRAINED weights:

    demo clips → ytbvos-style source tree (sparse JPEG numbering +
    CleanedAnnotations + human-scribble JSONs) → `ytbvos_prepare.create_dataset`
    /`create_json` → `SequenceRegistry.from_json` → `evaluate` over the six
    setting×method configs → results/tapnet/{setting}/ytbvos-demo/{method}/.

Differences from the synthetic in-memory eval this deliberately adds:
  * frames round-trip through lossy JPEG (like real YouTube-VOS frames);
  * annotations round-trip through palette PNGs;
  * round-1 scribbles come from committed ``Scribbles/<seq>/00N.json``
    files through the session's human-scribble branch
    (``interact/session.py::_load_human_scribble``), not robot bootstrap —
    the path DAVIS/ytbvos users hit in production.

Usage: python scripts/demo_ytbvos.py [--force] [--vos tapnet|matchnet|ipnet]

``--vos`` evaluates another trained backbone family over the SAME converted
ytbvos tree with the same tapnet-trained agent/AssessNet (transfer, as in
demo_ordering's matchnet/ipnet matrices) — completing the reference table's
full 3-backbone × 2-dataset cross product
(reference results/{ATNet,MANet,IPN}/*/ytbvos/).
Needs the trained default-tier weights (weights_demo/ — run
scripts/demo_ordering.py first).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ivosw_tpu.utils.misc import create_stream_logger, enable_compile_cache

log = create_stream_logger("demo_ytbvos")

VOS_NAME = "tapnet"

CKPT_DIR = "weights_demo"
SRC = "train_demo/ytbvos_src"
SCB = "train_demo/ytbvos_scb"
DST = "train_demo/ytbvos_dst"
EVAL_CONFIGS = [
    ("oracle", "worst"),
    ("oracle", "ours"),
    ("wild", "random"),
    ("wild", "linspace"),
    ("wild", "worst"),
    ("wild", "ours"),
]


def _json_safe(obj):
    if isinstance(obj, dict):
        return {k: _json_safe(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_json_safe(v) for v in obj]
    if isinstance(obj, (np.floating, np.integer)):
        return obj.item()
    return obj


def stage_fabricate(force: bool):
    """Demo val clips → ytbvos-style source tree + scribble dir."""
    if os.path.isdir(SRC) and not force:
        return log.info(f"skip fabricate ({SRC} exists)")
    from PIL import Image

    from ivosw_tpu.data.demo import demo_registry
    from ivosw_tpu.interact.robot import ScribbleRobot

    reg = demo_registry(seed=0)
    robot = ScribbleRobot(seed=0)
    palette = [0, 0, 0, 255, 0, 0, 0, 255, 0, 0, 0, 255] + [0] * 756
    os.makedirs(SCB, exist_ok=True)
    seqs = reg.subset("val")
    for seq in seqs:
        info = reg.info(seq)
        frames = (np.asarray(reg.load_images(seq)) * 255).astype(np.uint8)
        anns = np.asarray(reg.load_annotations(seq)).astype(np.uint8)
        jdir = os.path.join(SRC, "train", "JPEGImages", seq)
        adir = os.path.join(SRC, "train", "CleanedAnnotations", seq)
        sdir = os.path.join(SCB, seq)
        for d in (jdir, adir, sdir):
            os.makedirs(d, exist_ok=True)
        # sparse youtube-style numbering (every 5th) to exercise renumbering
        for i in range(info.num_frames):
            fnum = 5 * (i + 1)
            Image.fromarray(frames[i]).save(
                os.path.join(jdir, f"{fnum:05d}.jpg"), quality=95
            )
            p = Image.fromarray(anns[i], mode="P")
            p.putpalette(palette)
            p.save(os.path.join(adir, f"{fnum:05d}.png"))
        # human-scribble JSONs: robot round-1 scribbles at the same evenly
        # spaced bootstrap frames the session would pick itself
        for idx in range(1, info.num_scribbles + 1):
            frame = int(round((idx - 0.5) * info.num_frames / info.num_scribbles))
            frame = min(max(frame, 0), info.num_frames - 1)
            scrib = robot.interact(
                seq, np.zeros_like(anns), anns, info.num_objects, frame
            )
            with open(os.path.join(sdir, f"{idx:03d}.json"), "w") as fp:
                json.dump(_json_safe(scrib), fp)
    with open(os.path.join(SCB, "val.txt"), "w") as fp:
        fp.write("\n".join(seqs) + "\n")
    log.info(f"fabricated {len(seqs)} sequences under {SRC}")


def stage_convert(force: bool):
    from ivosw_tpu.data.ytbvos_prepare import create_dataset, create_json

    if os.path.exists(os.path.join(DST, "scb_ytbvos.json")) and not force:
        return log.info(f"skip convert ({DST} exists)")
    seqs = create_dataset(SRC, DST, SCB)
    path = create_json(DST)
    log.info(f"converted {len(seqs)} sequences; json at {path}")


def stage_evaluate(force: bool):
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.eval.backbones import build_backbone
    from ivosw_tpu.eval.eval_agent import evaluate
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.utils.checkpoint import (
        load_assess_variables_ckpt,
        restore_agent,
    )

    registry = SequenceRegistry.from_json(os.path.join(DST, "scb_ytbvos.json"))
    results = {}
    for setting, method in EVAL_CONFIGS:
        cfg = Config(seed=0, vos=VOS_NAME, dataset="ytbvos", ckpt_dir=CKPT_DIR)
        cfg.setting, cfg.method = setting, method
        cfg.assess_net.smooth_quality = 3
        report_dir = os.path.join("results", VOS_NAME, setting, "ytbvos-demo", method)
        if os.path.exists(os.path.join(report_dir, "summary.json")) and not force:
            with open(os.path.join(report_dir, "summary.json")) as fp:
                results[(setting, method)] = json.load(fp)["auc"]
            log.info(f"skip eval {setting}/{method} (summary exists)")
            continue
        agent = None
        assess_variables = None
        if method == "ours":
            agent = Agent(cfg)
            ckpt = CKPT_DIR
            wild_dir = os.path.join(CKPT_DIR, "wild")
            if setting == "wild" and os.path.exists(
                os.path.join(wild_dir, "agent.orbax")
            ):
                ckpt = wild_dir
            assert restore_agent(agent, ckpt), "agent checkpoint missing"
        if setting == "wild" and method in ("ours", "worst"):
            assess_variables = load_assess_variables_ckpt(CKPT_DIR)
            assert assess_variables is not None, "assess checkpoint missing"
        summary = evaluate(
            cfg,
            registry,
            build_backbone(cfg, registry),
            agent=agent,
            assess_variables=assess_variables,
            subset="val",
            max_nb_interactions=8,
            report_save_dir=report_dir,
            vos_name=VOS_NAME,
        )
        results[(setting, method)] = summary["auc"]
        log.info(f"eval {setting}/{method}: auc={summary['auc']:.4f}")

    log.info("=== ytbvos-demo ordering ===")
    for (setting, method), auc in sorted(results.items()):
        log.info(f"  {setting:6s} {method:9s} auc={auc:.4f}")
    return results


STAGES = {
    "fabricate": stage_fabricate,
    "convert": stage_convert,
    "evaluate": stage_evaluate,
}


def main(argv=None):
    global VOS_NAME
    argv = argv if argv is not None else sys.argv[1:]
    force = "--force" in argv
    if "--vos" in argv:
        VOS_NAME = argv[argv.index("--vos") + 1]
    stages = [a for a in argv if a in STAGES] or list(STAGES)
    enable_compile_cache()
    for name in stages:
        log.info(f"=== stage {name} ===")
        STAGES[name](force)


if __name__ == "__main__":
    main()
