"""Eval-only artifact for the session-knob matrix (VERDICT r3, item #7).

``allow_repeat`` and ``max_time_per_interaction`` are wired through
:mod:`ivosw_tpu.eval.eval_agent` and unit-tested (tests/test_session_knobs.py)
but no committed results artifact ran them explicitly. This script re-runs
the wild/ours evaluation over the committed default-tier weights in three
knob configurations (reference semantics: eval_agent_atnet.py:121,146 allows
repeats for ours/random and forbids them for worst/linspace; the
davisinteractive session's ``max_time`` is a per-object wall-clock budget):

    ours            allow_repeat=1, max_time_per_interaction=30  (reference-style)
    ours-norepeat   allow_repeat=0                               (knob flipped)
    ours-budget     allow_repeat=1, max_time_per_interaction ~0  (budget truncates)

-> results/tapnet/wild/synthetic-repeat/{cell}/summary.json

The first two cells measure what frame-revisit freedom is worth to the
policy; the third demonstrates the time budget actually truncates sessions
(its summary reports fewer interaction rounds). Needs phase-A weights.

Usage: python scripts/demo_repeat.py [--force]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import demo_ordering as demo  # noqa: E402  (scripts/ sibling import)
from ivosw_tpu.utils.misc import create_stream_logger, enable_compile_cache  # noqa: E402

log = create_stream_logger("repeat")

# (cell name, allow_repeat, max_time_per_interaction seconds)
CELLS = [
    ("ours", 1, 30),
    ("ours-norepeat", 0, 0),
    ("ours-budget", 1, 1),
]


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    force = "--force" in argv
    enable_compile_cache()
    from ivosw_tpu.eval.eval_agent import evaluate
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.utils.checkpoint import (
        load_assess_variables_ckpt,
        restore_agent,
    )

    reg = demo.registry()
    results = {}
    for cell, allow_repeat, max_time in CELLS:
        report_dir = os.path.join(
            "results", "tapnet", "wild", "synthetic-repeat", cell
        )
        summary_path = os.path.join(report_dir, "summary.json")
        if os.path.exists(summary_path) and not force:
            with open(summary_path) as fp:
                results[cell] = json.load(fp)["auc"]
            log.info(f"skip {cell} (summary exists)")
            continue
        cfg = demo.base_config()
        cfg.setting, cfg.method = "wild", "ours"
        cfg.davis_interactive.allow_repeat = allow_repeat
        cfg.davis_interactive.max_time_per_interaction = max_time
        agent = Agent(cfg)
        wild_dir = os.path.join(demo.CKPT_DIR, "wild")
        ckpt = wild_dir if os.path.exists(
            os.path.join(wild_dir, "agent.orbax")
        ) else demo.CKPT_DIR
        assert restore_agent(agent, ckpt), "agent checkpoint missing"
        assess_variables = load_assess_variables_ckpt(demo.CKPT_DIR)
        assert assess_variables is not None, "assess checkpoint missing"
        summary = evaluate(
            cfg,
            reg,
            demo.adapter(reg),
            agent=agent,
            assess_variables=assess_variables,
            subset="val",
            max_nb_interactions=8,
            report_save_dir=report_dir,
            vos_name="tapnet",
        )
        results[cell] = summary["auc"]
        log.info(f"{cell}: auc={summary['auc']:.4f}")

    log.info("=== session-knob matrix ===")
    for cell, auc in results.items():
        log.info(f"  {cell:14s} auc={auc:.4f}")


if __name__ == "__main__":
    main()
