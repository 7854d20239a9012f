"""Multi-seed + smoothing-ablation evaluation of the committed demo weights.

The round-2 capability demonstration rests on ONE registry seed (seed 0,
24 val episodes) with a wild ours-vs-worst margin of ~0.007 against a
measured ±0.004 noise band for saturated tasks. This script re-runs the
*evaluation stage only* (training artifacts are reused — the backbone/QA
nets were trained on the generator POOL, not the fixed registry, so unseen
registry seeds are in-distribution by construction) to show the ordering is
a property of the method, not one draw:

- ``seeds``: evaluate all six setting×method configs on fresh
  ``demo_registry(seed=N)`` val splits → ``results/tapnet/{setting}/
  synthetic-seed{N}/{method}/summary.json``.
- ``smooth1``: re-run the wild configs that consume AssessNet quality
  (ours/worst) with ``assess_net.smooth_quality=1`` (the reference's
  default — no smoothing) → ``results/tapnet/wild/synthetic-smooth1/...``,
  so how much of the wild margin is the Q-policy vs the smoothing knob is
  measurable (VERDICT r2, Missing #2 / Weak #3).

Usage: python scripts/demo_multiseed.py [seeds|smooth1 ...] [--tier hd]
Defaults to both jobs at the default tier.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import demo_ordering as demo  # noqa: E402  (scripts/ sibling import)
from ivosw_tpu.utils.misc import create_stream_logger, enable_compile_cache  # noqa: E402

log = create_stream_logger("multiseed")

EXTRA_SEEDS = [1, 2]


def _load_models(cfg, setting, method):
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.utils.checkpoint import (
        load_assess_variables_ckpt,
        restore_agent,
    )

    agent = None
    assess_variables = None
    if method == "ours":
        agent = Agent(cfg)
        # mirror stage_evaluate: wild evaluation uses the wild-state
        # fine-tuned agent when that stage produced one
        ckpt = demo.CKPT_DIR
        wild_dir = os.path.join(demo.CKPT_DIR, "wild")
        if setting == "wild" and os.path.exists(
            os.path.join(wild_dir, "agent.orbax")
        ):
            ckpt = wild_dir
        assert restore_agent(agent, ckpt), "agent checkpoint missing"
    if setting == "wild" and method in ("ours", "worst"):
        assess_variables = load_assess_variables_ckpt(demo.CKPT_DIR)
        assert assess_variables is not None, "assess checkpoint missing"
    return agent, assess_variables


def _evaluate(cfg, reg, setting, method, report_dir, force=False):
    from ivosw_tpu.eval.eval_agent import evaluate

    if os.path.exists(os.path.join(report_dir, "summary.json")) and not force:
        with open(os.path.join(report_dir, "summary.json")) as fp:
            return json.load(fp)["auc"]
    cfg.setting, cfg.method = setting, method
    agent, assess_variables = _load_models(cfg, setting, method)
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
    return summary["auc"]


def job_seeds(force=False):
    from ivosw_tpu.data.demo import demo_registry

    results = {}
    for seed in EXTRA_SEEDS:
        reg = demo_registry(seed=seed, spec=demo.spec())
        for setting, method in demo.EVAL_CONFIGS:
            report_dir = os.path.join(
                "results", "tapnet", setting,
                f"{demo.RESULTS_DATASET}-seed{seed}", method,
            )
            auc = _evaluate(
                demo.base_config(), reg, setting, method, report_dir, force
            )
            results[(seed, setting, method)] = auc
            log.info(f"seed{seed} {setting}/{method}: auc={auc:.4f}")
    log.info("=== per-seed ordering ===")
    for (seed, setting, method), auc in sorted(results.items()):
        log.info(f"  seed{seed} {setting:6s} {method:9s} auc={auc:.4f}")
    return results


def job_smooth1(force=False):
    """Wild ours/worst with smoothing OFF (reference default)."""
    reg = demo.registry()
    results = {}
    for method in ("worst", "ours"):
        cfg = demo.base_config()
        cfg.assess_net.smooth_quality = 1
        report_dir = os.path.join(
            "results", "tapnet", "wild",
            f"{demo.RESULTS_DATASET}-smooth1", method,
        )
        auc = _evaluate(cfg, reg, "wild", method, report_dir, force)
        results[method] = auc
        log.info(f"smooth1 wild/{method}: auc={auc:.4f}")
    return results


def main(argv=None):
    global EXTRA_SEEDS
    argv = argv if argv is not None else sys.argv[1:]
    force = "--force" in argv
    if "--tier" in argv:
        demo.set_tier(argv[argv.index("--tier") + 1])
    if "--seeds" in argv:
        # every integer after --seeds (until the next flag) overrides the
        # default seed list, e.g. `--seeds 3 4 5` for the round-4 widening
        # of the wild blind-vs-quality comparison (VERDICT r3, Weak #4)
        tail = argv[argv.index("--seeds") + 1:]
        EXTRA_SEEDS = []
        for a in tail:
            if not a.lstrip("-").isdigit() or a.startswith("--"):
                break
            EXTRA_SEEDS.append(int(a))
        jobs_default = ["seeds"]
    else:
        jobs_default = ["seeds", "smooth1"]
    jobs = [a for a in argv if a in ("seeds", "smooth1")] or jobs_default
    enable_compile_cache()
    for name in jobs:
        log.info(f"=== job {name} ===")
        {"seeds": job_seeds, "smooth1": job_smooth1}[name](force)


if __name__ == "__main__":
    main()
