"""End-to-end capability demonstration: train everything, show "ours" wins.

Reproduces — at demo scale, on the deterministic hard-band registry
(:mod:`ivosw_tpu.data.demo`) — the ordering the reference's BASELINE results
table exists to prove (reference ``results/**/summary.json``):

    wild:   ours > worst, random, linspace
    oracle: ours > worst

Stages (resumable; a stage is skipped when its artifact already exists):

    tapnet   -> weights_demo/tapnet.orbax          (train_vos, round-2 aware)
    qadata   -> train_demo/quality_assessment/     (oracle/worst prob dumps)
    assess   -> weights_demo/assess_net.orbax      (QA regression)
    reward   -> train_demo/reward.csv              (30-epoch random baseline)
    pretrain -> train_demo/pretrain.csv            (10-epoch experience)
    agent    -> weights_demo/agent.orbax           (5-epoch Q-learning)
    evaluate -> results/tapnet/{setting}/synthetic/{method}/summary.json

Usage: python scripts/demo_ordering.py [stage ...] [--force]
"""

from __future__ import annotations

import copy
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ivosw_tpu.utils.misc import create_stream_logger, enable_compile_cache

CKPT_DIR = "weights_demo"
TRAIN_DIR = "train_demo"
QA_DIR = os.path.join(TRAIN_DIR, "quality_assessment")
EVAL_CONFIGS = [
    ("oracle", "worst"),
    ("oracle", "ours"),
    ("wild", "random"),
    ("wild", "linspace"),
    ("wild", "worst"),
    ("wild", "ours"),
]

log = create_stream_logger("demo")


def base_config():
    from ivosw_tpu.core.config import Config

    cfg = Config(seed=0, vos="tapnet", dataset="synthetic", ckpt_dir=CKPT_DIR)
    cfg.data.subset = "train"
    # 1/3 of the 48-frame clips, mirroring the reference's 25-of-~70 ratio
    cfg.data.len_subseq = 16
    cfg.agent.save_result_dir = TRAIN_DIR
    cfg.davis_interactive.max_nb_interactions = 5
    # from-scratch QA training needs a real learning rate (the reference's
    # 5e-6 assumes an ImageNet-pretrained trunk)
    cfg.assess_net.lr = 2e-4
    return cfg


def registry():
    from ivosw_tpu.data.demo import demo_registry

    return demo_registry(seed=0)


def adapter(reg):
    from ivosw_tpu.models.vos.tapnet import TAPNetAdapter

    return TAPNetAdapter.create(ckpt_dir=CKPT_DIR)


def training_pool():
    from ivosw_tpu.data.demo import demo_training_registry

    return demo_training_registry(n_clips=160, seed=1)


def stage_tapnet(reg, force):
    out = os.path.join(CKPT_DIR, "tapnet.orbax")
    if os.path.exists(out) and not force:
        return log.info(f"skip tapnet ({out} exists)")
    from ivosw_tpu.train import train_vos

    cfg = base_config()
    # appearance training draws from the 160-clip generator pool, never the
    # fixed eval clips — a from-scratch net memorises 12 clips (measured)
    train_vos.run(
        cfg, registry=training_pool(), num_steps=6000, window=5, lr=3e-4,
        save_every=1000, round2_prob=0.5,
    )


def stage_qadata(reg, force):
    if os.path.isdir(QA_DIR) and os.listdir(QA_DIR) and not force:
        return log.info(f"skip qadata ({QA_DIR} populated)")
    from ivosw_tpu.train import generate_qa_data

    pool = training_pool()
    cfg = generate_qa_data.configure(base_config())
    samples = [(seq, 1) for seq in pool.subset("train")[:24]]
    generate_qa_data.run(
        cfg, registry=pool, adapter=adapter(pool), samples=samples,
        save_result_dir=QA_DIR,
    )


def stage_assess(reg, force):
    out = os.path.join(CKPT_DIR, "assess_net.orbax")
    if os.path.exists(out) and not force:
        return log.info(f"skip assess ({out} exists)")
    from ivosw_tpu.train import train_assess

    cfg = base_config()
    train_assess.run(
        cfg, registry=training_pool(), save_result_dir=QA_DIR, num_epochs=4
    )


def stage_reward(reg, force):
    out = os.path.join(TRAIN_DIR, "reward.csv")
    if os.path.exists(out) and not force:
        return log.info(f"skip reward ({out} exists)")
    from ivosw_tpu.train import produce_reward

    cfg = produce_reward.configure(base_config())
    produce_reward.run(cfg, registry=reg, adapter=adapter(reg))


def stage_pretrain(reg, force):
    out = os.path.join(TRAIN_DIR, "pretrain.csv")
    if os.path.exists(out) and not force:
        return log.info(f"skip pretrain ({out} exists)")
    from ivosw_tpu.train import pretrain_agent

    cfg = pretrain_agent.configure(base_config())
    pretrain_agent.run(cfg, registry=reg, adapter=adapter(reg))


def stage_agent(reg, force):
    out = os.path.join(CKPT_DIR, "agent.orbax")
    if os.path.exists(out) and not force:
        return log.info(f"skip agent ({out} exists)")
    from ivosw_tpu.train import train_agent

    cfg = train_agent.configure(base_config())
    train_agent.run(cfg, registry=reg, adapter=adapter(reg))


def stage_evaluate(reg, force):
    import jax

    from ivosw_tpu.eval.eval_agent import evaluate
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.models.assess import init_assess_variables
    from ivosw_tpu.utils.checkpoint import (
        load_assess_variables_ckpt,
        restore_agent,
    )

    results = {}
    for setting, method in EVAL_CONFIGS:
        cfg = base_config()
        cfg.setting, cfg.method = setting, method
        report_dir = os.path.join("results", "tapnet", setting, "synthetic", method)
        if os.path.exists(os.path.join(report_dir, "summary.json")) and not force:
            with open(os.path.join(report_dir, "summary.json")) as fp:
                results[(setting, method)] = json.load(fp)["auc"]
            log.info(f"skip eval {setting}/{method} (summary exists)")
            continue
        agent = None
        assess_variables = None
        if method == "ours":
            agent = Agent(cfg)
            assert restore_agent(agent, CKPT_DIR), "agent checkpoint missing"
        if setting == "wild" and method in ("ours", "worst"):
            assess_variables = load_assess_variables_ckpt(CKPT_DIR)
            assert assess_variables is not None, "assess checkpoint missing"
        summary = evaluate(
            cfg,
            reg,
            adapter(reg),
            agent=agent,
            assess_variables=assess_variables,
            subset="val",
            max_nb_interactions=8,
            report_save_dir=report_dir,
            vos_name="tapnet",
        )
        results[(setting, method)] = summary["auc"]
        log.info(f"eval {setting}/{method}: auc={summary['auc']:.4f}")

    log.info("=== ordering ===")
    for (setting, method), auc in sorted(results.items()):
        log.info(f"  {setting:6s} {method:9s} auc={auc:.4f}")
    return results


STAGES = {
    "tapnet": stage_tapnet,
    "qadata": stage_qadata,
    "assess": stage_assess,
    "reward": stage_reward,
    "pretrain": stage_pretrain,
    "agent": stage_agent,
    "evaluate": stage_evaluate,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    force = "--force" in argv
    stages = [a for a in argv if a in STAGES] or list(STAGES)
    enable_compile_cache()
    reg = registry()
    for name in stages:
        log.info(f"=== stage {name} ===")
        STAGES[name](reg, force)


if __name__ == "__main__":
    main()
