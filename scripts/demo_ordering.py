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
    agent    -> weights_demo/agent.orbax           (12-epoch oracle Q-learning)
    agent_wild -> weights_demo/wild/agent.orbax    (wild-state fine-tune)
    evaluate -> results/tapnet/{setting}/synthetic/{method}/summary.json

Usage: python scripts/demo_ordering.py [stage ...] [--force] [--tier hd]

Tiers (see ivosw_tpu/data/demo.py::DemoSpec):
    default  48×64, 2 objects   -> weights_demo/ train_demo/ results/.../synthetic/
    hd       192×256, 3 objects -> weights_demo_hd/ train_demo_hd/
                                   results/.../synthetic-hd/
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ivosw_tpu.utils.misc import create_stream_logger, enable_compile_cache

TIER = "default"
CKPT_DIR = "weights_demo"
TRAIN_DIR = "train_demo"
QA_DIR = os.path.join(TRAIN_DIR, "quality_assessment")
RESULTS_DATASET = "synthetic"
POOL_CLIPS = 160
VOS_STEPS = 6000
EVAL_CONFIGS = [
    ("oracle", "worst"),
    ("oracle", "ours"),
    ("wild", "random"),
    ("wild", "linspace"),
    ("wild", "worst"),
    ("wild", "ours"),
]

log = create_stream_logger("demo")


def set_tier(tier: str):
    """Point every stage's paths + generator spec at one tier."""
    global TIER, CKPT_DIR, TRAIN_DIR, QA_DIR, RESULTS_DATASET, POOL_CLIPS
    global VOS_STEPS
    TIER = tier
    if tier == "default":
        CKPT_DIR, TRAIN_DIR, RESULTS_DATASET = "weights_demo", "train_demo", "synthetic"
        POOL_CLIPS = 160
        VOS_STEPS = 6000
    elif tier == "hd":
        CKPT_DIR, TRAIN_DIR = "weights_demo_hd", "train_demo_hd"
        RESULTS_DATASET = "synthetic-hd"
        # 16× the pixels per clip: 96 pool clips keep host generation time
        # and the QA dump volume tractable while still being 8× the fixed
        # registry's diversity
        POOL_CLIPS = 96
        # 16× the pixels per step also means faster per-step convergence
        # (objects span many more pixels); measured: HD loss at step 450
        # is where the default tier sits at ~1500. 3500 steps keep the
        # backbone stage inside the tier's wall-clock budget
        VOS_STEPS = 3500
    else:
        raise SystemExit(f"unknown tier: {tier} (default|hd)")
    QA_DIR = os.path.join(TRAIN_DIR, "quality_assessment")


def spec():
    from ivosw_tpu.data.demo import DEFAULT_SPEC, HD_SPEC

    return HD_SPEC if TIER == "hd" else DEFAULT_SPEC


VOS_NAME = "tapnet"


def set_vos(name: str):
    """Select the backbone family the train/evaluate stages target.

    The QA/RL stages stay tapnet-trained regardless: the reference's own
    claim is that ONE trained agent transfers across VOS backbones (its
    results table evaluates the same policy on ATNet/MANet/IPN), so the
    non-tapnet demos reuse the committed agent + AssessNet and swap only
    the segmentation backbone."""
    global VOS_NAME
    if name not in ("tapnet", "matchnet", "ipnet"):
        raise SystemExit(f"unknown vos: {name}")
    VOS_NAME = name


def base_config():
    from ivosw_tpu.core.config import Config

    cfg = Config(seed=0, vos=VOS_NAME, dataset="synthetic", ckpt_dir=CKPT_DIR)
    cfg.data.subset = "train"
    # half the 48-frame clips: 5 rounds on 24 frames puts training in the
    # same scarce-budget regime as evaluation (8 rounds on 48), and a window
    # almost always spans a hard band plus clean stretches
    cfg.data.len_subseq = 24
    cfg.agent.save_result_dir = TRAIN_DIR
    cfg.davis_interactive.max_nb_interactions = 5
    # from-scratch QA training needs a real learning rate (the reference's
    # 5e-6 assumes an ImageNet-pretrained trunk)
    cfg.assess_net.lr = 2e-4
    # denoise the wild-state quality curve (demo-scale QA model: held-out
    # per-frame corr ~0.7 vs the reference's pretrained AssessNet)
    cfg.assess_net.smooth_quality = 3
    return cfg


def registry():
    from ivosw_tpu.data.demo import demo_registry

    return demo_registry(seed=0, spec=spec())


def adapter(reg):
    from ivosw_tpu.eval.backbones import build_backbone

    return build_backbone(base_config(), reg)


def training_pool():
    from ivosw_tpu.data.demo import demo_training_registry

    return demo_training_registry(n_clips=POOL_CLIPS, seed=1, spec=spec())


def stage_tapnet(reg, force):
    out = os.path.join(CKPT_DIR, f"{VOS_NAME}.orbax")
    if os.path.exists(out) and not force:
        return log.info(f"skip {VOS_NAME} ({out} exists)")
    from ivosw_tpu.train import train_vos

    cfg = base_config()
    # appearance training draws from the 160-clip generator pool, never the
    # fixed eval clips — a from-scratch net memorises 12 clips (measured)
    # resume_path: snapshot every 500 steps so a killed run (session cut,
    # host restart) loses minutes, not the whole stage; the stage-complete
    # marker stays the final checkpoint, so skip-if-exists logic is unchanged
    train_vos.run(
        cfg, registry=training_pool(), num_steps=VOS_STEPS, window=5, lr=3e-4,
        save_every=500, round2_prob=0.5,
        resume_path=os.path.join(CKPT_DIR, f"{VOS_NAME}.partial.orbax"),
    )


def _qa_registry_stamp():
    """Fingerprint of the generator config feeding the QA dumps — stale
    dumps from an earlier registry design reuse the same dmx-NNNN names,
    so resume-by-existence alone would silently mix old prob maps with new
    labels (cost one confusing eval round)."""
    from ivosw_tpu.data import demo

    sp = spec()
    return {
        "generator": "demo_training_registry",
        "n_clips": POOL_CLIPS,
        "seed": 1,
        "clip": [sp.num_frames, sp.h, sp.w, sp.num_objects],
        "max_rounds": base_config().davis_interactive.max_nb_interactions,
    }


def stage_qadata(reg, force):
    from ivosw_tpu.train import generate_qa_data

    # the dumps exist ONLY to feed stage_assess (probe_qa scores val clips
    # live, no dumps); on a fresh host where the trained assess checkpoint
    # was committed/restored but the bulky dump tree was not, regenerating
    # ~1 h of PNGs would be pure waste
    assess_out = os.path.join(CKPT_DIR, "assess_net.orbax")
    if os.path.exists(assess_out) and not os.path.isdir(QA_DIR) and not force:
        return log.info(
            "skip qadata (assess_net checkpoint exists and no dump tree; "
            "dumps only feed stage_assess)"
        )
    pool = training_pool()
    cfg = generate_qa_data.configure(base_config())
    stamp_path = os.path.join(QA_DIR, "registry_stamp.json")
    stamp = _qa_registry_stamp()
    if os.path.isdir(QA_DIR) and not force:
        on_disk = None
        if os.path.exists(stamp_path):
            with open(stamp_path) as fp:
                on_disk = json.load(fp)
        if on_disk != stamp:
            raise SystemExit(
                f"{QA_DIR} holds dumps from a different registry config "
                f"({on_disk} != {stamp}); delete the directory or rerun "
                f"with --force to regenerate"
            )
    # the dump layout is per-sequence (interaction-*/scribble-*/{seq}/...),
    # so the stage resumes sequence-by-sequence: QA-regressor correlation on
    # unseen clips scales with dump diversity (64 seqs -> corr 0.70; the
    # full pool is the budget ceiling). A sequence counts as done only when
    # its LAST interaction dir exists — a run killed mid-sequence leaves
    # interaction-1 populated and must be redone, not skipped forever.
    done = set()
    last_round = cfg.davis_interactive.max_nb_interactions
    probe = os.path.join(QA_DIR, f"interaction-{last_round}", "scribble-1")
    if os.path.isdir(probe) and not force:
        done = set(os.listdir(probe))
    samples = [
        (seq, 1) for seq in pool.subset("train") if seq not in done
    ]
    if not samples:
        return log.info(f"skip qadata ({QA_DIR} fully populated)")
    os.makedirs(QA_DIR, exist_ok=True)
    with open(stamp_path, "w") as fp:
        json.dump(stamp, fp)
    generate_qa_data.run(
        cfg, registry=pool, adapter=adapter(pool), samples=samples,
        save_result_dir=QA_DIR,
    )


def stage_assess_pretext(reg, force):
    """Synthetic-degradation pretext for the AssessNet trunk (opt-in).

    The from-scratch analogue of the reference's ImageNet-pretrained
    encoder (reference models/assessment.py:30-39): infinite labelled
    (degraded mask → true J&F) pairs from the generator pool widen the
    narrow session-dump error distribution that caps held-out corr ~0.7.
    stage_assess picks the checkpoint up automatically when present."""
    out = os.path.join(CKPT_DIR, "assess_pretext.orbax")
    if os.path.exists(out) and not force:
        return log.info(f"skip assess_pretext ({out} exists)")
    from ivosw_tpu.train import pretrain_assess

    pretrain_assess.run(base_config(), registry=training_pool(), num_steps=1500)


def stage_assess(reg, force):
    out = os.path.join(CKPT_DIR, "assess_net.orbax")
    if os.path.exists(out) and not force:
        return log.info(f"skip assess ({out} exists)")
    from ivosw_tpu.train import train_assess
    from ivosw_tpu.utils.checkpoint import load_pytree

    cfg = base_config()
    variables = load_pytree(os.path.join(CKPT_DIR, "assess_pretext.orbax"))
    if variables is not None:
        log.info("assess init: pretext checkpoint")
    # 3 epochs over the full 160-clip dump pool: clip diversity moves
    # held-out correlation more than extra passes over fewer clips.
    # resume_path: the HD tier's 3-epoch run outlives the host's RAM under
    # the tunnel client's per-transfer leak (OOM-killed ~1h45m in, observed
    # twice at epoch 3) — the snapshot lets the stage-retry loop finish the
    # run across process restarts instead of restarting at epoch 1
    train_assess.run(
        cfg, registry=training_pool(), save_result_dir=QA_DIR, num_epochs=3,
        variables=variables,
        resume_path=os.path.join(CKPT_DIR, "assess_net.partial.orbax"),
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

    if force:  # a forced retrain must not resume from in-flight snapshots
        from ivosw_tpu.utils.checkpoint import clear_agent_epoch_snapshots

        clear_agent_epoch_snapshots(CKPT_DIR)

    cfg = base_config()
    # demo-scale divergence from the reference's 5 epochs: 36 episodes/epoch
    # (12 seqs x 3 scribbles) is far less experience per epoch than DAVIS
    # train. 12 epochs measured best; 20 over-trains (oracle AUC 0.781 vs
    # 0.792 on the churn-free registry)
    cfg.num_epochs = 12
    cfg = train_agent.configure(cfg)
    train_agent.run(cfg, registry=reg, adapter=adapter(reg))


def stage_agent_wild(reg, force):
    """Fine-tune the oracle-trained agent on AssessNet-predicted states.

    The reference trains its agent on oracle (true-J&F) states only and
    evaluates it in the wild; with a demo-scale QA model (held-out corr
    ~0.7 vs the reference's ImageNet-pretrained AssessNet) that state
    distribution shift costs more than it does at DAVIS scale. Extension
    (documented in results/README.md): continue the same Q-learning loop
    with setting=wild so the policy net trains on the states it will be
    evaluated on — rewards still come from ground-truth J&F via the same
    baseline table. Oracle evaluation keeps the purely oracle-trained agent.
    """
    wild_dir = os.path.join(CKPT_DIR, "wild")
    if os.path.exists(os.path.join(wild_dir, "agent.orbax")) and not force:
        return log.info(f"skip agent_wild ({wild_dir} exists)")
    if force:  # forced rerun: restart from the oracle agent, not snapshots
        from ivosw_tpu.utils.checkpoint import clear_agent_epoch_snapshots

        clear_agent_epoch_snapshots(wild_dir)
    from ivosw_tpu.interact.recommend import RewardTable
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.train.rollout import run_interactive_phase
    from ivosw_tpu.utils.checkpoint import (
        load_assess_variables_ckpt,
        restore_agent,
        save_agent_checkpoint,
    )

    cfg = base_config()
    cfg.phase = "train"
    cfg.seed = 2018
    cfg.num_epochs = 8
    cfg.setting, cfg.method = "wild", "ours"
    agent = Agent(cfg)
    # Resume from the newest wild epoch snapshot when one exists (hosts are
    # ephemeral); otherwise start from the oracle-trained agent.
    from ivosw_tpu.utils.checkpoint import latest_agent_epoch

    start_epoch = 1
    last = latest_agent_epoch(wild_dir)
    if last is not None and restore_agent(
        agent, wild_dir, name=f"agent_epoch_{last}"
    ):
        start_epoch = last + 1
        log.info(f"agent_wild: resuming from epoch snapshot {last}")
    else:
        assert restore_agent(agent, CKPT_DIR), "oracle agent checkpoint missing"
    assess_variables = load_assess_variables_ckpt(CKPT_DIR)
    assert assess_variables is not None, "assess checkpoint missing"
    agent.memory_pool.load_from_csv(
        os.path.join(TRAIN_DIR, cfg.agent.pretrain_csv),
        report_save_dir=TRAIN_DIR,
        sample_th=cfg.agent.sample_th,
    )
    reward_table = RewardTable.from_csv(
        os.path.join(TRAIN_DIR, cfg.agent.reward_csv)
    )
    run_interactive_phase(
        cfg, reg, adapter(reg), agent,
        reward_table=reward_table, subset="train",
        assess_variables=assess_variables,
        on_epoch_end=lambda e: save_agent_checkpoint(agent, wild_dir, epoch=e),
        start_epoch=start_epoch,
    )
    save_agent_checkpoint(agent, wild_dir)
    # snapshots only ever exist for an in-flight run (ADVICE r4): leftovers
    # would make a --force rerun resume past num_epochs (zero epochs) and
    # skip the restore-from-oracle-agent path entirely
    from ivosw_tpu.utils.checkpoint import clear_agent_epoch_snapshots

    clear_agent_epoch_snapshots(wild_dir)


def stage_evaluate(reg, force):
    from ivosw_tpu.eval.eval_agent import evaluate
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.utils.checkpoint import (
        load_assess_variables_ckpt,
        restore_agent,
    )

    results = {}
    for setting, method in EVAL_CONFIGS:
        cfg = base_config()
        cfg.setting, cfg.method = setting, method
        report_dir = os.path.join(
            "results", VOS_NAME, setting, RESULTS_DATASET, method
        )
        if os.path.exists(os.path.join(report_dir, "summary.json")) and not force:
            with open(os.path.join(report_dir, "summary.json")) as fp:
                results[(setting, method)] = json.load(fp)["auc"]
            log.info(f"skip eval {setting}/{method} (summary exists)")
            continue
        agent = None
        assess_variables = None
        if method == "ours":
            agent = Agent(cfg)
            # wild evaluation uses the wild-state fine-tuned agent when the
            # stage has produced one (see stage_agent_wild); oracle always
            # uses the reference-style oracle-trained agent
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
            reg,
            adapter(reg),
            agent=agent,
            assess_variables=assess_variables,
            subset="val",
            max_nb_interactions=8,
            report_save_dir=report_dir,
            vos_name=VOS_NAME,
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
    "assess_pretext": stage_assess_pretext,
    "assess": stage_assess,
    "reward": stage_reward,
    "pretrain": stage_pretrain,
    "agent": stage_agent,
    "agent_wild": stage_agent_wild,
    "evaluate": stage_evaluate,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    force = "--force" in argv
    if "--tier" in argv:
        set_tier(argv[argv.index("--tier") + 1])
    if "--vos" in argv:
        set_vos(argv[argv.index("--vos") + 1])
    # All stages are default since round 3. assess_pretext lifted held-out
    # QA corr 0.70 -> 0.795; that better QA model lifted wild/worst to
    # 0.8409, erasing the oracle-trained agent's wild margin (0.8403) —
    # and agent_wild (fixed to record the same smoothed PREDICTED states
    # it acts on; round 2's version recorded true-J&F states and degraded)
    # restores it: wild/ours 0.8433. Training on the evaluation-time state
    # distribution is what the stage is for.
    default = list(STAGES)
    stages = [a for a in argv if a in STAGES] or default
    enable_compile_cache()
    reg = registry()
    for name in stages:
        log.info(f"=== stage {name} ===")
        STAGES[name](reg, force)


if __name__ == "__main__":
    main()
