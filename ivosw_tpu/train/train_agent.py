"""Agent Q-learning: ε-greedy rollouts + replay updates.

Capability parity with reference ``train_agent.py``: phase 'train', seed
2019, 5 epochs; memory pool bootstrapped from ``train/pretrain.csv`` with the
``sample_th`` quality-range filter, the training set restricted to surviving
sequences (``train_agent.py:92-95``); setting forced to oracle, method ours
(``:96-97``); ε-greedy agent actions; at each episode end 3·rounds−1 replay
Q-updates (``utils/utils_agent.py:244-252``); agent checkpoint saved per
epoch.

CLI: ``python -m ivosw_tpu.train.train_agent [key=value ...]``
"""

from __future__ import annotations

import os

from ivosw_tpu.core.config import Config, load_config
from ivosw_tpu.data.registry import registry_from_config
from ivosw_tpu.eval.backbones import build_backbone
from ivosw_tpu.interact.recommend import RewardTable
from ivosw_tpu.models.agent import Agent
from ivosw_tpu.train.rollout import run_interactive_phase
from ivosw_tpu.utils.checkpoint import (
    clear_agent_epoch_snapshots,
    latest_agent_epoch,
    restore_agent,
    save_agent_checkpoint,
)


def configure(cfg: Config) -> Config:
    cfg.phase = "train"
    cfg.seed = 2019
    cfg.num_epochs = cfg.num_epochs if cfg.num_epochs > 1 else 5
    cfg.setting = "oracle"
    cfg.method = "ours"
    return cfg


def run(cfg: Config, registry=None, adapter=None, reward_table=None,
        expected_count=None, log=None):
    registry = registry or registry_from_config(cfg)
    adapter = adapter or build_backbone(cfg, registry)
    save_dir = cfg.agent.save_result_dir

    if reward_table is None:
        reward_csv = os.path.join(save_dir, cfg.agent.reward_csv)
        reward_table = RewardTable.from_csv(reward_csv)

    agent = Agent(cfg)
    pretrain_csv = os.path.join(save_dir, cfg.agent.pretrain_csv)
    seq_list = agent.memory_pool.load_from_csv(
        pretrain_csv, report_save_dir=save_dir, sample_th=cfg.agent.sample_th
    )

    # Mid-train resume (hosts are ephemeral): per-epoch snapshots are the
    # resume points; the plain agent.orbax is written ONLY on completion so
    # a killed run can never masquerade as a finished one to skip-if-exists
    # pipeline logic (scripts/demo_ordering.py::stage_agent).
    start_epoch = 1
    last = latest_agent_epoch(cfg.ckpt_dir)
    if last is not None and restore_agent(
        agent, cfg.ckpt_dir, name=f"agent_epoch_{last}"
    ):
        start_epoch = last + 1
        (log.info if log else print)(
            f"resuming agent training from epoch snapshot {last} "
            f"(steps_done={agent.steps_done})"
        )

    def on_epoch_end(epoch):
        save_agent_checkpoint(agent, cfg.ckpt_dir, epoch=epoch)

    stats = run_interactive_phase(
        cfg,
        registry,
        adapter,
        agent,
        reward_table=reward_table,
        subset=cfg.data.subset,
        seq_list=seq_list,
        expected_count=expected_count,
        log=log,
        on_epoch_end=on_epoch_end,
        start_epoch=start_epoch,
    )
    save_agent_checkpoint(agent, cfg.ckpt_dir)
    # snapshots only ever exist for an in-flight run (ADVICE r4): a stale
    # set would make a forced retrain resume past num_epochs and no-op
    clear_agent_epoch_snapshots(cfg.ckpt_dir)
    return stats, agent


def main(argv=None):
    import sys

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    argv = argv if argv is not None else sys.argv[1:]
    cfg = configure(load_config("configs/config.yaml", [a for a in argv if "=" in a]))
    return run(cfg, expected_count=30)


if __name__ == "__main__":
    main()
