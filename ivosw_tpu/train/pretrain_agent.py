"""Agent pretraining data collection: random policy + real Eq.3 rewards.

Capability parity with reference ``pretrain_agent.py``: phase 'pretrain',
seed 2021, 10 epochs of method=random rollouts with the reward table loaded
from ``train/reward.csv`` (so reward_done is the real normalised terminal
reward), transitions mirrored to ``train/pretrain.csv``. No gradient updates
occur — the phase gate in agent_business only trains in phase 'train'
(reference utils/utils_agent.py:244-252).

CLI: ``python -m ivosw_tpu.train.pretrain_agent [key=value ...]``
"""

from __future__ import annotations

import os

from ivosw_tpu.core.config import Config, load_config
from ivosw_tpu.data.registry import registry_from_config
from ivosw_tpu.eval.backbones import build_backbone
from ivosw_tpu.interact.recommend import RewardTable
from ivosw_tpu.models.agent import Agent
from ivosw_tpu.train.rollout import run_interactive_phase


def configure(cfg: Config) -> Config:
    cfg.phase = "pretrain"
    cfg.seed = 2021
    cfg.num_epochs = cfg.num_epochs if cfg.num_epochs > 1 else 10
    cfg.setting = "wild"
    cfg.method = "random"
    return cfg


def run(cfg: Config, registry=None, adapter=None, reward_table=None,
        expected_count=None, log=None):
    registry = registry or registry_from_config(cfg)
    adapter = adapter or build_backbone(cfg, registry)
    if reward_table is None:
        reward_csv = os.path.join(cfg.agent.save_result_dir, cfg.agent.reward_csv)
        reward_table = RewardTable.from_csv(reward_csv)
    agent = Agent(cfg)
    agent.memory_pool.basename_csv = cfg.agent.pretrain_csv
    stats = run_interactive_phase(
        cfg,
        registry,
        adapter,
        agent,
        reward_table=reward_table,
        subset=cfg.data.subset,
        expected_count=expected_count,
        log=log,
    )
    return stats, agent


def main(argv=None):
    import sys

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    argv = argv if argv is not None else sys.argv[1:]
    cfg = configure(load_config("configs/config.yaml", [a for a in argv if "=" in a]))
    # the reference pins 30 baseline episodes per key (utils/utils_agent.py:20)
    return run(cfg, expected_count=30)


if __name__ == "__main__":
    main()
