"""Reward-baseline production: random-policy episodes → reward table CSV.

Capability parity with reference ``produce_reward.py``: phase 'baseline',
seed 2020, 30 epochs of method=random rollouts over the train subset with
25-frame subsequences; every transition is mirrored to
``train/reward.csv`` (memory-pool schema). The resulting per-(sequence,
round, scribble-parity) terminal-quality records are the μ/σ baseline that
``goal_only_reward`` Eq.3 normalises against.

CLI: ``python -m ivosw_tpu.train.produce_reward [key=value ...]``
"""

from __future__ import annotations

from ivosw_tpu.core.config import Config, load_config
from ivosw_tpu.data.registry import registry_from_config
from ivosw_tpu.eval.backbones import build_backbone
from ivosw_tpu.models.agent import Agent
from ivosw_tpu.train.rollout import run_interactive_phase


def configure(cfg: Config) -> Config:
    cfg.phase = "baseline"
    cfg.seed = 2020
    cfg.num_epochs = cfg.num_epochs if cfg.num_epochs > 1 else 30
    cfg.setting = "wild"
    cfg.method = "random"
    return cfg


def run(cfg: Config, registry=None, adapter=None, log=None):
    registry = registry or registry_from_config(cfg)
    adapter = adapter or build_backbone(cfg, registry)
    agent = Agent(cfg)
    agent.memory_pool.basename_csv = cfg.agent.reward_csv
    stats = run_interactive_phase(
        cfg, registry, adapter, agent, reward_table=None, subset=cfg.data.subset,
        log=log,
    )
    return stats, agent


def main(argv=None):
    import sys

    from ivosw_tpu.utils.misc import enable_compile_cache

    enable_compile_cache()

    argv = argv if argv is not None else sys.argv[1:]
    cfg = configure(load_config("configs/config.yaml", [a for a in argv if "=" in a]))
    return run(cfg)


if __name__ == "__main__":
    main()
