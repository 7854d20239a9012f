"""Backbone factory: config name → adapter instance.

The reference selects backbones by running a different entry-point script per
backbone (eval_agent_{atnet,manet,ipn}.py); here it's one config key
(``cfg.vos``) resolving into the JAX-native backbone family.
"""

from __future__ import annotations

from ivosw_tpu.core.config import Config


def build_backbone(cfg: Config, registry):
    name = cfg.vos
    if name == "fake":
        from ivosw_tpu.models.vos.fake import FakeVOS

        return FakeVOS(registry)
    import jax.numpy as jnp

    # storage dtype of the prob maps the adapters hand to the QA pass
    # (cfg.assess_net.bf16_inputs); masks/metrics are computed before the
    # cast inside the adapters and do not move
    qa_dtype = (
        jnp.bfloat16
        if getattr(cfg.assess_net, "bf16_inputs", False)
        else jnp.float32
    )
    if name == "tapnet":
        from ivosw_tpu.models.vos.tapnet import TAPNetAdapter

        return TAPNetAdapter.create(
            seed=cfg.seed, ckpt_dir=cfg.ckpt_dir, qa_dtype=qa_dtype
        )
    if name == "matchnet":
        from ivosw_tpu.models.vos.matchnet import MatchNetAdapter

        return MatchNetAdapter.create(
            seed=cfg.seed, ckpt_dir=cfg.ckpt_dir, qa_dtype=qa_dtype
        )
    if name == "ipnet":
        from ivosw_tpu.models.vos.ipnet import IPNetAdapter

        return IPNetAdapter.create(
            seed=cfg.seed, ckpt_dir=cfg.ckpt_dir, qa_dtype=qa_dtype
        )
    raise NotImplementedError(f"unknown VOS backbone: {name}")
