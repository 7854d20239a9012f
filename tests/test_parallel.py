"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest


def test_make_mesh_shapes(eight_devices):
    from ivosw_tpu.parallel.mesh import make_mesh

    mesh1 = make_mesh(("data",), devices=eight_devices)
    assert mesh1.shape["data"] == 8
    mesh2 = make_mesh(("data", "model"), devices=eight_devices)
    assert mesh2.shape["data"] * mesh2.shape["model"] == 8
    assert mesh2.shape["model"] == 4


def test_sharded_dqn_update_matches_single_device(eight_devices):
    """DP-sharded Q-update must produce the same loss as unsharded."""
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.models.agent import dqn_update_step, make_optimizer
    from ivosw_tpu.models.brain import init_brain_params
    from ivosw_tpu.parallel.mesh import make_mesh, replicate, shard_batch

    rng = np.random.default_rng(0)
    b, t = 8, 8
    batch = {
        "action": rng.integers(0, t, b).astype(np.int32),
        "reward_step": rng.choice([-1.0, 1.0], b).astype(np.float32),
        "reward_done": rng.normal(size=b).astype(np.float32),
        "old_state_iou": rng.random((b, t)).astype(np.float32),
        "new_state_iou": rng.random((b, t)).astype(np.float32),
        "annotated_frames": np.zeros((b, t), np.float32),
        "next_annotated_frames": np.ones((b, t), np.float32),
    }
    params = init_brain_params(jax.random.PRNGKey(0))
    target = init_brain_params(jax.random.PRNGKey(1))
    optimizer = make_optimizer(5e-6, 5e-4)

    opt_state = optimizer.init(params)
    device_batch = {k: jnp.asarray(v) for k, v in batch.items()}
    p1, _, loss_single = dqn_update_step(
        jax.tree.map(jnp.copy, params), target, opt_state, device_batch, 0.95, optimizer
    )

    mesh = make_mesh(("data",))
    with mesh:
        params_r = replicate(mesh, params)
        target_r = replicate(mesh, target)
        opt_state_r = replicate(mesh, optimizer.init(params))
        batch_s = shard_batch(mesh, batch)
        p2, _, loss_sharded = dqn_update_step(
            params_r, target_r, opt_state_r, batch_s, 0.95, optimizer
        )
    # cross-shard reduction order differs: agreement to float32 roundoff
    np.testing.assert_allclose(
        float(loss_single), float(loss_sharded), rtol=1e-6
    )
    for a, b_ in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-6)


def test_assess_param_shardings_rule(eight_devices):
    import jax

    from ivosw_tpu.models.assess import init_assess_variables
    from ivosw_tpu.parallel.mesh import assess_param_shardings, make_mesh

    mesh = make_mesh(("data", "model"), devices=eight_devices)
    variables = init_assess_variables(jax.random.PRNGKey(0))
    shardings = assess_param_shardings(mesh, variables)
    conv1 = shardings["params"]["conv1"]["kernel"]
    # conv kernels shard output channels over 'model'
    assert conv1.spec == jax.sharding.PartitionSpec(None, None, None, "model")


@pytest.mark.parametrize("method", ["worst", "random"])
def test_dp_eval_sweep_equals_single_device(eight_devices, tmp_path, method):
    """The 8-device sequences-sharded sweep must reproduce the single-device
    curve exactly — including method=random, whose decisions derive from
    per-sample RNG and are therefore shard-invariant."""
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.data.registry import SequenceRegistry
    from ivosw_tpu.eval.eval_agent import evaluate, evaluate_dp
    from ivosw_tpu.models.vos.fake import FakeVOS

    registry = SequenceRegistry.synthetic(
        ["p-a", "p-b", "p-c"], num_frames=6, image_size=(48, 40),
        num_objects=2, seed=5,
    )
    setting = "oracle" if method == "worst" else "wild"
    cfg = Config(seed=0, setting=setting, method=method, vos="fake")
    cfg.davis_interactive.allow_repeat = 0

    single = evaluate(
        cfg,
        registry,
        FakeVOS(registry, max_quality=0.8),
        max_nb_interactions=3,
        report_save_dir=str(tmp_path / "single"),
        vos_name="fake",
    )
    sharded = evaluate_dp(
        cfg,
        registry,
        lambda: FakeVOS(registry, max_quality=0.8),
        n_shards=8,
        devices=eight_devices,
        max_nb_interactions=3,
        report_save_dir=str(tmp_path / "dp"),
        vos_name="fake",
    )
    np.testing.assert_allclose(
        sharded["curve"]["J_AND_F"], single["curve"]["J_AND_F"], atol=1e-12
    )
    assert sharded["auc"] == pytest.approx(single["auc"], abs=1e-12)
    import json as _json

    with open(tmp_path / "dp" / "summary.json") as fp:
        on_disk = _json.load(fp)
    assert on_disk["auc"] == pytest.approx(single["auc"], abs=1e-12)
