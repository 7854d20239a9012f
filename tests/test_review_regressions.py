"""Regression tests for code-review findings: training rollouts with REAL
backbones (frames must load), donation-safe checkpoint restore, gated
AssessNet updates on all-invalid batches, per-frame MatchNet global maps."""

import numpy as np
import pytest

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.registry import SequenceRegistry


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["rr-a"], num_frames=4, image_size=(64, 48), num_objects=1,
        split="train", seed=11,
    )


def test_training_rollout_with_real_backbone(registry, tmp_path):
    """produce_reward with TAPNet (not the gt-fake) must load frames and run
    (previously crashed: frames_original stayed None for non-wild phases)."""
    from ivosw_tpu.models.vos.tapnet import TAPNetAdapter, init_tapnet_params
    from ivosw_tpu.train import produce_reward

    cfg = produce_reward.configure(Config())
    cfg.num_epochs = 1
    cfg.data.len_subseq = 3
    cfg.davis_interactive.max_nb_interactions = 2
    cfg.agent.save_result_dir = str(tmp_path / "train")
    adapter = TAPNetAdapter(init_tapnet_params(0, hw=(48, 64)), encode_chunk=4)
    stats, agent = produce_reward.run(cfg, registry=registry, adapter=adapter)
    assert stats["episodes"] >= 1


def test_restore_agent_survives_donating_update(tmp_path):
    """After restore, params and target_params must NOT alias: the jitted
    update donates params buffers."""
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.utils.checkpoint import restore_agent, save_agent_checkpoint

    cfg = Config(phase="train")
    agent = Agent(cfg, seed=0)
    save_agent_checkpoint(agent, str(tmp_path))

    fresh = Agent(cfg, seed=99)
    assert restore_agent(fresh, str(tmp_path))

    rng = np.random.default_rng(0)
    batch = {
        "action": rng.integers(0, 5, 4).astype(np.int32),
        "reward_step": np.ones(4, np.float32),
        "reward_done": np.ones(4, np.float32),
        "old_state_iou": rng.random((4, 5)).astype(np.float32),
        "new_state_iou": rng.random((4, 5)).astype(np.float32),
        "annotated_frames": np.zeros((4, 5), np.float32),
        "next_annotated_frames": np.ones((4, 5), np.float32),
    }
    # two updates: the second reads target_params AFTER params were donated
    l1 = fresh.update_agent(dict(batch))
    l2 = fresh.update_agent(dict(batch))
    assert np.isfinite([l1, l2]).all()


def test_assess_update_gated_on_invalid_batch():
    """All-invalid batch (empty label∪mask) must leave params AND the
    momentum trace untouched (previously weight decay still applied)."""
    import jax
    import jax.numpy as jnp

    from ivosw_tpu.models.assess import init_assess_variables
    from ivosw_tpu.train.train_assess import assess_train_step, make_assess_optimizer

    variables = init_assess_variables(jax.random.PRNGKey(0))
    before = jax.tree.map(lambda x: np.asarray(x).copy(), variables["params"])
    optimizer = make_assess_optimizer(0.9, 5e-4)
    opt_state = optimizer.init(variables["params"])

    b, h, w = 2, 64, 64
    batch = {
        "img": jnp.zeros((b, h, w, 3), jnp.float32),
        "prob": jnp.zeros((b, h, w), jnp.float32),  # nothing above threshold
        "label": jnp.zeros((b, h, w), jnp.int32),   # empty labels
    }
    variables, opt_state, loss, diff, n_valid = assess_train_step(
        variables, opt_state, batch, jnp.float32(1e-2), optimizer
    )
    assert float(n_valid) == 0
    after = jax.tree.map(np.asarray, variables["params"])
    for a, b_ in zip(jax.tree.leaves(before), jax.tree.leaves(after)):
        np.testing.assert_array_equal(a, b_)


def test_matchnet_global_map_is_per_frame(registry):
    """The global match map must be [T, O, h16, w16] and frame-local."""
    from ivosw_tpu.models.vos.matchnet import MatchNetAdapter, init_matchnet_params

    frames = registry.load_images("rr-a")
    adapter = MatchNetAdapter(init_matchnet_params(0, hw=(48, 64)), encode_chunk=4)
    state = adapter.begin_sequence(frames, 1)
    assert state.global_map.shape[0] == 4  # per-frame leading axis
