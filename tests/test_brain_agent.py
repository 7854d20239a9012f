"""Brain/Agent math tests: shapes, mask invariance, torch parity,
Q-target semantics, ε schedule, replay ring + CSV round-trip."""

import numpy as np
import pytest

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.replay import ReplayMemory, Transition
from ivosw_tpu.models.agent import Agent, dqn_loss, SCALE_FACTOR_DONE, SCALE_FACTOR_STEP
from ivosw_tpu.models.brain import (
    brain_forward,
    init_brain_params,
    pad_to_bucket,
)


def test_brain_shapes():
    import jax

    params = init_brain_params(jax.random.PRNGKey(0))
    x = np.random.default_rng(0).random((3, 25, 2)).astype(np.float32)
    q = np.asarray(brain_forward(params, x))
    assert q.shape == (3, 25)
    assert np.isfinite(q).all()


def test_brain_mask_padding_invariance():
    """Q-values on real frames must not change when the clip is padded."""
    import jax
    import jax.numpy as jnp

    params = init_brain_params(jax.random.PRNGKey(1))
    rng = np.random.default_rng(1)
    t = 11
    x = rng.random((1, t, 2)).astype(np.float32)
    q_ref = np.asarray(brain_forward(params, jnp.asarray(x)))

    t_pad = 32
    xp = np.zeros((1, t_pad, 2), dtype=np.float32)
    xp[0, :t] = x[0]
    # garbage in the padded region must be ignored
    xp[0, t:] = rng.random((t_pad - t, 2))
    mask = np.zeros((1, t_pad), dtype=np.float32)
    mask[0, :t] = 1.0
    q_pad = np.asarray(brain_forward(params, jnp.asarray(xp), jnp.asarray(mask)))

    np.testing.assert_allclose(q_pad[0, :t], q_ref[0], rtol=1e-5, atol=1e-5)
    assert np.all(np.isneginf(q_pad[0, t:]))


def test_brain_torch_parity():
    """Bit-comparable forward vs an equivalent torch module built from
    torch primitives (Linear + bias-free LSTMCell, shared fwd/bwd)."""
    torch = pytest.importorskip("torch")
    import torch.nn as tnn

    from ivosw_tpu.utils.torch_import import brain_params_from_torch

    torch.manual_seed(0)
    enc1, enc2 = tnn.Linear(2, 128), tnn.Linear(128, 128)
    cell = tnn.LSTMCell(128, 128, bias=False)
    dec1, dec2 = tnn.Linear(256, 128), tnn.Linear(128, 1)

    def torch_brain(x):  # x: [N, T, 2]
        n, t, _ = x.shape
        feats = enc2(torch.relu(enc1(x)))  # N,T,H
        state_f = state_b = None
        hs_f, hs_b = [], []
        for i in range(t):
            state_f = cell(feats[:, i], state_f)
            state_b = cell(feats[:, t - 1 - i], state_b)
            hs_f.append(state_f[0])
            hs_b.append(state_b[0])
        hs_b.reverse()
        qs = [
            dec2(torch.relu(dec1(torch.relu(torch.cat([hf, hb], 1)))))
            for hf, hb in zip(hs_f, hs_b)
        ]
        return torch.cat(qs, 1)

    sd = {}
    for name, mod in [
        ("encoder_fc1", enc1),
        ("encoder_fc2", enc2),
        ("decoder_fc1", dec1),
        ("decoder_fc2", dec2),
    ]:
        sd[f"{name}.weight"] = mod.weight
        sd[f"{name}.bias"] = mod.bias
    sd["lstm_cell.weight_ih"] = cell.weight_ih
    sd["lstm_cell.weight_hh"] = cell.weight_hh

    params = brain_params_from_torch(sd)
    x = np.random.default_rng(3).random((2, 13, 2)).astype(np.float32)
    with torch.no_grad():
        q_torch = torch_brain(torch.from_numpy(x)).numpy()
    q_jax = np.asarray(brain_forward(params, x))
    # float32 LSTM accumulation order differs between XLA and torch; a few
    # 1e-4 of absolute drift over 2·T recurrent steps is expected
    np.testing.assert_allclose(q_jax, q_torch, atol=5e-4)
    # decisions (argmax over frames) must agree exactly
    assert (q_jax.argmax(1) == q_torch.argmax(1)).all()


def _fake_batch(rng, batch=4, t=25):
    return {
        "action": rng.integers(0, t, size=batch).astype(np.int32),
        "reward_step": rng.choice([-1.0, 1.0], size=batch).astype(np.float32),
        "reward_done": rng.normal(size=batch).astype(np.float32),
        "done": rng.integers(0, 2, size=batch).astype(np.float32),
        "old_state_iou": rng.random((batch, t)).astype(np.float32),
        "new_state_iou": rng.random((batch, t)).astype(np.float32),
        "annotated_frames": rng.integers(0, 3, size=(batch, t)).astype(np.float32),
        "next_annotated_frames": rng.integers(0, 3, size=(batch, t)).astype(
            np.float32
        ),
    }


def test_dqn_loss_semantics():
    """Hand-check the dual-target bellman loss on a fixed batch."""
    import jax
    import jax.numpy as jnp

    params = init_brain_params(jax.random.PRNGKey(2))
    target = init_brain_params(jax.random.PRNGKey(3))
    rng = np.random.default_rng(0)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch(rng).items()}
    gamma = 0.95

    loss = float(dqn_loss(params, target, batch, gamma))

    state = np.stack(
        [np.asarray(batch["old_state_iou"]), np.asarray(batch["annotated_frames"])], 2
    )
    new_state = np.stack(
        [
            np.asarray(batch["new_state_iou"]),
            np.asarray(batch["next_annotated_frames"]),
        ],
        2,
    )
    q_new_pol = np.asarray(brain_forward(params, new_state))
    next_a = q_new_pol.argmax(1)
    q_new_tgt = np.asarray(brain_forward(target, new_state))
    q_next = q_new_tgt[np.arange(4), next_a]
    t_step = q_next * gamma + np.asarray(batch["reward_step"]) * SCALE_FACTOR_STEP
    t_done = np.asarray(batch["reward_done"]) * SCALE_FACTOR_DONE
    q_sa = np.asarray(brain_forward(params, state))[
        np.arange(4), np.asarray(batch["action"])
    ]
    expected = np.mean((q_sa - t_step) ** 2) + np.mean((q_sa - t_done) ** 2)
    assert loss == pytest.approx(float(expected), rel=1e-5)


def test_agent_update_reduces_loss():
    cfg = Config(phase="train")
    agent = Agent(cfg, seed=0)
    rng = np.random.default_rng(0)
    batch = _fake_batch(rng)
    first = agent.update_agent(batch)
    for _ in range(30):
        last = agent.update_agent(batch)
    assert last < first
    assert agent.get_avg_loss() > 0


def test_eps_schedule_and_eval_greedy():
    cfg = Config(phase="train")
    agent = Agent(cfg, seed=0)
    agent.steps_done = 0
    # step 1 threshold: end + (start-end)*exp(-0.5*1/500)
    agent.steps_done = 1
    expected = 0.25 + (0.7 - 0.25) * np.exp(-0.5 * 1 / 500)
    assert agent.eps_threshold() == pytest.approx(expected)

    cfg_eval = Config(phase="eval")
    agent_eval = Agent(cfg_eval, seed=0)
    assert agent_eval.eps_threshold() == 0.0
    # greedy action is deterministic and within range
    state = np.random.default_rng(1).random((17, 2)).astype(np.float32)
    a1 = agent_eval.action(state)
    a2 = agent_eval.action(state)
    assert a1 == a2
    assert 0 <= a1 < 17


def test_pad_to_bucket():
    assert pad_to_bucket(17) == 32
    assert pad_to_bucket(32) == 32
    assert pad_to_bucket(33) == 64
    assert pad_to_bucket(104) == 128
    assert pad_to_bucket(300) == 384


def _mk_transition(seq, i, t=5, lo=0.1, hi=0.9, delta=0.05):
    iou = np.linspace(lo, hi, t).astype(np.float32)
    return Transition(
        sequence=seq,
        scribble_iter=1,
        n_interaction=i,
        n_interaction_next=i + 1,
        action=i % t,
        reward_step=1.0,
        reward_done=0.5,
        done=i == 4,
        state_iou=iou,
        next_state_iou=iou + delta,
        annotated_frames=np.zeros(t, np.float32),
        next_annotated_frames=np.ones(t, np.float32),
    )


def test_replay_ring_semantics():
    mem = ReplayMemory(capacity=3)
    for i in range(5):
        mem.push(_mk_transition("seq", i))
    assert len(mem) == 3
    # ring: positions hold transitions 3, 4, 2 (5 pushes mod 3)
    actions = sorted(t.n_interaction for t in mem.memory)
    assert actions == [2, 3, 4]


def test_replay_csv_roundtrip(tmp_path):
    mem = ReplayMemory(capacity=10)
    for i in range(4):
        mem.push(_mk_transition("bear", i))
        mem.push_to_csv(str(tmp_path))
    mem2 = ReplayMemory(capacity=10)
    seqs = mem2.load_from_csv(str(tmp_path / "memory_pool.csv"))
    assert seqs == ["bear"]
    assert len(mem2) == 4
    np.testing.assert_allclose(
        mem2.memory[0].state_iou, mem.memory[0].state_iou, atol=1e-6
    )
    batch = mem2.sample_batch(2, np.random.default_rng(0))
    assert batch["old_state_iou"].shape == (2, 5)


def test_replay_sample_th_filter(tmp_path):
    mem = ReplayMemory(capacity=10)
    # 'flat' sequence has no quality range; 'good' improves a lot
    for i in range(2):
        mem.push(_mk_transition("flat", i, lo=0.5, hi=0.5, delta=0.0))
        mem.push_to_csv(str(tmp_path))
    for i in range(2):
        mem.push(_mk_transition("good", i, lo=0.1, hi=0.9))
        mem.push_to_csv(str(tmp_path))
    mem2 = ReplayMemory(capacity=10)
    seqs = mem2.load_from_csv(
        str(tmp_path / "memory_pool.csv"),
        report_save_dir=str(tmp_path / "out"),
        sample_th=0.05,
    )
    assert seqs == ["good"]
    assert len(mem2) == 2
    assert mem2.capacity == 2  # reference capacity-shrink semantics
