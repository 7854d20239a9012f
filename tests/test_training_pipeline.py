"""Hermetic three-stage RL pipeline: produce_reward → pretrain → train,
on synthetic clips with the fake backbone, checking every artifact."""

import os

import numpy as np
import pytest

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.registry import SequenceRegistry
from ivosw_tpu.interact.recommend import (
    RewardTable,
    gen_subseq,
    goal_only_reward,
    select_next_frame,
)
from ivosw_tpu.models.vos.fake import FakeVOS
from ivosw_tpu.train import pretrain_agent, produce_reward, train_agent


@pytest.fixture(scope="module")
def registry():
    return SequenceRegistry.synthetic(
        ["gamma", "delta"],
        num_frames=8,
        image_size=(64, 48),
        num_objects=1,
        split="train",
        seed=1,
    )


def _adapter(registry):
    # short quality falloff (tau) so the chosen frame matters and terminal
    # quality varies across episodes; capped well below saturation so the
    # robot always has an error region to scribble
    return FakeVOS(registry, base_quality=0.3, gain=0.5, tau=1.5, max_quality=0.75)


def _cfg(tmp_path, **kw):
    cfg = Config(**kw)
    cfg.data.len_subseq = 6
    cfg.davis_interactive.max_nb_interactions = 3
    cfg.agent.save_result_dir = str(tmp_path / "train")
    cfg.agent.train_batch_size = 4
    cfg.ckpt_dir = str(tmp_path / "weights")
    return cfg


@pytest.fixture(scope="module")
def pipeline_dir(registry, tmp_path_factory):
    """Run all three stages once; individual tests assert on the artifacts."""
    tmp_path = tmp_path_factory.mktemp("pipeline")

    cfg = produce_reward.configure(_cfg(tmp_path))
    cfg.num_epochs = 2
    stats_r, agent_r = produce_reward.run(
        cfg, registry=registry, adapter=_adapter(registry)
    )

    cfg2 = pretrain_agent.configure(_cfg(tmp_path))
    cfg2.num_epochs = 2
    stats_p, agent_p = pretrain_agent.run(
        cfg2, registry=registry, adapter=_adapter(registry)
    )

    cfg3 = train_agent.configure(_cfg(tmp_path))
    cfg3.num_epochs = 1
    cfg3.agent.sample_th = 0.01
    stats_t, agent_t = train_agent.run(
        cfg3, registry=registry, adapter=_adapter(registry)
    )
    return dict(
        tmp=tmp_path,
        stats=(stats_r, stats_p, stats_t),
        agents=(agent_r, agent_p, agent_t),
    )


def test_reward_stage_artifacts(pipeline_dir):
    tmp = pipeline_dir["tmp"]
    reward_csv = tmp / "train" / "reward.csv"
    assert reward_csv.exists()
    table = RewardTable.from_csv(str(reward_csv))
    # 2 epochs × 2 seqs × 3 scribbles × 2 recorded rounds (2..3)
    assert len(table) == 24
    # per (seq, terminal round, parity) there are exactly num_epochs records
    base = table.baseline("gamma", 3, 1)
    assert len(base) == 2
    assert (base > 0).all()


def test_pretrain_stage_artifacts(pipeline_dir):
    tmp = pipeline_dir["tmp"]
    pretrain_csv = tmp / "train" / "pretrain.csv"
    assert pretrain_csv.exists()
    import pandas as pd

    df = pd.read_csv(pretrain_csv, index_col=0)
    assert len(df) == 24
    # with the reward table loaded, terminal rewards are non-trivial
    assert df["reward_done"].abs().max() > 0


def test_train_stage_updates_and_checkpoint(pipeline_dir):
    tmp = pipeline_dir["tmp"]
    stats_t = pipeline_dir["stats"][2]
    agent_t = pipeline_dir["agents"][2]
    assert stats_t["update_loss_avg"] > 0, "no Q-updates ran"
    assert agent_t.steps_done > 0
    assert (tmp / "weights" / "agent.orbax").exists()
    # memory pool restricted by sample_th has the surviving sequences only
    assert len(agent_t.memory_pool.seq_list) >= 1


def test_trained_params_load_back(pipeline_dir):
    from ivosw_tpu.core.config import Config
    from ivosw_tpu.models.agent import Agent
    from ivosw_tpu.utils.checkpoint import restore_agent

    tmp = pipeline_dir["tmp"]
    agent_t = pipeline_dir["agents"][2]
    cfg = Config(phase="eval")
    fresh = Agent(cfg, seed=123)
    ok = restore_agent(fresh, str(tmp / "weights"))
    assert ok
    state = np.random.default_rng(0).random((6, 2)).astype(np.float32)
    np.testing.assert_allclose(
        fresh.q_values(state), agent_t.q_values(state), atol=1e-6
    )


# ----------------------------------------------------------- unit pieces --
def test_gen_subseq_consecutive_centred():
    sub = gen_subseq(10, 30, 7, "consecutive")
    assert len(sub) == 7 and 10 in sub
    sub0 = gen_subseq(0, 30, 7, "consecutive")
    assert sub0 == list(range(7))
    sub_end = gen_subseq(29, 30, 7, "consecutive")
    assert sub_end == list(range(23, 30))


def test_gen_subseq_equal_contains_first_frame():
    # 'equal' shifts the even grid until first_frame lands on it, then drops
    # one endpoint: linspace(0,39,9)→+1→[1,5,...,40]→drop 40
    sub = gen_subseq(5, 40, 8, "equal")
    assert sub == [1, 5, 10, 15, 20, 25, 30, 35]
    # when first_frame lands on the LAST grid point, the first is dropped
    sub2 = gen_subseq(39, 40, 8, "equal")
    assert len(sub2) == 8 and sub2[-1] == 39


def test_select_next_frame_prev_exclusion():
    vals = np.array([0.5, 0.1, 0.3, 0.2])
    assert select_next_frame(vals, "min") == 1
    assert select_next_frame(vals, "min", prev_frames=[1]) == 3
    assert select_next_frame(vals, "min", prev_frames=[0, 1, 2, 3]) == 1
    assert select_next_frame(vals, "max") == 0


def test_goal_only_reward_eq3():
    table = RewardTable()
    for v in [0.5, 0.6, 0.7]:
        table.add("seq", 3, 1, v)
    iou_new = np.array([0.9, 0.9])
    r_step, r_done = goal_only_reward("seq", 3, 1, False, iou_new, table)
    mean, std = 0.6, np.std([0.5, 0.6, 0.7], ddof=1)
    assert r_step == 1.0
    assert r_done == pytest.approx((0.9 - mean - std) / std)
    r_step2, _ = goal_only_reward("seq", 3, 1, True, iou_new, table)
    assert r_step2 == -1.0
    # strict reference mode requires exactly N baselines
    with pytest.raises(AssertionError):
        goal_only_reward("seq", 3, 1, False, iou_new, table, expected_count=30)


def test_smooth_clip_quality():
    from ivosw_tpu.interact.recommend import smooth_clip_quality

    q = np.array([1.0, 1.0, 0.0, 1.0, 1.0], dtype=np.float32)
    # identity below window 2 / reference default
    np.testing.assert_array_equal(smooth_clip_quality(q, 1), q)
    out = smooth_clip_quality(q, 3)
    assert out.shape == q.shape
    np.testing.assert_allclose(out, [1, 2 / 3, 2 / 3, 2 / 3, 1], atol=1e-6)
    # even windows round up to odd (length must be preserved)
    assert smooth_clip_quality(q, 4).shape == q.shape
    # contiguous structure survives: a low band stays the argmin region
    band = np.ones(20, dtype=np.float32)
    band[8:13] = 0.2
    noisy = band + np.random.default_rng(0).normal(0, 0.15, 20).astype(np.float32)
    sm = smooth_clip_quality(noisy, 5)
    assert 8 <= int(np.argmin(sm)) < 13


def test_wild_finetune_records_predicted_states(registry, tmp_path, monkeypatch):
    """The wild fine-tune's Q-updates must train on the SAME (smoothed)
    AssessNet-predicted states the policy acts on — not the true J&F the
    oracle phases record (VERDICT r2 item 9: recording true-metric states
    while acting on corr~0.7 predictions made the fine-tune pure noise)."""
    from ivosw_tpu.interact import recommend
    from ivosw_tpu.train.rollout import run_interactive_phase

    marker = 0.123  # recognisably not a FakeVOS J&F value

    def fake_predict(assess_variables, all_F, all_P, n_objects, **kwargs):
        t = all_P.shape[0]
        return np.full(t, marker, dtype=np.float32), None

    monkeypatch.setattr(recommend, "predict_clip_quality", fake_predict)

    cfg = _cfg(tmp_path, seed=7)
    cfg.phase = "train"
    cfg.num_epochs = 1
    cfg.setting, cfg.method = "wild", "ours"
    from ivosw_tpu.models.agent import Agent

    agent = Agent(cfg)
    run_interactive_phase(
        cfg,
        registry,
        _adapter(registry),
        agent,
        reward_table=None,
        subset="train",
        assess_variables=object(),  # rollout only gates on `is not None`
    )
    transitions = [t for t in agent.memory_pool.memory if t is not None]
    assert transitions, "no transitions recorded"
    for tr in transitions:
        np.testing.assert_allclose(tr.state_iou, marker, atol=1e-6)
        np.testing.assert_allclose(tr.next_state_iou, marker, atol=1e-6)


def test_train_agent_resume_from_epoch_snapshot(registry, tmp_path):
    """A killed agent stage resumes from its newest epoch snapshot instead of
    restarting at epoch 1; the plain agent.orbax (the pipeline's
    skip-if-exists marker) appears only on COMPLETION — a mid-run kill must
    never leave a marker that makes the stage skip with an under-trained
    agent (round-4 fix; see scripts/run_round4.sh) — and a COMPLETED run
    leaves NO epoch snapshots behind, so a later forced retrain can never
    "resume" past num_epochs and silently run zero epochs (ADVICE r4)."""
    import shutil

    from ivosw_tpu.utils.checkpoint import (
        latest_agent_epoch,
        save_agent_checkpoint,
    )

    # stage 1+2 prerequisites (reward table + pretrain pool)
    cfg = produce_reward.configure(_cfg(tmp_path))
    cfg.num_epochs = 2
    produce_reward.run(cfg, registry=registry, adapter=_adapter(registry))
    cfg2 = pretrain_agent.configure(_cfg(tmp_path))
    cfg2.num_epochs = 2
    pretrain_agent.run(cfg2, registry=registry, adapter=_adapter(registry))

    cfg3 = train_agent.configure(_cfg(tmp_path))
    cfg3.num_epochs = 2
    cfg3.agent.sample_th = 0.01
    _, agent_full = train_agent.run(
        cfg3, registry=registry, adapter=_adapter(registry)
    )
    weights = tmp_path / "weights"
    assert (weights / "agent.orbax").exists()
    # snapshots only ever exist for an in-flight run
    assert latest_agent_epoch(str(weights)) is None

    # simulate a kill after epoch 1: epoch-1 snapshot present, no marker
    save_agent_checkpoint(agent_full, str(weights), epoch=1)
    shutil.rmtree(weights / "agent.orbax")
    assert latest_agent_epoch(str(weights)) == 1

    _, agent_resumed = train_agent.run(
        cfg3, registry=registry, adapter=_adapter(registry)
    )
    # resumed one epoch on top of the snapshot: marker back, snapshots gone
    assert (weights / "agent.orbax").exists()
    assert latest_agent_epoch(str(weights)) is None
    assert agent_resumed.steps_done > 0
