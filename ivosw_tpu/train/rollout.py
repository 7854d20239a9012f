"""Shared interactive-rollout loop for the agent training phases.

One parameterised loop replaces the reference's three near-identical drivers
(``produce_reward.py`` / ``pretrain_agent.py`` / ``train_agent.py`` share the
same 350-line skeleton):

per epoch → session over the train subset → per episode:
  - 25-frame consecutive subsequence centred on the first scribbled frame
    (``gen_subseq``, reference ``train_agent.py:184-195``);
  - VOS segments the subsequence; metric computed on subsequence ground
    truth; frame indices are subsequence-LOCAL (``subseq.index(...)``);
  - ``recommend_frame`` picks the next local frame (random policy for
    baseline/pretrain, ε-greedy agent for train);
  - submission splices the subsequence prediction into full-length ground
    truth so the robot scribbles inside the training window
    (``train_agent.py:282-284``);
  - repeat detection: chosen frame not among the least-annotated frames
    (``train_agent.py:234-238``);
  - ``agent_business`` records the transition (reward Eq.3 vs the baseline
    table) and, in phase 'train', runs 3·rounds−1 replay Q-updates at
    episode end.
"""

from __future__ import annotations

import copy
from typing import List, Optional

import numpy as np

from ivosw_tpu.core.config import Config
from ivosw_tpu.data.scribbles import annotated_frames as scrib_frames
from ivosw_tpu.interact.recommend import (
    RewardTable,
    agent_business,
    gen_subseq,
    recommend_frame,
)
from ivosw_tpu.interact.robot import ScribbleRobot, robot_from_config
from ivosw_tpu.interact.session import InteractiveSession
from ivosw_tpu.models.vos.protocol import begin_sequence_compat
from ivosw_tpu.ops.metrics import sequence_metric
from ivosw_tpu.utils.misc import AverageMeter, create_stream_logger, set_random_seed


def run_interactive_phase(
    cfg: Config,
    registry,
    adapter,
    agent,
    reward_table: Optional[RewardTable] = None,
    subset: str = "train",
    seq_list: Optional[List[str]] = None,
    assess_variables=None,
    robot: Optional[ScribbleRobot] = None,
    log=None,
    expected_count: Optional[int] = None,
    on_epoch_end=None,
    start_epoch: int = 1,
):
    """Run cfg.num_epochs of interactive rollouts; returns summary stats.

    ``start_epoch`` resumes a killed run at epoch ``start_epoch`` (1-based):
    episode streams are reproducible because each epoch reseeds its session
    and robot with ``cfg.seed + epoch``. A resumed run diverges from an
    uninterrupted one in three accepted ways (the reference has no resume at
    all): (a) the replay pool — transitions collected by the completed
    epochs are not replayed; (b) the exploration stream — the module-level
    rng seeded once with ``cfg.seed`` below drives epsilon-greedy action
    draws and advances across epochs, so a resume restarts it; (c) the
    target-network sync point — ``restore_agent`` sets
    ``target_params = params``, re-aligning the two nets at the resume
    boundary. Listed in README "Divergences from the reference".
    """
    log = log or create_stream_logger(f"train/{cfg.phase}")
    rng = set_random_seed(cfg.seed)
    metric_to_optimize = cfg.davis_interactive.metric
    max_rounds = cfg.davis_interactive.max_nb_interactions
    report_dir = cfg.agent.save_result_dir

    seen_seq: dict = {}
    loss_meter = AverageMeter()
    final_quality = AverageMeter()

    for epoch in range(start_epoch, cfg.num_epochs + 1):
        with InteractiveSession(
            registry,
            subset=subset,
            metric_to_optimize=metric_to_optimize,
            max_nb_interactions=max_rounds,
            max_time=cfg.davis_interactive.max_time_per_interaction or None,
            robot=robot or robot_from_config(cfg, seed=cfg.seed + epoch),
            seed=cfg.seed + epoch,
        ) as sess:
            if seq_list is not None:
                sess.samples = [s for s in sess.samples if s[0] in seq_list]
            while sess.next():
                sequence, scribbles, first_scribble = sess.get_scribbles(
                    only_last=False
                )
                af = scrib_frames(sess.sample_last_scribble)

                if first_scribble:
                    assert len(af) > 0
                    seen_seq[sequence] = seen_seq.get(sequence, 0) + 1
                    info = registry.info(sequence)
                    gt_original = registry.load_annotations(sequence)
                    # real backbones segment from frames; only gt-capable
                    # fakes (begin_sequence(..., gt=...)) can skip the load
                    import inspect

                    adapter_takes_gt = "gt" in inspect.signature(
                        adapter.begin_sequence
                    ).parameters
                    needs_frames = (not adapter_takes_gt) or (
                        cfg.setting == "wild" and cfg.method in ("ours", "worst")
                    )
                    frames_original = (
                        registry.load_images(sequence) if needs_frames else None
                    )
                    n_objects = info.num_objects
                    first_global = af[0]
                    len_subseq = min(cfg.data.len_subseq, info.num_frames)
                    subseq = gen_subseq(first_global, info.num_frames, len_subseq)
                    n_frame = len_subseq
                    next_frame = subseq.index(first_global)
                    first_frame = next_frame
                    gt_masks = gt_original[subseq]
                    clip_frames = (
                        frames_original[subseq] if frames_original is not None else None
                    )
                    prev_frames = [next_frame]
                    annotated_frames_list = [next_frame]
                    n_interaction = 1
                    # wild/ours: the policy acts on (smoothed) predicted
                    # quality, so Q-updates must train on the SAME states —
                    # recommend_frame writes them into pred_buf in place
                    wild_states = (
                        cfg.setting == "wild"
                        and cfg.method == "ours"
                        and assess_variables is not None
                    )
                    pred_buf = (
                        np.zeros(n_frame, dtype=np.float32) if wild_states else None
                    )
                    old_pred = None
                    new_pred = None
                    state = begin_sequence_compat(
                        adapter,
                        clip_frames,
                        n_objects,
                        sequence=sequence,
                        gt=gt_masks,
                    )
                    old_frame = None
                    old_metric = None
                    repeat_selection = None
                    new_masks_metric = None
                else:
                    if af and subseq[next_frame] not in af and af[-1] in subseq:
                        # robot annotated a fallback frame; follow it
                        next_frame = subseq.index(af[-1])
                    counts = np.zeros(len(new_masks_metric))
                    for i in annotated_frames_list:
                        counts[i] += 1
                    repeat_selection = next_frame not in list(
                        np.where(counts == counts.min())[0]
                    )
                    annotated_frames_list.append(next_frame)
                    old_frame = next_frame
                    old_metric = new_masks_metric
                    old_pred = new_pred
                    n_interaction += 1

                # slice the accumulated scribbles to the training window
                scribbles_local = {
                    "sequence": sequence,
                    "scribbles": [scribbles["scribbles"][i] for i in subseq],
                }

                masks, all_P, state = adapter.segment(
                    state, scribbles_local, next_frame, n_interaction
                )
                new_masks_metric = sequence_metric(
                    metric_to_optimize, gt_masks, masks, n_objects
                )

                next_frame = recommend_frame(
                    cfg,
                    assess_variables,
                    agent,
                    n_frame=n_frame,
                    n_objects=n_objects,
                    all_F=clip_frames,
                    all_P=all_P,
                    new_masks_quality=new_masks_metric,
                    prev_frames=prev_frames,
                    annotated_frames_list=copy.deepcopy(annotated_frames_list),
                    mask_quality=pred_buf,
                    first_frame=first_frame,
                    max_nb_interactions=max_rounds,
                    rng=rng,
                )
                if wild_states:
                    new_pred = pred_buf.copy()
                prev_frames.append(next_frame)

                submit = gt_original.copy()
                submit[subseq] = masks
                sess.submit_masks(
                    submit, next_scribble_frame_candidates=[subseq[next_frame]]
                )

                loss, r_step, r_done = agent_business(
                    cfg,
                    agent,
                    max_rounds,
                    n_interaction,
                    first_scribble,
                    old_metric,
                    new_masks_metric,
                    old_frame,
                    sequence,
                    seen_seq[sequence],
                    repeat_selection,
                    reward_table,
                    annotated_frames_list,
                    next_frame,
                    report_dir,
                    expected_count=expected_count,
                    state_override=(
                        (old_pred, new_pred)
                        if wild_states and old_pred is not None
                        else None
                    ),
                )
                if loss:
                    loss_meter.update(loss)
                if n_interaction == max_rounds:
                    final_quality.update(float(new_masks_metric.mean()))
                    log.info(
                        f"ep{epoch} {sequence}_{seen_seq[sequence]} "
                        f"{metric_to_optimize}:{new_masks_metric.mean() * 100:.2f} "
                        f"r_step:{r_step:+.1f} r_done:{r_done:+.2f} "
                        f"loss:{loss:.4f}"
                    )
        if on_epoch_end is not None:
            on_epoch_end(epoch)

    return {
        "final_quality_avg": final_quality.avg,
        "update_loss_avg": loss_meter.avg,
        "episodes": final_quality.count,
    }
