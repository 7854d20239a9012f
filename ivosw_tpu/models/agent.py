"""DQN frame-recommendation agent.

Capability parity with the reference Agent (``models/agent.py:67-237``):
policy + target Brain networks, ε-greedy action with the schedule
``eps_end + (eps_start - eps_end)·exp(-0.5·steps/eps_decay)`` (eval ε = 0),
a double-DQN-style update (next action from the policy net, its Q from the
target net), dual targets ``γ·Q_next + 0.1·reward_step`` and
``0.1·reward_done`` with summed MSE losses, element-wise gradient clamp ±1,
Adam with L2 weight decay (torch-Adam semantics), stochastic target sync with
probability ``update_rate``, and a rolling 32-entry loss window.

Faithfully kept quirk: the ``done`` flag is carried through the replay schema
but — exactly as in the reference update (``models/agent.py:133-151``) — is
NOT used to mask the bootstrapped term.

TPU-native design: the whole update (two Brain forwards for targets under
stop-gradient, one differentiated forward, loss, grads, clip, Adam) is ONE
jitted device program; action selection is one jitted forward with frame
masking for static shape buckets.
"""

from __future__ import annotations

import functools
import math
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ivosw_tpu.data.replay import ReplayMemory, Transition
from ivosw_tpu.models.brain import (
    brain_forward,
    init_brain_params,
    pad_to_bucket,
)

SCALE_FACTOR_STEP = 0.1
SCALE_FACTOR_DONE = 0.1


def make_optimizer(lr: float, weight_decay: float) -> optax.GradientTransformation:
    """clip(±1) → grad += wd·param → Adam, matching the reference order:
    per-element grad clamp before optimizer.step (models/agent.py:157-160),
    then torch.optim.Adam's coupled L2 weight decay."""
    return optax.chain(
        optax.clip(1.0),
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale(-lr),
    )


def dqn_loss(params, target_params, batch, gamma):
    state = jnp.stack([batch["old_state_iou"], batch["annotated_frames"]], axis=2)
    new_state = jnp.stack(
        [batch["new_state_iou"], batch["next_annotated_frames"]], axis=2
    )

    # targets (no gradient): next action from policy, its value from target
    q_new_policy = jax.lax.stop_gradient(brain_forward(params, new_state))
    next_action = jnp.argmax(q_new_policy, axis=1)
    q_new_target = jax.lax.stop_gradient(brain_forward(target_params, new_state))
    q_next = jnp.take_along_axis(q_new_target, next_action[:, None], axis=1)

    target_step = q_next * gamma + batch["reward_step"][:, None] * SCALE_FACTOR_STEP
    target_done = batch["reward_done"][:, None] * SCALE_FACTOR_DONE

    q_state = brain_forward(params, state)
    q_sa = jnp.take_along_axis(q_state, batch["action"][:, None], axis=1)

    loss_step = jnp.mean((q_sa - target_step) ** 2)
    loss_done = jnp.mean((q_sa - target_done) ** 2)
    return loss_step + loss_done


@functools.partial(jax.jit, static_argnames=("optimizer",), donate_argnames=("params", "opt_state"))
def dqn_update_step(params, target_params, opt_state, batch, gamma, optimizer):
    loss, grads = jax.value_and_grad(dqn_loss)(params, target_params, batch, gamma)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss


@jax.jit
def _greedy_q(params, state, mask):
    return brain_forward(params, state, mask)


class Agent:
    """Host-side wrapper holding params/opt-state and the ε-greedy policy."""

    def __init__(self, cfg, seed: Optional[int] = None, rng=None):
        self.cfg = cfg
        a = cfg.agent
        self.memory_size = a.memory_size
        self.gamma = float(a.gamma)
        self.eps_start = float(a.eps_start)
        self.eps_end = float(a.eps_end)
        self.eps_decay = float(a.eps_decay)
        self.update_rate = float(a.update_rate)
        self.steps_done = 0

        self.memory_pool = ReplayMemory(self.memory_size)

        key = jax.random.PRNGKey(cfg.seed if seed is None else seed)
        self.params = init_brain_params(key)
        self.target_params = jax.tree.map(jnp.copy, self.params)

        self.optimizer = make_optimizer(a.lr, a.weight_decay)
        self.opt_state = self.optimizer.init(self.params)

        self.host_rng = rng if rng is not None else np.random.default_rng(
            cfg.seed if seed is None else seed
        )

        # rolling loss window (reference models/agent.py:94-97,198-203)
        self.loss_window = []
        self.loss_position = 0
        self.loss_capacity = 32
        self.loss_avg = 0.0

    # ------------------------------------------------------------------ #
    def eps_threshold(self) -> float:
        if self.cfg.phase != "train":
            return 0.0
        return self.eps_end + (self.eps_start - self.eps_end) * math.exp(
            -0.5 * self.steps_done / self.eps_decay
        )

    def action(self, state: np.ndarray, verbose: bool = False) -> int:
        """ε-greedy frame pick for one clip. state: [T, 2]."""
        self.steps_done += 1
        eps = self.eps_threshold()
        t = state.shape[0]
        rand_flag = self.host_rng.random()
        if rand_flag > eps:
            t_pad = pad_to_bucket(t)
            padded = np.zeros((1, t_pad, 2), dtype=np.float32)
            padded[0, :t] = state
            mask = np.zeros((1, t_pad), dtype=np.float32)
            mask[0, :t] = 1.0
            q = np.asarray(_greedy_q(self.params, padded, mask))[0, :t]
            return int(q.argmax())
        return int(self.host_rng.integers(t))

    def q_values(self, state: np.ndarray) -> np.ndarray:
        """Greedy Q-values for one clip (no ε, no step counting). [T]."""
        t = state.shape[0]
        t_pad = pad_to_bucket(t)
        padded = np.zeros((1, t_pad, 2), dtype=np.float32)
        padded[0, :t] = state
        mask = np.zeros((1, t_pad), dtype=np.float32)
        mask[0, :t] = 1.0
        return np.asarray(_greedy_q(self.params, padded, mask))[0, :t]

    # ------------------------------------------------------------------ #
    def update_agent(self, batch: Optional[Dict[str, np.ndarray]]) -> Optional[float]:
        """One replay-batch Q-update. Returns the scalar loss."""
        if batch is None:
            return None
        device_batch = {
            k: jnp.asarray(v)
            for k, v in batch.items()
            if k
            in (
                "action",
                "reward_step",
                "reward_done",
                "old_state_iou",
                "new_state_iou",
                "annotated_frames",
                "next_annotated_frames",
            )
        }
        self.params, self.opt_state, loss = dqn_update_step(
            self.params,
            self.target_params,
            self.opt_state,
            device_batch,
            self.gamma,
            self.optimizer,
        )
        loss_val = float(loss)
        self._update_avg_loss(loss_val)

        # stochastic target sync (reference models/agent.py:163-165)
        if self.host_rng.random() < self.update_rate:
            self.target_params = jax.tree.map(jnp.copy, self.params)
        return loss_val

    def _update_avg_loss(self, loss: float) -> None:
        if len(self.loss_window) < self.loss_capacity:
            self.loss_window.append(None)
        self.loss_window[self.loss_position] = loss
        self.loss_position = (self.loss_position + 1) % self.loss_capacity
        self.loss_avg = sum(self.loss_window) / len(self.loss_window)

    def get_avg_loss(self) -> float:
        return self.loss_avg

    # ------------------------------------------------------------------ #
    def memory(self, transition: Transition, report_save_dir: str) -> None:
        self.memory_pool.push(transition)
        self.memory_pool.push_to_csv(report_save_dir)
