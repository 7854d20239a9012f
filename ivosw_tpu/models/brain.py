"""Brain: bidirectional-LSTM Q-network over the frame axis.

Capability parity with the reference Brain (``models/agent.py:13-64``):
per-frame 2→128→128 FC encoder, ONE weight-shared LSTMCell (bias-free) run
forward and backward over the frame axis, per-frame concat of the two hidden
states → FC 256→128→1 Q-value.

TPU-native design: the reference runs 2·T sequential Python-loop LSTMCell
calls per forward (``models/agent.py:45-54``); here both directions are a
single ``jax.lax.scan`` each, jitted into one device program, with optional
frame masking so variable-length clips can be padded to static shape buckets
(XLA requirement) without corrupting the recurrent state.

Weight layout is chosen so a PyTorch ``agent.pt`` converts by transposition
only (see :mod:`ivosw_tpu.utils.torch_import`): LSTM gate order i, f, g, o.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp

HIDDEN = 128
INPUT_FEATURES = 2  # (quality score, #times annotated)

Params = Dict[str, Dict[str, jnp.ndarray]]


def _uniform(key, shape, bound):
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def init_brain_params(key: jax.Array) -> Params:
    """Initialise like torch.nn.Linear/LSTMCell defaults: U(±1/sqrt(fan_in))."""
    ks = jax.random.split(key, 10)
    inv = lambda n: 1.0 / jnp.sqrt(jnp.asarray(n, jnp.float32))
    h = HIDDEN
    return {
        "enc_fc1": {
            "kernel": _uniform(ks[0], (INPUT_FEATURES, h), inv(INPUT_FEATURES)),
            "bias": _uniform(ks[1], (h,), inv(INPUT_FEATURES)),
        },
        "enc_fc2": {
            "kernel": _uniform(ks[2], (h, h), inv(h)),
            "bias": _uniform(ks[3], (h,), inv(h)),
        },
        # bias-free LSTMCell (reference: nn.LSTMCell(128, 128, False))
        "lstm": {
            "w_ih": _uniform(ks[4], (h, 4 * h), inv(h)),
            "w_hh": _uniform(ks[5], (h, 4 * h), inv(h)),
        },
        "dec_fc1": {
            "kernel": _uniform(ks[6], (2 * h, h), inv(2 * h)),
            "bias": _uniform(ks[7], (h,), inv(2 * h)),
        },
        "dec_fc2": {
            "kernel": _uniform(ks[8], (h, 1), inv(h)),
            "bias": _uniform(ks[9], (1,), inv(h)),
        },
    }


def _lstm_step(params, carry, x):
    """One LSTM cell step; gate order i, f, g, o (PyTorch convention)."""
    h, c = carry
    gates = x @ params["w_ih"] + h @ params["w_hh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i = jax.nn.sigmoid(i)
    f = jax.nn.sigmoid(f)
    g = jnp.tanh(g)
    o = jax.nn.sigmoid(o)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def brain_forward(
    params: Params, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Q-values per frame.

    x: [N, T, 2] state (quality, #annotations); mask: optional [N, T] with 1
    for real frames, 0 for padding. Returns [N, T] Q-values; padded positions
    are -inf so downstream argmax never selects them.
    """
    n, t, _ = x.shape
    feats = jnp.maximum(x @ params["enc_fc1"]["kernel"] + params["enc_fc1"]["bias"], 0.0)
    feats = feats @ params["enc_fc2"]["kernel"] + params["enc_fc2"]["bias"]  # [N,T,H]
    feats_tm = jnp.transpose(feats, (1, 0, 2))  # [T, N, H]

    if mask is None:
        mask_tm = jnp.ones((t, n, 1), dtype=feats.dtype)
    else:
        mask_tm = jnp.transpose(mask, (1, 0))[:, :, None].astype(feats.dtype)

    lstm = params["lstm"]
    zeros = jnp.zeros((n, HIDDEN), dtype=feats.dtype)

    def scan_body(carry, inp):
        feat_t, m_t = inp
        h_new, c_new = _lstm_step(lstm, carry, feat_t)
        # padded steps pass the recurrent state through untouched so padding
        # at either end of the clip cannot contaminate real frames
        h = m_t * h_new + (1.0 - m_t) * carry[0]
        c = m_t * c_new + (1.0 - m_t) * carry[1]
        return (h, c), h

    _, h_fw = jax.lax.scan(scan_body, (zeros, zeros), (feats_tm, mask_tm))
    _, h_bw_rev = jax.lax.scan(
        scan_body, (zeros, zeros), (feats_tm[::-1], mask_tm[::-1])
    )
    h_bw = h_bw_rev[::-1]

    final_state = jnp.concatenate([h_fw, h_bw], axis=-1)  # [T, N, 2H]
    z = jnp.maximum(final_state, 0.0)
    z = jnp.maximum(z @ params["dec_fc1"]["kernel"] + params["dec_fc1"]["bias"], 0.0)
    q = z @ params["dec_fc2"]["kernel"] + params["dec_fc2"]["bias"]  # [T, N, 1]
    q = jnp.transpose(q[..., 0], (1, 0))  # [N, T]

    if mask is not None:
        q = jnp.where(mask > 0, q, -jnp.inf)
    return q


def pad_to_bucket(t: int, buckets=(32, 64, 128, 256)) -> int:
    """Static shape bucket for a clip of T frames (XLA recompile avoidance)."""
    for b in buckets:
        if t <= b:
            return b
    return ((t + 127) // 128) * 128
