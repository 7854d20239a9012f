"""Shared building blocks for the JAX-native VOS backbone families.

All NHWC, bfloat16-compute/float32-param (MXU-friendly). GroupNorm instead of
BatchNorm: VOS inference batches are tiny (objects × one frame), where BN
running stats are the wrong tool; GN is batch-size independent and fuses
cleanly under XLA.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        x = nn.Conv(
            self.features,
            (k, k),
            strides=(self.strides, self.strides),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=False,
            dtype=self.dtype,
        )(x)
        x = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(x)
        return nn.relu(x)


class ResBlock(nn.Module):
    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        residual = x
        y = ConvBlock(self.features, 3, self.strides, self.dtype)(x)
        y = nn.Conv(
            self.features,
            (3, 3),
            padding=[(1, 1)] * 2,
            use_bias=False,
            dtype=self.dtype,
        )(y)
        y = nn.GroupNorm(num_groups=min(32, self.features), dtype=self.dtype)(y)
        if residual.shape[-1] != self.features or self.strides != 1:
            residual = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.strides, self.strides),
                use_bias=False,
                dtype=self.dtype,
            )(residual)
        return nn.relu(y + residual)


class VOSEncoder(nn.Module):
    """4-stage encoder: stem /2 → r2 /4 → r3 /8 → r4 /16.

    Returns (r4, r3, r2) feature maps. in_channels is implicit from input;
    widths follow a compact pyramid sized for interactive latency.
    """

    widths: Sequence[int] = (32, 64, 128, 256)
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        w = self.widths
        x = ConvBlock(w[0], 7, 2, self.dtype)(x)  # /2
        x = ResBlock(w[1], 2, self.dtype)(x)  # /4
        r2 = ResBlock(w[1], 1, self.dtype)(x)
        x = ResBlock(w[2], 2, self.dtype)(r2)  # /8
        r3 = ResBlock(w[2], 1, self.dtype)(x)
        x = ResBlock(w[3], 2, self.dtype)(r3)  # /16
        r4 = ResBlock(w[3], 1, self.dtype)(x)
        return r4, r3, r2


class VOSDecoder(nn.Module):
    """Refinement decoder: r4 (+skips r3, r2) → logits at /4, resized to /1."""

    mid: int = 128
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, r4, r3, r2, out_hw: Tuple[int, int]):
        x = ConvBlock(self.mid, 3, 1, self.dtype)(r4)
        x = resize_like(x, r3)
        x = ConvBlock(self.mid, 3, 1, self.dtype)(
            jnp.concatenate([x, r3.astype(self.dtype)], axis=-1)
        )
        x = resize_like(x, r2)
        x = ConvBlock(self.mid // 2, 3, 1, self.dtype)(
            jnp.concatenate([x, r2.astype(self.dtype)], axis=-1)
        )
        logit = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        logit = jax.image.resize(
            logit, logit.shape[:1] + out_hw + (1,), method="bilinear"
        )
        return logit[..., 0]


def resize_like(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    return jax.image.resize(
        x, x.shape[:1] + ref.shape[1:3] + x.shape[3:], method="bilinear"
    ).astype(x.dtype)


def pad_to_multiple(x, mult: int, axes=(1, 2)):
    """Zero-pad spatial dims up to a multiple; returns (padded, pad_hw)."""
    pads = [(0, 0)] * x.ndim
    pad_hw = []
    for ax in axes:
        size = x.shape[ax]
        target = ((size + mult - 1) // mult) * mult
        pads[ax] = (0, target - size)
        pad_hw.append(target - size)
    return jnp.pad(x, pads), tuple(pad_hw)


@functools.partial(jax.jit, static_argnames=("dtype",))
def labels_and_probs(prob_maps: jnp.ndarray, dtype=jnp.float32):
    """[T, O, H, W] foreground probs → (labels [T,H,W] uint8,
    all_P [T, O+1, H, W] with background channel 0). Stays on device; the
    adapter transfers only the labels to host (metrics/robot need them) —
    uint8 because label transfer rides a slow host↔device tunnel and object
    ids are ≤255 — while all_P feeds the fused QA pass with no round-trip.

    dtype: all_P's storage dtype. bf16 (cfg.assess_net.bf16_inputs) halves
    the QA pass's per-round HBM reads; labels are computed from the f32
    ``prob_maps`` BEFORE the cast, so masks/metrics are dtype-invariant."""
    fg_max = prob_maps.max(axis=1)
    labels = jnp.where(
        fg_max > 0.5, jnp.argmax(prob_maps, axis=1) + 1, 0
    ).astype(jnp.uint8)
    bg = jnp.clip(1.0 - fg_max, 0.0, 1.0)[:, None]
    all_p = jnp.concatenate([bg, prob_maps], axis=1).astype(dtype)
    return labels, all_p


def global_match_readout(query, memory_keys, memory_values, valid, dtype=jnp.bfloat16):
    """Attention readout of memory features (the matching op of
    matching-based VOS, expressed as two MXU matmuls).

    query: [N, P, C]; memory_keys/values: [N, M, C]; valid: [N, M] 1/0.
    Returns [N, P, C] readout.
    """
    q = query.astype(dtype)
    k = memory_keys.astype(dtype)
    v = memory_values.astype(dtype)
    scale = 1.0 / jnp.sqrt(jnp.asarray(q.shape[-1], jnp.float32))
    logits = jnp.einsum("npc,nmc->npm", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    logits = jnp.where(valid[:, None, :] > 0, logits, -1e9)
    attn = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return jnp.einsum("npm,nmc->npc", attn, v, preferred_element_type=jnp.float32).astype(
        dtype
    )
