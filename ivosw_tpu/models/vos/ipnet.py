"""IPNet: interaction-and-propagation VOS backbone (IPN-family), JAX-native.

Capability parity with the reference's IPN path (``eval_agent_ipn.py:84-86,
228,246-248`` + ``utils/utils_ipn.py``): a self-contained model pair —
an Interaction network segmenting the annotated frame from image + positive/
negative scribbles + previous mask, and a Propagation network carrying masks
frame-to-frame conditioned on the annotated REFERENCE frame (its features and
mask) — with multi-round fusion by LINEAR frame-distance weights between
annotated frames (``Get_weight``, ``utils/utils_ipn.py:37-72``): weight 1 at
the new annotation falling to 0 at the nearest other annotated frame.

Distinct from TAPNet (attention memory over all rounds, α∈[0.5,1] blending)
and MatchNet (pixel-matching similarity maps): IPNet conditions on one
reference via masked global feature pooling (per-object conditioning vector)
and fuses rounds with the Get_weight ramp.

TPU-native: per-sequence frame encoding once; per-round propagation is one
`lax.scan` over the backward-then-forward permutation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ivosw_tpu.data.scribbles import scribble_masks_per_object
from ivosw_tpu.models.vos.layers import ConvBlock, VOSDecoder, VOSEncoder
from ivosw_tpu.models.vos.tapnet import prop_order


def get_weight(t: int, annotated_prev: np.ndarray, annotated_now: int) -> np.ndarray:
    """Linear distance fusion weights (reference utils/utils_ipn.py:37-72).

    1 at the new annotation, falling linearly to 0 at the nearest OTHER
    annotated frame on each side; 1 beyond the extremes (no older annotation
    to defer to)."""
    w = np.ones(t, dtype=np.float32)
    idx = np.arange(t)
    lower = annotated_prev[annotated_prev < annotated_now]
    if len(lower) > 0:
        closest = int(lower.max())
        span = max(annotated_now - closest, 1)
        ramp = (idx - closest) / span
        w = np.where((idx >= closest) & (idx < annotated_now), ramp, w)
        w = np.where(idx < closest, 0.0, w)  # defer fully to older rounds
    upper = annotated_prev[annotated_prev > annotated_now]
    if len(upper) > 0:
        closest = int(upper.min())
        span = max(closest - annotated_now, 1)
        ramp = (closest - idx) / span
        w = np.where((idx > annotated_now) & (idx <= closest), ramp, w)
        w = np.where(idx > closest, 0.0, w)
    w[annotated_now] = 1.0
    return np.clip(w, 0.0, 1.0)


class InteractionNet(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, pos, neg, prev_mask):
        # img [O,H,W,3]; pos/neg/prev_mask [O,H,W]
        x = jnp.concatenate(
            [img, pos[..., None], neg[..., None], prev_mask[..., None]], axis=-1
        ).astype(self.dtype)
        r4, r3, r2 = VOSEncoder(dtype=self.dtype, name="int_enc")(x)
        return VOSDecoder(dtype=self.dtype, name="int_dec")(r4, r3, r2, img.shape[1:3])


class PropagationNet(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, r4c, r3c, r2c, ref_vec, prev_prob, out_hw):
        # r4c [O,h16,w16,C]; ref_vec [O,C] masked-GAP of reference features
        o, h16, w16, c = r4c.shape
        prev16 = jax.image.resize(prev_prob, (o, h16, w16), method="bilinear")
        cond = jnp.broadcast_to(ref_vec[:, None, None, :], (o, h16, w16, c))
        x = jnp.concatenate(
            [
                r4c.astype(self.dtype),
                cond.astype(self.dtype),
                prev16[..., None].astype(self.dtype),
            ],
            axis=-1,
        )
        x = ConvBlock(256, 3, 1, self.dtype, name="p1")(x)
        x = ConvBlock(256, 3, 1, self.dtype, name="p2")(x)
        return VOSDecoder(dtype=self.dtype, name="prop_dec")(x, r3c, r2c, out_hw)


class IPNet(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.frame_encoder = VOSEncoder(dtype=self.dtype, name="frame_enc")
        self.interaction = InteractionNet(dtype=self.dtype)
        self.propagation = PropagationNet(dtype=self.dtype)

    def encode(self, frames):
        return self.frame_encoder(frames)

    def interact(self, img, pos, neg, prev_mask):
        return self.interaction(img, pos, neg, prev_mask)

    def propagate(self, r4c, r3c, r2c, ref_vec, prev_prob, out_hw):
        return self.propagation(r4c, r3c, r2c, ref_vec, prev_prob, out_hw)

    def __call__(self, img, pos, neg, prev_mask):  # init path
        logit = self.interaction(img, pos, neg, prev_mask)
        r4, r3, r2 = self.frame_encoder(img)
        c = r4.shape[-1]
        ref_vec = jnp.zeros((img.shape[0], c), jnp.float32)
        p = self.propagation(r4, r3, r2, ref_vec, jax.nn.sigmoid(logit), img.shape[1:3])
        return logit, p


_encode_chunk_jit = jax.jit(
    lambda params, frames: IPNet().apply({"params": params}, frames, method=IPNet.encode)
)

_interact_jit = jax.jit(
    lambda params, img, pos, neg, prev: jax.nn.sigmoid(
        IPNet().apply({"params": params}, img, pos, neg, prev, method=IPNet.interact)
    )
)


def _propagate_round_fn(
    params,
    r4_ord,
    r3_ord,
    r2_ord,
    ref_vec,  # [O, C]
    anno_prob,  # [O, H, W]
    prev_round_ord,  # [N, O, H, W]
    fuse_w_ord,  # [N] Get_weight ramp in prop order
    reset_ord,
    valid_ord,
    out_hw,
):
    model = IPNet()
    o = anno_prob.shape[0]

    def body(carry, inp):
        r4c, r3c, r2c, prev_round_t, w_t, reset_t, valid_t = inp
        carry = jnp.where(reset_t > 0, anno_prob, carry)
        r4o = jnp.broadcast_to(r4c[None], (o,) + r4c.shape)
        r3o = jnp.broadcast_to(r3c[None], (o,) + r3c.shape)
        r2o = jnp.broadcast_to(r2c[None], (o,) + r2c.shape)
        logit = model.apply(
            {"params": params}, r4o, r3o, r2o, ref_vec, carry, out_hw,
            method=IPNet.propagate,
        )
        prob = jax.nn.sigmoid(logit)
        fused = w_t * prob + (1.0 - w_t) * prev_round_t
        out = jnp.where(valid_t > 0, fused, prev_round_t)
        carry = jnp.where(valid_t > 0, fused, carry)
        return carry, out

    _, outs = jax.lax.scan(
        body,
        anno_prob,
        (
            r4_ord,
            r3_ord,
            r2_ord,
            prev_round_ord,
            fuse_w_ord[:, None, None, None],
            reset_ord[:, None, None, None],
            valid_ord[:, None, None, None],
        ),
    )
    return outs


_propagate_round_jit = jax.jit(_propagate_round_fn, static_argnames=("out_hw",))


@jax.jit
def _ref_vector(r4a, anno_prob):
    """Masked global-average conditioning vector per object.
    r4a: [h16, w16, C]; anno_prob: [O, H, W] → [O, C]."""
    h16, w16 = r4a.shape[0:2]
    m = jax.image.resize(anno_prob, (anno_prob.shape[0], h16, w16), "bilinear")
    m = m[..., None]
    num = jnp.sum(r4a[None].astype(jnp.float32) * m, axis=(1, 2))
    den = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1e-3)
    return num / den


@dataclass
class _IPState:
    feats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    num_objects: int
    hw: Tuple[int, int]
    prob_maps: jnp.ndarray  # [T, O, H, W] (ON DEVICE)
    frame_cache: np.ndarray
    annotated: List[int] = field(default_factory=list)
    round: int = 0


class IPNetAdapter:
    name = "ipnet"

    def __init__(self, params, encode_chunk: int = 8, scribble_dilation: int = 3,
                 qa_dtype=jnp.float32):
        self.params = params
        self.encode_chunk = encode_chunk
        self.scribble_dilation = scribble_dilation
        # storage dtype of the returned all_P (cfg.assess_net.bf16_inputs)
        self.qa_dtype = qa_dtype

    @classmethod
    def create(cls, seed: int = 0, ckpt_dir: Optional[str] = None,
               qa_dtype=jnp.float32):
        params = None
        if ckpt_dir is not None:
            import os

            from ivosw_tpu.utils.checkpoint import load_pytree

            tree = load_pytree(os.path.join(ckpt_dir, "ipnet.orbax"))
            if tree is not None:
                params = tree.get("params", tree)
        if params is None:
            params = init_ipnet_params(seed)
        return cls(params, qa_dtype=qa_dtype)

    def begin_sequence(self, frames: np.ndarray, num_objects: int):
        t, h, w = frames.shape[:3]
        r4s, r3s, r2s = [], [], []
        chunk = self.encode_chunk
        for s in range(0, t, chunk):
            e = min(s + chunk, t)
            f = frames[s:e]
            if e - s < chunk:
                f = np.concatenate(
                    [f, np.zeros((chunk - (e - s),) + f.shape[1:], f.dtype)]
                )
            r4, r3, r2 = _encode_chunk_jit(self.params, jnp.asarray(f))
            r4s.append(np.asarray(r4[: e - s]))
            r3s.append(np.asarray(r3[: e - s]))
            r2s.append(np.asarray(r2[: e - s]))
        return _IPState(
            feats=(
                jnp.asarray(np.concatenate(r4s)),
                jnp.asarray(np.concatenate(r3s)),
                jnp.asarray(np.concatenate(r2s)),
            ),
            num_objects=num_objects,
            hw=(h, w),
            prob_maps=jnp.zeros((t, num_objects, h, w), dtype=jnp.float32),
            frame_cache=np.asarray(frames, dtype=np.float32),
        )

    def segment(
        self, state: _IPState, scribbles: Dict, annotated_frame: int, n_interaction: int
    ):
        state.round = n_interaction
        t = state.prob_maps.shape[0]
        h, w = state.hw
        o = state.num_objects
        a = int(annotated_frame)

        scrib = scribble_masks_per_object(
            scribbles, (h, w), a, o, dilation=self.scribble_dilation
        )
        any_scrib = scrib.sum(axis=0)
        pos = scrib[1:]
        neg = np.clip(any_scrib[None] - pos, 0.0, 1.0)
        img_o = np.broadcast_to(state.frame_cache[a][None], (o, h, w, 3))
        anno_prob = _interact_jit(
            self.params,
            jnp.asarray(img_o),
            jnp.asarray(pos),
            jnp.asarray(neg),
            state.prob_maps[a],
        )

        ref_vec = _ref_vector(state.feats[0][a], anno_prob)
        prev_annotated = np.array(state.annotated, dtype=np.int64)
        state.annotated.append(a)

        order, reset, valid = prop_order(t, a)
        order_dev = jnp.asarray(order)
        fuse_w = get_weight(t, prev_annotated, a)
        if len(order) > 0:
            outs = _propagate_round_jit(
                self.params,
                state.feats[0][order_dev],
                state.feats[1][order_dev],
                state.feats[2][order_dev],
                ref_vec,
                anno_prob,
                state.prob_maps[order_dev],
                jnp.asarray(fuse_w[order]),
                jnp.asarray(reset),
                jnp.asarray(valid),
                (h, w),
            )
            state.prob_maps = state.prob_maps.at[order_dev].set(outs)
        state.prob_maps = state.prob_maps.at[a].set(anno_prob)

        from ivosw_tpu.models.vos.layers import labels_and_probs

        labels_dev, all_p = labels_and_probs(state.prob_maps, dtype=self.qa_dtype)
        return np.asarray(labels_dev), all_p, state


def init_ipnet_params(seed: int = 0, hw=(64, 64)):
    model = IPNet()
    h, w = hw
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    m = jnp.zeros((1, h, w), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), img, m, m, m)
    return variables["params"]
