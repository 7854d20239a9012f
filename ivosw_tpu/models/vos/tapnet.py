"""TAPNet: interaction-and-transfer VOS backbone (ATNet-family), JAX-native.

Capability parity with the reference's ATNet path
(``utils/utils_atnet.py:14-160`` + the external VOS/ATNet repo): an
interaction network (A-Net) segments the scribbled frame from
image + (prev-mask, positive-scribble, negative-scribble) channels; a
transfer network (T-Net) propagates masks frame-to-frame using feature
matching against ALL annotated frames so far plus the previous frame's mask;
per-round results are α-blended with the previous round's probability maps,
α ∈ [0.5, 1] by distance toward the nearest other annotated frame
(``utils/utils_atnet.py:126-147``).

TPU-native design (vs the reference's per-frame Python DataLoader loop):
- image-only encoding of EVERY frame happens once per sequence, batched
  (the reference re-encodes frames from disk every round);
- one interaction round is ONE jitted device program: the backward-then-
  forward propagation order becomes a `lax.scan` over a host-computed
  permutation of the frame axis with a carry-reset flag at the direction
  switch — same maths, no per-frame dispatch;
- annotated-frame memory is a static-capacity ring ([R_max] validity mask)
  so round count never changes compiled shapes;
- matching = attention readout (two MXU matmuls, layers.global_match_readout);
- objects ride the leading batch axis everywhere.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ivosw_tpu.data.scribbles import scribble_masks_per_object
from ivosw_tpu.models.vos.layers import (
    ConvBlock,
    VOSDecoder,
    VOSEncoder,
    global_match_readout,
)

MAX_ROUNDS_MEM = 8  # static annotated-frame memory capacity
SMALLEST_ALPHA = 0.5


# ------------------------------------------------------------------ model --
class ANet(nn.Module):
    """Interaction net: (image ⊕ 3 interaction channels) → mask logit."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img, interaction):
        # img: [O, H, W, 3]; interaction: [O, H, W, 3]
        x = jnp.concatenate([img, interaction], axis=-1).astype(self.dtype)
        r4, r3, r2 = VOSEncoder(dtype=self.dtype, name="enc6")(x)
        logit = VOSDecoder(dtype=self.dtype, name="dec_a")(
            r4, r3, r2, img.shape[1:3]
        )
        return logit, r4


class FrameEncoder(nn.Module):
    """Image-only encoder, run once per sequence over all frames."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, img):
        return VOSEncoder(dtype=self.dtype, name="enc3")(img)


class TNet(nn.Module):
    """Transfer net: current features + memory readout + prev mask → logit."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, r4c, r3c, r2c, mem_keys, mem_valid, prev_prob, out_hw):
        # r4c: [O, h16, w16, C]; mem_keys: [O, M, C]; prev_prob: [O, H, W]
        o, h16, w16, c = r4c.shape
        q = r4c.reshape(o, h16 * w16, c)
        readout = global_match_readout(q, mem_keys, mem_keys, mem_valid, self.dtype)
        readout = readout.reshape(o, h16, w16, c)

        prev16 = jax.image.resize(
            prev_prob, (o, h16, w16), method="bilinear"
        ).astype(self.dtype)[..., None]
        fused = jnp.concatenate(
            [r4c.astype(self.dtype), readout, prev16], axis=-1
        )
        fused = ConvBlock(c, 3, 1, self.dtype, name="fuse1")(fused)
        fused = ConvBlock(c, 3, 1, self.dtype, name="fuse2")(fused)

        # prev-mask skip at /4 resolution sharpens temporal consistency
        h4, w4 = r2c.shape[1:3]
        prev4 = jax.image.resize(prev_prob, (o, h4, w4), method="bilinear").astype(
            self.dtype
        )[..., None]
        r2c_in = jnp.concatenate([r2c.astype(self.dtype), prev4], axis=-1)
        logit = VOSDecoder(dtype=self.dtype, name="dec_t")(fused, r3c, r2c_in, out_hw)
        return logit


class TAPNet(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.frame_encoder = FrameEncoder(dtype=self.dtype)
        self.anet = ANet(dtype=self.dtype)
        self.tnet = TNet(dtype=self.dtype)

    def encode_frames(self, frames):
        return self.frame_encoder(frames)

    def interact(self, img, interaction):
        return self.anet(img, interaction)

    def transfer(self, r4c, r3c, r2c, mem_keys, mem_valid, prev_prob, out_hw):
        return self.tnet(r4c, r3c, r2c, mem_keys, mem_valid, prev_prob, out_hw)

    def __call__(self, img, interaction):  # init path
        logit, r4 = self.anet(img, interaction)
        r4c, r3c, r2c = self.frame_encoder(img)
        t_logit = self.tnet(
            r4c,
            r3c,
            r2c,
            r4.reshape(r4.shape[0], -1, r4.shape[-1]),
            jnp.ones((r4.shape[0], r4.shape[1] * r4.shape[2])),
            jax.nn.sigmoid(logit),
            img.shape[1:3],
        )
        return logit, t_logit


# ------------------------------------------------------- jitted programs --
def _encode_chunk(params, frames, dtype=jnp.bfloat16):
    return TAPNet(dtype=dtype).apply(
        {"params": params}, frames, method=TAPNet.encode_frames
    )


_encode_chunk_jit = jax.jit(_encode_chunk)


def _interact_round(params, img_o, interaction):
    logit, r4 = TAPNet().apply(
        {"params": params}, img_o, interaction, method=TAPNet.interact
    )
    return jax.nn.sigmoid(logit), r4


_interact_round_jit = jax.jit(_interact_round)


def _propagate_round(
    params,
    feats_r4,  # [T, h16, w16, C] gathered in prop order
    feats_r3,
    feats_r2,
    mem_keys,  # [O, M, C]
    mem_valid,  # [O, M]
    anno_prob,  # [O, H, W]
    prev_round_probs_ordered,  # [T, O, H, W] gathered in prop order
    alpha_ordered,  # [T]
    reset_ordered,  # [T] 1.0 where the carry resets to anno_prob
    valid_ordered,  # [T] 1.0 for real propagation steps
    out_hw,
):
    """One interaction round's full propagation as a single lax.scan."""
    model = TAPNet()

    def body(carry, inp):
        r4c, r3c, r2c, prev_round_t, alpha_t, reset_t, valid_t = inp
        carry = jnp.where(reset_t > 0, anno_prob, carry)
        o = carry.shape[0]
        r4b = jnp.broadcast_to(r4c[None], (o,) + r4c.shape)
        r3b = jnp.broadcast_to(r3c[None], (o,) + r3c.shape)
        r2b = jnp.broadcast_to(r2c[None], (o,) + r2c.shape)
        logit = model.apply(
            {"params": params},
            r4b,
            r3b,
            r2b,
            mem_keys,
            mem_valid,
            carry,
            out_hw,
            method=TAPNet.transfer,
        )
        prob = jax.nn.sigmoid(logit)
        blended = alpha_t * prob + (1.0 - alpha_t) * prev_round_t
        out = jnp.where(valid_t > 0, blended, prev_round_t)
        carry = jnp.where(valid_t > 0, blended, carry)
        return carry, out

    _, outs = jax.lax.scan(
        body,
        anno_prob,
        (
            feats_r4,
            feats_r3,
            feats_r2,
            prev_round_probs_ordered,
            alpha_ordered[:, None, None, None],
            reset_ordered[:, None, None, None],
            valid_ordered[:, None, None, None],
        ),
    )
    return outs  # [T, O, H, W] in prop order


_propagate_round_jit = jax.jit(_propagate_round, static_argnames=("out_hw",))


# ----------------------------------------------------------------- state --
@dataclass
class _TAPState:
    feats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]  # r4/r3/r2 [T,...]
    num_objects: int
    hw: Tuple[int, int]
    prob_maps: jnp.ndarray  # [T, O, H, W] previous-round probs (ON DEVICE)
    mem_keys: jnp.ndarray  # [O, R_max * P, C]
    mem_valid: np.ndarray  # [O, R_max * P]
    frame_cache: np.ndarray  # [T, H, W, 3] raw frames (A-Net input)
    annotated: List[int] = field(default_factory=list)
    round: int = 0


def compute_alpha(t: int, annotated_prev: np.ndarray, annotated_now: int) -> np.ndarray:
    """Per-frame blend factors (reference utils/utils_atnet.py:126-147)."""
    alpha = np.ones(t, dtype=np.float32)
    idx = np.arange(t)
    lower = annotated_prev[annotated_prev < annotated_now]
    if len(lower) > 0:
        closest = lower.max()
        back = idx < annotated_now
        denom = max(annotated_now - closest, 1)
        alpha_b = SMALLEST_ALPHA + (1 - SMALLEST_ALPHA) * (
            (idx - closest) / denom
        )
        alpha = np.where(back, alpha_b, alpha)
    upper = annotated_prev[annotated_prev > annotated_now]
    if len(upper) > 0:
        closest = upper.min()
        fwd = idx > annotated_now
        denom = max(closest - annotated_now, 1)
        alpha_f = SMALLEST_ALPHA + (1 - SMALLEST_ALPHA) * (
            (closest - idx) / denom
        )
        alpha = np.where(fwd, alpha_f, alpha)
    return np.clip(alpha, 0.0, 1.0)


def prop_order(
    t: int, a: int, direction: str = "bwd_fwd"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Frame permutation for one propagation round (static length t-1).

    ``reset`` marks the element where the scan carry must restart from the
    annotated frame (the seam between the two passes). Directions match the
    respective reference backbones: ATNet propagates backward then forward
    (reference utils/utils_atnet.py:121-124), MANet forward then backward
    (reference utils/utils_manet.py:87-117,123-154).
    """
    back = list(range(a - 1, -1, -1))
    fwd = list(range(a + 1, t))
    if direction == "bwd_fwd":
        first, second = back, fwd
    elif direction == "fwd_bwd":
        first, second = fwd, back
    else:
        raise NotImplementedError(f"unknown propagation direction: {direction}")
    order = np.array(first + second, dtype=np.int32)
    reset = np.zeros(len(order), dtype=np.float32)
    if len(second) > 0:
        reset[len(first)] = 1.0
    valid = np.ones(len(order), dtype=np.float32)
    return order, reset, valid


class TAPNetAdapter:
    """VOSAdapter implementation around TAPNet."""

    name = "tapnet"

    def __init__(self, params, encode_chunk: int = 8, scribble_dilation: int = 3,
                 qa_dtype=jnp.float32):
        self.params = params
        self.encode_chunk = encode_chunk
        self.scribble_dilation = scribble_dilation
        # storage dtype of the returned all_P (cfg.assess_net.bf16_inputs);
        # masks are computed before the cast and are dtype-invariant
        self.qa_dtype = qa_dtype

    @classmethod
    def create(cls, seed: int = 0, ckpt_dir: Optional[str] = None,
               qa_dtype=jnp.float32):
        params = None
        if ckpt_dir is not None:
            from ivosw_tpu.utils.checkpoint import load_pytree
            import os

            tree = load_pytree(os.path.join(ckpt_dir, "tapnet.orbax"))
            if tree is not None:
                params = tree["params"] if "params" in tree else tree
        if params is None:
            params = init_tapnet_params(seed)
        return cls(params, qa_dtype=qa_dtype)

    # -------------------------------------------------------------------- #
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
        feats = (
            jnp.asarray(np.concatenate(r4s)),
            jnp.asarray(np.concatenate(r3s)),
            jnp.asarray(np.concatenate(r2s)),
        )
        p = feats[0].shape[1] * feats[0].shape[2]
        c = feats[0].shape[3]
        return _TAPState(
            feats=feats,
            num_objects=num_objects,
            hw=(h, w),
            prob_maps=jnp.zeros((t, num_objects, h, w), dtype=jnp.float32),
            mem_keys=jnp.zeros((num_objects, MAX_ROUNDS_MEM * p, c), jnp.bfloat16),
            mem_valid=np.zeros((num_objects, MAX_ROUNDS_MEM * p), dtype=np.float32),
            frame_cache=np.asarray(frames, dtype=np.float32),
        )

    def _interaction_channels(
        self, state: _TAPState, scribbles: Dict, frame: int
    ) -> np.ndarray:
        """Per-object [O, H, W, 3] interaction input
        (reference utils/utils_atnet.py:31-52 channel recipe)."""
        h, w = state.hw
        o = state.num_objects
        scrib = scribble_masks_per_object(
            scribbles, (h, w), frame, o, dilation=self.scribble_dilation
        )  # [O+1, H, W]
        out = np.zeros((o, h, w, 3), dtype=np.float32)
        any_scrib = scrib.sum(axis=0)
        prev_frame_probs = (
            None if state.round == 1 else np.asarray(state.prob_maps[frame])
        )
        for obj in range(1, o + 1):
            pos = scrib[obj]
            neg = np.clip(any_scrib - pos, 0.0, 1.0)
            if state.round == 1:
                prev = np.full((h, w), 0.5, dtype=np.float32)
                neg = np.zeros_like(pos)
            else:
                prev = prev_frame_probs[obj - 1]
            out[obj - 1] = np.stack([prev, pos, neg], axis=-1)
        return out

    def segment(
        self, state: _TAPState, scribbles: Dict, annotated_frame: int, n_interaction: int
    ):
        state.round = n_interaction
        t = state.prob_maps.shape[0]
        h, w = state.hw
        o = state.num_objects
        a = int(annotated_frame)

        # ---- A-Net on the annotated frame ----
        interaction = self._interaction_channels(state, scribbles, a)
        img_o = np.broadcast_to(
            state.frame_cache[a][None], (o,) + state.frame_cache[a].shape
        )
        anno_prob_dev, anno_r4 = _interact_round_jit(
            self.params, jnp.asarray(img_o), jnp.asarray(interaction)
        )
        anno_prob = jnp.asarray(anno_prob_dev)  # [O, H, W]

        # ---- update annotated-frame memory (static ring) ----
        p = anno_r4.shape[1] * anno_r4.shape[2]
        slot = (len(state.annotated)) % MAX_ROUNDS_MEM
        state.mem_keys = jax.lax.dynamic_update_slice(
            state.mem_keys,
            anno_r4.reshape(o, p, -1).astype(state.mem_keys.dtype),
            (0, slot * p, 0),
        )
        state.mem_valid[:, slot * p : (slot + 1) * p] = 1.0
        prev_annotated = np.array(state.annotated, dtype=np.int64)
        state.annotated.append(a)

        # ---- propagation (all device-side; only labels leave the chip) ----
        order, reset, valid = prop_order(t, a)
        alpha = compute_alpha(t, prev_annotated, a)
        order_dev = jnp.asarray(order)
        if len(order) > 0:
            outs = _propagate_round_jit(
                self.params,
                state.feats[0][order_dev],
                state.feats[1][order_dev],
                state.feats[2][order_dev],
                state.mem_keys,
                jnp.asarray(state.mem_valid),
                anno_prob,
                state.prob_maps[order_dev],
                jnp.asarray(alpha[order]),
                jnp.asarray(reset),
                jnp.asarray(valid),
                (h, w),
            )
            state.prob_maps = state.prob_maps.at[order_dev].set(outs)
        state.prob_maps = state.prob_maps.at[a].set(anno_prob)

        from ivosw_tpu.models.vos.layers import labels_and_probs

        labels_dev, all_p = labels_and_probs(state.prob_maps, dtype=self.qa_dtype)
        return np.asarray(labels_dev), all_p, state


def init_tapnet_params(seed: int = 0, hw=(64, 64)):
    """Initialise TAPNet params with a tiny dummy trace (shape-agnostic)."""
    model = TAPNet()
    h, w = hw
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    interaction = jnp.zeros((1, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(seed), img, interaction)
    return variables["params"]
