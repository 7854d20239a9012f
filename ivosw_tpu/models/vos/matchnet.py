"""MatchNet: pixel-matching VOS backbone (MANet-family), JAX-native.

Capability parity with the reference's MANet path
(``utils/utils_manet.py:59-163`` + the external VOS/MANet repo): per-sequence
frame embeddings are precomputed ONCE (``eval_agent_manet.py:315-334``); an
interaction head segments the scribbled frame from its embedding + scribble
labels + previous-round label; a propagation head walks frames forward then
backward from the annotated frame, conditioning each step on

- GLOBAL matching: per-object max feature-similarity maps against the
  annotated reference frame (accumulated across rounds with a running max —
  MANet's eval_global_map),
- LOCAL matching: the same against the immediately previous frame,
- the previous frame's label map,

then argmax over objects (softmax probabilities returned).

TPU-native design: similarity maps are plain [P, P] matmuls on the MXU with
masked-max reductions — the matching core of MANet without its per-frame
Python loop; both propagation directions are one `lax.scan` over a
host-computed frame permutation (shared machinery with TAPNet).

Matching and guidance live at the /4 feature scale (r2), NOT /16: scribbles
and per-pixel similarity bilinearly squashed to /16 carry no signal at small
operating points (48x64 demo clips -> a 3x4 grid), and pixel-matching VOS in
the MANet family is fine-grained by construction. The heads are guided
decoders: context flows down from r4, and the /4 stage concatenates r2 with
the scribble / match / previous-label guidance planes before the final
logits. This also lands the similarity einsums on the MXU at useful sizes
(P = H*W/16 pixels per frame).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ivosw_tpu.data.scribbles import scribble_masks_per_object
from ivosw_tpu.models.vos.layers import ConvBlock, VOSEncoder, resize_like
from ivosw_tpu.models.vos.tapnet import prop_order


class GuidedHead(nn.Module):
    """r4 context decoded up to /4, where guidance planes are injected.

    guide4: [O, h4, w4, G] — scribble pos/neg + prev label (interaction)
    or global/local match maps + prev-frame label + previous-ROUND map
    (propagation; the last channel lets the head learn ATNet-style
    keep-or-overwrite fusion across rounds, utils/utils_atnet.py:126-147)."""

    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, emb_r4, emb_r3, emb_r2, guide4, out_hw):
        x = ConvBlock(256, 3, 1, self.dtype, name="ctx")(emb_r4.astype(self.dtype))
        x = resize_like(x, emb_r3)
        x = ConvBlock(128, 3, 1, self.dtype, name="mid")(
            jnp.concatenate([x, emb_r3.astype(self.dtype)], axis=-1)
        )
        x = resize_like(x, emb_r2)
        x = ConvBlock(64, 3, 1, self.dtype, name="fuse")(
            jnp.concatenate(
                [x, emb_r2.astype(self.dtype), guide4.astype(self.dtype)], axis=-1
            )
        )
        x = ConvBlock(64, 3, 1, self.dtype, name="refine")(x)
        logit = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=jnp.float32)(
            x.astype(jnp.float32)
        )
        logit = jax.image.resize(
            logit, logit.shape[:1] + out_hw + (1,), method="bilinear"
        )
        return logit[..., 0]


class MatchNet(nn.Module):
    dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.encoder = VOSEncoder(dtype=self.dtype, name="emb_enc")
        self.int_head = GuidedHead(dtype=self.dtype, name="int_head")
        self.prop_head = GuidedHead(dtype=self.dtype, name="prop_head")

    def encode(self, frames):
        return self.encoder(frames)

    def interact(self, emb_r4, emb_r3, emb_r2, guide4, out_hw):
        return self.int_head(emb_r4, emb_r3, emb_r2, guide4, out_hw)

    def propagate(self, emb_r4, emb_r3, emb_r2, guide4, out_hw):
        return self.prop_head(emb_r4, emb_r3, emb_r2, guide4, out_hw)

    def __call__(self, frames, guide_int, guide_prop, out_hw):  # init path
        r4, r3, r2 = self.encoder(frames)
        o = guide_int.shape[0]
        r4o = jnp.broadcast_to(r4, (o,) + r4.shape[1:])
        r3o = jnp.broadcast_to(r3, (o,) + r3.shape[1:])
        r2o = jnp.broadcast_to(r2, (o,) + r2.shape[1:])
        a = self.int_head(r4o, r3o, r2o, guide_int, out_hw)
        b = self.prop_head(r4o, r3o, r2o, guide_prop, out_hw)
        return a, b


# ------------------------------------------------------- jitted programs --
def _encode_chunk(params, frames):
    return MatchNet().apply({"params": params}, frames, method=MatchNet.encode)


_encode_chunk_jit = jax.jit(_encode_chunk)


def _downsample_to(maps, h, w):
    """[K, H, W] → [K, h, w] (area-style via bilinear resize)."""
    return jax.image.resize(maps, (maps.shape[0], h, w), method="bilinear")


def _interact_jit_fn(params, emb_r4, emb_r3, emb_r2, scrib_maps, prev_label, out_hw):
    """scrib_maps: [O+1, H, W]; prev_label: [O, H, W] probabilities."""
    o = prev_label.shape[0]
    h4, w4 = emb_r2.shape[0:2]
    pos = _downsample_to(scrib_maps[1:], h4, w4)  # [O, h4, w4]
    neg_all = jnp.clip(scrib_maps.sum(0, keepdims=True) - scrib_maps[1:], 0, 1)
    neg = _downsample_to(neg_all, h4, w4)
    prev = _downsample_to(prev_label, h4, w4)
    guide4 = jnp.stack([pos, neg, prev], axis=-1).astype(jnp.bfloat16)
    r4o = jnp.broadcast_to(emb_r4[None], (o,) + emb_r4.shape)
    r3o = jnp.broadcast_to(emb_r3[None], (o,) + emb_r3.shape)
    r2o = jnp.broadcast_to(emb_r2[None], (o,) + emb_r2.shape)
    logit = MatchNet().apply(
        {"params": params}, r4o, r3o, r2o, guide4, out_hw,
        method=MatchNet.interact,
    )
    return jax.nn.sigmoid(logit)  # [O, H, W]


_interact_jit = jax.jit(_interact_jit_fn, static_argnames=("out_hw",))


def _object_sim_maps(emb, ref_emb, ref_probs, dtype=jnp.bfloat16):
    """Max cosine-similarity map per object.

    emb: [h, w, C]; ref_emb: [h, w, C]; ref_probs: [O, h, w] (all at the
    matching scale, /4). Returns [O, h, w] in [-1, 1].
    """
    h, w, c = emb.shape
    q = emb.reshape(h * w, c).astype(jnp.float32)
    k = ref_emb.reshape(h * w, c).astype(jnp.float32)
    qn = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-6)
    kn = k / (jnp.linalg.norm(k, axis=-1, keepdims=True) + 1e-6)
    sim = jnp.einsum(
        "pc,mc->pm", qn.astype(dtype), kn.astype(dtype),
        preferred_element_type=jnp.float32,
    )  # [P, M]
    memb = ref_probs.reshape(ref_probs.shape[0], h * w) > 0.5  # [O, M]
    masked = jnp.where(memb[:, None, :], sim[None], -1.0)  # [O, P, M]
    return jnp.max(masked, axis=-1).reshape(-1, h, w)


def _propagate_round_fn(
    params,
    emb_r4_ord,  # [N, h16, w16, C] in prop order
    emb_r3_ord,
    emb_r2_ord,  # [N, h4, w4, C] — also the matching features
    ref_emb,  # [h4, w4, C] annotated frame r2 embedding
    anno_prob,  # [O, H, W]
    global_map_ord,  # [N, O, h4, w4] PER-FRAME running max across rounds
    prev_round_ord,  # [N, O, H, W]
    reset_ord,  # [N]
    valid_ord,  # [N]
    out_hw,
):
    """MANet's eval_global_map is per FRAME, maxed across ROUNDS only
    (utils/utils_manet.py global_map_tmp_dic) — each scan step reads and
    updates its own frame's map; nothing leaks between frames."""
    model = MatchNet()
    o = anno_prob.shape[0]
    h4, w4 = ref_emb.shape[0:2]
    ref_probs4 = _downsample_to(anno_prob, h4, w4)

    def body(carry, inp):
        prev_prob, prev_emb = carry
        r4c, r3c, r2c, gm_t, prev_round_t, reset_t, valid_t = inp
        prev_prob = jnp.where(reset_t > 0, anno_prob, prev_prob)
        prev_emb = jnp.where(reset_t > 0, ref_emb, prev_emb)

        g = _object_sim_maps(r2c, ref_emb, ref_probs4)  # [O, h4, w4]
        global_new = jnp.maximum(gm_t, g)
        prev4 = _downsample_to(prev_prob, h4, w4)
        l = _object_sim_maps(r2c, prev_emb, prev4)
        prev_round4 = _downsample_to(prev_round_t, h4, w4)

        guide4 = jnp.stack(
            [global_new, l, prev4, prev_round4], axis=-1
        ).astype(jnp.bfloat16)
        r4o = jnp.broadcast_to(r4c[None], (o,) + r4c.shape)
        r3o = jnp.broadcast_to(r3c[None], (o,) + r3c.shape)
        r2o = jnp.broadcast_to(r2c[None], (o,) + r2c.shape)
        logit = model.apply(
            {"params": params}, r4o, r3o, r2o, guide4, out_hw,
            method=MatchNet.propagate,
        )
        prob = jax.nn.sigmoid(logit)
        out = jnp.where(valid_t > 0, prob, prev_round_t)
        gm_out = jnp.where(valid_t > 0, global_new, gm_t)
        new_prev = jnp.where(valid_t > 0, prob, prev_prob)
        new_emb = jnp.where(valid_t > 0, r2c, prev_emb)
        return (new_prev, new_emb), (out, gm_out)

    _, (outs, gm_outs) = jax.lax.scan(
        body,
        (anno_prob, ref_emb),
        (
            emb_r4_ord,
            emb_r3_ord,
            emb_r2_ord,
            global_map_ord,
            prev_round_ord,
            reset_ord[:, None, None, None],
            valid_ord[:, None, None, None],
        ),
    )
    return outs, gm_outs


_propagate_round_jit = jax.jit(_propagate_round_fn, static_argnames=("out_hw",))


# ----------------------------------------------------------------- state --
@dataclass
class _MatchState:
    feats: Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
    num_objects: int
    hw: Tuple[int, int]
    prob_maps: jnp.ndarray  # [T, O, H, W] (ON DEVICE)
    global_map: jnp.ndarray  # [T, O, h4, w4] per-frame max over rounds
    annotated: List[int] = field(default_factory=list)
    round: int = 0


class MatchNetAdapter:
    name = "matchnet"

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

            tree = load_pytree(os.path.join(ckpt_dir, "matchnet.orbax"))
            if tree is not None:
                params = tree.get("params", tree)
        if params is None:
            params = init_matchnet_params(seed)
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
        feats = (
            jnp.asarray(np.concatenate(r4s)),
            jnp.asarray(np.concatenate(r3s)),
            jnp.asarray(np.concatenate(r2s)),
        )
        h4, w4 = feats[2].shape[1:3]
        return _MatchState(
            feats=feats,
            num_objects=num_objects,
            hw=(h, w),
            prob_maps=jnp.zeros((t, num_objects, h, w), dtype=jnp.float32),
            global_map=jnp.full((t, num_objects, h4, w4), -1.0, jnp.float32),
        )

    def segment(
        self, state: _MatchState, scribbles: Dict, annotated_frame: int, n_interaction: int
    ):
        state.round = n_interaction
        t = state.prob_maps.shape[0]
        h, w = state.hw
        a = int(annotated_frame)

        scrib_maps = scribble_masks_per_object(
            scribbles, (h, w), a, state.num_objects, dilation=self.scribble_dilation
        )
        anno_prob = _interact_jit(
            self.params,
            state.feats[0][a],
            state.feats[1][a],
            state.feats[2][a],
            jnp.asarray(scrib_maps),
            state.prob_maps[a],
            (h, w),
        )
        state.annotated.append(a)

        # MANet parity: forward then backward (reference utils/utils_manet.py:87-154)
        order, reset, valid = prop_order(t, a, direction="fwd_bwd")
        order_dev = jnp.asarray(order)
        if len(order) > 0:
            outs, gm_outs = _propagate_round_jit(
                self.params,
                state.feats[0][order_dev],
                state.feats[1][order_dev],
                state.feats[2][order_dev],
                state.feats[2][a],
                anno_prob,
                state.global_map[order_dev],
                state.prob_maps[order_dev],
                jnp.asarray(reset),
                jnp.asarray(valid),
                (h, w),
            )
            state.prob_maps = state.prob_maps.at[order_dev].set(outs)
            state.global_map = state.global_map.at[order_dev].set(gm_outs)
        state.prob_maps = state.prob_maps.at[a].set(anno_prob)

        from ivosw_tpu.models.vos.layers import labels_and_probs

        labels_dev, all_p = labels_and_probs(state.prob_maps, dtype=self.qa_dtype)
        return np.asarray(labels_dev), all_p, state


def init_matchnet_params(seed: int = 0, hw=(64, 64)):
    model = MatchNet()
    h, w = hw
    frames = jnp.zeros((1, h, w, 3), jnp.float32)
    guide_int = jnp.zeros((2, h // 4, w // 4, 3), jnp.bfloat16)
    guide_prop = jnp.zeros((2, h // 4, w // 4, 4), jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(seed), frames, guide_int, guide_prop, (h, w)
    )
    return variables["params"]
