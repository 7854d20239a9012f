"""AssessNet: per-frame, per-object mask-quality regressor.

Capability parity with the reference AssessNet (``models/assessment.py``):
prob>0.5 mask → ROI box (min 128 px side, 1.5× context) → 256×256 bilinear
ROI crop of (image, prob map) → ResNet-50 trunk whose stem fuses a 1-channel
prob conv into conv1 (``x = conv1(f) + conv1_p(p)``,
``models/assessment.py:54``) → global average of r5 → FC 2048→1.

TPU-native design: the reference scores one (frame, object) pair per forward
with a host bbox loop inside (``all2yxhw``), and the caller loops objects in
Python (``utils/utils_agent.py:107-119``). Here :func:`score_clip` scores ALL
T×O pairs in one jitted device program — bbox as masked reductions, ROI crop
as separable MXU matmuls (:mod:`ivosw_tpu.ops.roi`), encoder in bfloat16 —
which is the headline ≥10× scored-frames/sec target of the rebuild.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ivosw_tpu.models.resnet import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    ResNet50Trunk,
)
from ivosw_tpu.ops.roi import mask_to_yxhw

ROI_SIZE = 256


class AssessNet(nn.Module):
    """Quality regressor over pre-cropped (image, prob) ROI pairs (NHWC).

    ``fold=True`` is the inference-optimised variant: the ImageNet
    normalisation, the two stem convs (``conv1`` + ``conv1_p``) and every
    BatchNorm are folded into bias-carrying convs over the raw bf16 crops —
    one 4-channel ``conv_stem`` replaces normalise→cast→conv+conv→BN (three
    full passes over the 256² activations). Parameters for this variant are
    produced from trained standard variables by
    :func:`ivosw_tpu.models.fold.fold_assess_variables`; numerics are
    parity-tested to bf16 tolerance.
    """

    dtype: jnp.dtype = jnp.bfloat16
    fold: bool = False

    @nn.compact
    def __call__(self, tf_roi, tp_roi, train: bool = False):
        # tf_roi: [B, 256, 256, 3] in [0, 1]; tp_roi: [B, 256, 256, 1]
        if self.fold:
            assert not train, "folded AssessNet is inference-only"
            # mean subtraction stays outside the conv (exactness at the
            # zero-padded border — ivosw_tpu/models/fold.py docstring); the
            # 1/std scale and bn1 live in conv_stem's kernel/bias
            fused = jnp.concatenate(
                [
                    tf_roi.astype(self.dtype) - IMAGENET_MEAN.astype(self.dtype),
                    tp_roi.astype(self.dtype),
                ],
                axis=-1,
            )
            x = nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                use_bias=True,
                dtype=self.dtype,
                name="conv_stem",
            )(fused)
        else:
            f = (tf_roi - IMAGENET_MEAN) / IMAGENET_STD
            f = f.astype(self.dtype)
            p = tp_roi.astype(self.dtype)

            conv_stem = lambda ch_name, use_bias: nn.Conv(
                64,
                (7, 7),
                strides=(2, 2),
                padding=[(3, 3), (3, 3)],
                use_bias=use_bias,
                dtype=self.dtype,
                name=ch_name,
            )
            x = conv_stem("conv1", False)(f) + conv_stem("conv1_p", False)(p)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=self.dtype,
                name="bn1",
            )(x)
        c1 = nn.relu(x)
        r5, _, _, _ = ResNet50Trunk(dtype=self.dtype, fold=self.fold, name="trunk")(
            c1, train
        )
        pooled = jnp.mean(r5, axis=(1, 2))  # global avg == avg_pool2d(r5, 8)
        q = nn.Dense(1, dtype=jnp.float32, name="fc1")(pooled.astype(jnp.float32))
        return q


def init_assess_variables(key, dtype=jnp.bfloat16) -> Dict[str, Any]:
    model = AssessNet(dtype=dtype)
    dummy_f = jnp.zeros((1, ROI_SIZE, ROI_SIZE, 3), jnp.float32)
    dummy_p = jnp.zeros((1, ROI_SIZE, ROI_SIZE, 1), jnp.float32)
    return model.init(key, dummy_f, dummy_p, train=False)


def init_from_imagenet(path: str, seed: int = 0) -> Dict[str, Any] | None:
    """AssessNet variables with the ResNet-50 trunk loaded from a
    torchvision-format resnet50 state_dict file — the training-from-scratch
    analogue of the reference's ImageNet-pretrained encoder
    (reference models/assessment.py:28-39). None if missing/unreadable."""
    from ivosw_tpu.utils.torch_import import init_assess_from_imagenet

    return init_assess_from_imagenet(path, seed=seed)


def assess_forward(
    variables: Dict[str, Any],
    tf: jnp.ndarray,
    tp: jnp.ndarray,
    dtype=jnp.bfloat16,
    train: bool = False,
    rngs: Optional[dict] = None,
):
    """Full reference-forward semantics on a batch.

    tf: [B, H, W, 3] frames in [0, 1]; tp: [B, H, W] prob maps.
    Returns [B, 1] quality predictions (and new batch_stats when train=True).

    Precision note: this (training) path crops in f32 while the inference
    scoring path (:func:`score_clip`) crops in bf16 — a deliberate asymmetry
    (full-precision gradients vs half the HBM traffic at eval). The inputs
    are cast to bf16 inside the net either way, so the train/inference
    input mismatch is one rounding step of the ROI interpolation.
    """
    tm = (tp > 0.5).astype(jnp.float32)
    tb = mask_to_yxhw(tm, scale=1.5)
    # fused C=4 crop: frame and prob map share one separable-matmul pass
    # (one image read instead of two; pallas kernel when enabled)
    from ivosw_tpu.kernels.roi_pallas import roi_crop_best

    fused = jnp.concatenate([tf, tp[..., None]], axis=-1).astype(jnp.float32)
    roi = roi_crop_best(fused, tb, ROI_SIZE)
    tf_roi, tp_roi = roi[..., :3], roi[..., 3:]
    model = AssessNet(dtype=dtype)
    if train:
        return model.apply(
            variables, tf_roi, tp_roi, train=True, mutable=["batch_stats"]
        )
    return model.apply(variables, tf_roi, tp_roi, train=False)


def _chunk_slices(t: int, chunk: int):
    """Static [start, end) frame slices covering t in steps of chunk."""
    return [(s, min(s + chunk, t)) for s in range(0, t, chunk)]


@functools.partial(jax.jit, static_argnames=("impl", "chunk"))
def score_clip(
    variables: Dict[str, Any],
    frames: jnp.ndarray,
    probs: jnp.ndarray,
    obj_valid: jnp.ndarray,
    impl: str = "auto",
    chunk: int | None = None,
) -> jnp.ndarray:
    """Score every (frame, object) pair of a clip in one device pass.

    frames: [T, H, W, 3]; probs: [T, O, H, W] per-object foreground
    probabilities (background channel already dropped); obj_valid: [O] 1/0
    mask for padded object slots. Returns [T, O] scores with invalid slots
    zeroed. Replaces the per-object host loop of utils/utils_agent.py:103-121.

    The whole bbox+crop stage goes through :func:`ivosw_tpu.kernels.
    roi_pallas.roi_crop_pairs_from_probs` — one dispatch point; ``impl``
    selects the fused-bbox pallas kernel / the XLA einsum path / env-driven
    auto. The frame tensor is never broadcast/materialised at T×O (that
    would be ~1 GB of HBM traffic at DAVIS scale); only the 256² crops
    exist per pair.

    chunk: when set and < T, crop+encode run per chunk-frame slice inside
    the SAME program (static unroll). Measured on v5e at 480p/T=64/O=3 the
    interleaved geometry runs ~10 % faster than the monolithic one — the
    per-chunk conv batch tiles better and chunk k+1's crop HBM traffic
    overlaps chunk k's convs — and its per-chunk peak matches the eval
    loop's chunked dispatches (`results/perf_probe.json` v4 vs v0/v5).
    """
    if chunk and probs.shape[0] > chunk:
        parts = [
            _score_clip_body(variables, frames[s:e], probs[s:e], obj_valid, impl)
            for s, e in _chunk_slices(probs.shape[0], chunk)
        ]
        return jnp.concatenate(parts, axis=0)
    return _score_clip_body(variables, frames, probs, obj_valid, impl)


def _score_clip_body(variables, frames, probs, obj_valid, impl):
    from ivosw_tpu.kernels.roi_pallas import roi_crop_pairs_from_probs

    t, o = probs.shape[0], probs.shape[1]
    # bf16 crop: the encoder consumes bf16 anyway; f32 contractions here
    # would cost 6-pass HIGHEST MXU dots + double the HBM traffic
    tf_roi, tp_roi = roi_crop_pairs_from_probs(
        frames, probs, ROI_SIZE, dtype=jnp.bfloat16, impl=impl
    )

    model = AssessNet(dtype=jnp.bfloat16)
    q = model.apply(variables, tf_roi, tp_roi, train=False)
    return q.reshape(t, o) * obj_valid[None, :]


@functools.partial(jax.jit, static_argnames=("impl", "chunk"))
def score_clip_folded(
    folded_variables: Dict[str, Any],
    frames: jnp.ndarray,
    probs: jnp.ndarray,
    obj_valid: jnp.ndarray,
    impl: str = "auto",
    chunk: int | None = None,
) -> jnp.ndarray:
    """:func:`score_clip` on BN-folded params (see :mod:`ivosw_tpu.models.fold`).

    Same contract and (to bf16 tolerance) same numerics; the encoder runs the
    constant-folded graph: bf16 crops feed one 4-channel stem conv, no BN ops,
    no f32 normalisation pass. ``chunk`` as in :func:`score_clip` (same ~10 %
    interleaved-geometry win, perf_probe.json v4)."""
    if chunk and probs.shape[0] > chunk:
        parts = [
            _score_clip_folded_body(
                folded_variables, frames[s:e], probs[s:e], obj_valid, impl
            )
            for s, e in _chunk_slices(probs.shape[0], chunk)
        ]
        return jnp.concatenate(parts, axis=0)
    return _score_clip_folded_body(folded_variables, frames, probs, obj_valid, impl)


def _score_clip_folded_body(folded_variables, frames, probs, obj_valid, impl):
    from ivosw_tpu.kernels.roi_pallas import roi_crop_pairs_from_probs

    t, o = probs.shape[0], probs.shape[1]
    tf_roi, tp_roi = roi_crop_pairs_from_probs(
        frames, probs, ROI_SIZE, dtype=jnp.bfloat16, impl=impl
    )

    model = AssessNet(dtype=jnp.bfloat16, fold=True)
    q = model.apply(folded_variables, tf_roi, tp_roi, train=False)
    return q.reshape(t, o) * obj_valid[None, :]


def mean_object_quality(scores: jnp.ndarray, obj_valid: jnp.ndarray) -> jnp.ndarray:
    """Mean over valid objects → per-frame predicted quality [T]."""
    denom = jnp.maximum(obj_valid.sum(), 1.0)
    return (scores * obj_valid[None, :]).sum(axis=1) / denom
