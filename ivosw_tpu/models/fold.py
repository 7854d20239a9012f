"""Inference-time constant folding for AssessNet (BN + stem fusion).

The reference runs its QA encoder with live BatchNorm modules and a host-side
per-image normalisation (``models/assessment.py:46-63``); at inference every
BN is a fixed per-channel affine, so it folds exactly into the preceding
conv's weights — and the ImageNet normalisation plus the two-stem add
(``x = conv1(f) + conv1_p(p)``) folds into ONE 4-channel conv over the raw
bf16 ROI crops.

Folding math (exact, done in f32 on the f32 master params):

    BN(conv(x)) = (conv(x) - mu) * gamma / sqrt(var + eps) + beta
                = conv'(x) + bias'      with  k      = gamma / sqrt(var+eps)
                                              conv'  = conv scaled by k (out ch)
                                              bias'  = beta - mu*k

    conv1((f - m)/s) = conv1''(f - m)        with  conv1''[:, :, c, :] /= s[c]

(the mean stays an input subtraction: the conv zero-pads its input, and the
standard path pads *normalised* zeros — folding the mean into a bias would
mis-handle the 3-px border). So the whole stem (normalise → conv1 + conv1_p
→ bn1) becomes one bias-carrying ``conv_stem`` over
``concat([crop_rgb - m, crop_prob])`` with kernel
``concat([K1/s, Kp], axis=2) * k`` and bias ``beta - mu*k``.

What this buys on TPU: the folded graph has no BN ops for XLA to schedule,
no f32 normalisation pass over the [B, 256, 256, 3] crops (the crops stay
bf16 end to end), and one stem conv instead of two. Parity with the standard
forward is pinned to bf16 tolerance in ``tests/test_fold.py``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from ivosw_tpu.models.resnet import BN_EPS, IMAGENET_STD, RESNET50_BLOCKS


def _fold_conv_bn(kernel, bn_params, bn_stats):
    """Fold one BN (affine + running stats) into the preceding conv.

    Returns (kernel', bias') in f32."""
    gamma = bn_params["scale"].astype(jnp.float32)
    beta = bn_params["bias"].astype(jnp.float32)
    mu = bn_stats["mean"].astype(jnp.float32)
    var = bn_stats["var"].astype(jnp.float32)
    k = gamma / jnp.sqrt(var + BN_EPS)
    kernel = kernel.astype(jnp.float32) * k  # broadcast over [kh, kw, cin, OUT]
    bias = beta - mu * k
    return kernel, bias


def _fold_bottleneck(p: Dict, s: Dict, downsample: bool) -> Dict:
    out: Dict[str, Any] = {}
    for conv_name, bn_name in (
        ("conv1", "bn1"),
        ("conv2", "bn2"),
        ("conv3", "bn3"),
    ):
        kernel, bias = _fold_conv_bn(p[conv_name]["kernel"], p[bn_name], s[bn_name])
        out[conv_name] = {"kernel": kernel, "bias": bias}
    if downsample:
        kernel, bias = _fold_conv_bn(
            p["downsample_conv"]["kernel"], p["downsample_bn"], s["downsample_bn"]
        )
        out["downsample_conv"] = {"kernel": kernel, "bias": bias}
    return out


def fold_assess_variables(variables: Dict[str, Any]) -> Dict[str, Any]:
    """Trained AssessNet variables → params for ``AssessNet(fold=True)``."""
    p = variables["params"]
    s = variables["batch_stats"]

    # --- stem: 1/std + conv1 + conv1_p + bn1 → conv_stem (mean stays an
    # input subtraction; see module docstring) -------------------------------
    k1 = p["conv1"]["kernel"].astype(jnp.float32)  # [7, 7, 3, 64]
    kp = p["conv1_p"]["kernel"].astype(jnp.float32)  # [7, 7, 1, 64]
    inv_std = (1.0 / IMAGENET_STD).astype(jnp.float32)  # [3]
    k1n = k1 * inv_std[None, None, :, None]
    stem_kernel = jnp.concatenate([k1n, kp], axis=2)  # [7, 7, 4, 64]
    stem_kernel, stem_bias = _fold_conv_bn(stem_kernel, p["bn1"], s["bn1"])

    # --- trunk --------------------------------------------------------------
    trunk: Dict[str, Any] = {}
    for idx, (_, blocks) in enumerate(RESNET50_BLOCKS):
        stage = f"res{idx + 2}"
        trunk[stage] = {
            f"block{i}": _fold_bottleneck(
                p["trunk"][stage][f"block{i}"],
                s["trunk"][stage][f"block{i}"],
                downsample=(i == 0),
            )
            for i in range(blocks)
        }

    return {
        "params": {
            "conv_stem": {"kernel": stem_kernel, "bias": stem_bias},
            "trunk": trunk,
            "fc1": dict(p["fc1"]),
        }
    }
