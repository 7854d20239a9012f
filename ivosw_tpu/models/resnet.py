"""ResNet backbone (flax/linen, NHWC, bf16-friendly).

Torchvision-resnet50-compatible structure so the reference's pretrained
AssessNet checkpoint (``models/assessment.py:30-39``: conv1/bn1 + layer1..4
as res2..res5) imports by pure tensor-layout conversion. Module names are
chosen to make the torch→flax key mapping mechanical
(see :mod:`ivosw_tpu.utils.torch_import`).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

BN_MOMENTUM = 0.9  # torch momentum 0.1 ≡ flax momentum 0.9
BN_EPS = 1e-5


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    # fold=True: inference-only variant with every BatchNorm folded into the
    # preceding conv (bias-carrying convs, no BN modules). Params produced by
    # :func:`ivosw_tpu.models.fold.fold_assess_variables`.
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.fold:
            bn = lambda name: (lambda y: y)
        else:
            bn = lambda name: nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name=name,
            )
        conv = lambda feats, k, s, name: nn.Conv(
            feats,
            (k, k),
            strides=(s, s),
            padding=[(k // 2, k // 2)] * 2,
            use_bias=self.fold,
            dtype=self.dtype,
            name=name,
        )
        residual = x
        y = nn.relu(bn("bn1")(conv(self.features, 1, 1, "conv1")(x)))
        y = nn.relu(bn("bn2")(conv(self.features, 3, self.strides, "conv2")(y)))
        y = bn("bn3")(conv(self.features * 4, 1, 1, "conv3")(y))
        if self.downsample:
            residual = bn("downsample_bn")(
                conv(self.features * 4, 1, self.strides, "downsample_conv")(residual)
            )
        return nn.relu(y + residual)


class ResStage(nn.Module):
    features: int
    num_blocks: int
    strides: int
    dtype: jnp.dtype = jnp.bfloat16
    fold: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i in range(self.num_blocks):
            x = Bottleneck(
                self.features,
                strides=self.strides if i == 0 else 1,
                downsample=(i == 0),
                dtype=self.dtype,
                fold=self.fold,
                name=f"block{i}",
            )(x, train)
        return x


RESNET50_BLOCKS: Sequence[Tuple[int, int]] = ((64, 3), (128, 4), (256, 6), (512, 3))


class ResNet50Trunk(nn.Module):
    """res2..res5 stages of ResNet-50 (stem handled by the caller)."""

    dtype: jnp.dtype = jnp.bfloat16
    fold: bool = False

    @nn.compact
    def __call__(self, c1, train: bool = False):
        x = nn.max_pool(c1, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])
        feats = []
        for idx, (width, blocks) in enumerate(RESNET50_BLOCKS):
            x = ResStage(
                width,
                blocks,
                strides=1 if idx == 0 else 2,
                dtype=self.dtype,
                fold=self.fold,
                name=f"res{idx + 2}",
            )(x, train)
            feats.append(x)
        r2, r3, r4, r5 = feats
        return r5, r4, r3, r2


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], dtype=jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], dtype=jnp.float32)
