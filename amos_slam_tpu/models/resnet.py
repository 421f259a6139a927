"""ResNet backbone for YOLACT, in Flax.

Replaces the reference's PyTorch ResNetBackbone (src/python/backbone.py:60:
bottleneck ResNet-50/101 returning the C2..C5 stage features). Inference
runs in bfloat16 on the MXU with float32 batch-norm statistics; BN is
folded to inference form (scale/bias) since SLAM only needs forward.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class FrozenBN(nn.Module):
    """Inference batch norm: y = (x - mean) / sqrt(var + eps) * w + b.

    Parameters are stored separately (not pre-folded into convs) so torch
    checkpoints port one-to-one.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        w = self.param("scale", nn.initializers.ones, (self.features,))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        inv = jax.lax.rsqrt(var + self.eps) * w
        return x * inv.astype(x.dtype) + (b - mean * inv).astype(x.dtype)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (1, 1), use_bias=False, name="conv1")(x)
        y = FrozenBN(self.planes, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv2",
        )(y)
        y = FrozenBN(self.planes, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.planes * self.expansion, (1, 1), use_bias=False, name="conv3"
        )(y)
        y = FrozenBN(self.planes * self.expansion, name="bn3")(y)
        if self.downsample:
            identity = nn.Conv(
                self.planes * self.expansion, (1, 1),
                strides=(self.stride, self.stride), use_bias=False,
                name="down_conv",
            )(x)
            identity = FrozenBN(self.planes * self.expansion, name="down_bn")(
                identity
            )
        return nn.relu(y + identity)


class ResNet(nn.Module):
    """Returns (C2, C3, C4, C5) stage outputs; layers=(3,4,6,3) = ResNet-50."""

    layers: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, x) -> Tuple[jax.Array, ...]:
        y = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False, name="conv1"
        )(x)
        y = FrozenBN(64, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        planes = 64
        for stage, n_blocks in enumerate(self.layers):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                y = Bottleneck(
                    planes,
                    stride=stride if b == 0 else 1,
                    downsample=(b == 0),
                    name=f"layer{stage}_{b}",
                )(y)
            outs.append(y)
            planes *= 2
        return tuple(outs)
