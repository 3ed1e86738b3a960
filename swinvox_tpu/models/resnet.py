"""ResNet-50 trunk (conv1 .. layer3) — the encoder's convolutional branch.

The reference takes torchvision resnet50 truncated to layer3, producing
[B*N, 1024, 14, 14] from 224^2 inputs (reference models/encoder.py:22-23,
119).  This is a from-scratch NHWC flax implementation of the same
architecture: 7x7/2 stem + 3x3/2 maxpool, then bottleneck stages
[3, 4, 6] with widths (256, 512, 1024).  Output: [B*N, 14, 14, 1024].

All parameters use the reference init scheme (see layers.py) because the
reference applies init_weights over the pretrained backbone anyway
(reference core/train.py:91-94).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.layers import Conv, Norm, max_pool

Dtype = Any


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with identity/projection shortcut."""

    width: int  # the inner (bottleneck) width; output is width * 4
    strides: int = 1
    project: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out = Conv(self.width, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = Norm(dtype=self.dtype, name="bn1")(out, train)
        out = nn.relu(out)
        out = Conv(
            self.width,
            (3, 3),
            strides=self.strides,
            padding=1,
            use_bias=False,
            dtype=self.dtype,
            name="conv2",
        )(out)
        out = Norm(dtype=self.dtype, name="bn2")(out, train)
        out = nn.relu(out)
        out = Conv(
            self.width * 4, (1, 1), use_bias=False, dtype=self.dtype, name="conv3"
        )(out)
        out = Norm(dtype=self.dtype, name="bn3")(out, train)

        shortcut = x
        if self.project:
            shortcut = Conv(
                self.width * 4,
                (1, 1),
                strides=self.strides,
                use_bias=False,
                dtype=self.dtype,
                name="downsample_conv",
            )(x)
            shortcut = Norm(dtype=self.dtype, name="downsample_bn")(shortcut, train)
        return nn.relu(out + shortcut)


class ResNet50Trunk(nn.Module):
    """conv1..layer3 of ResNet-50. [B, 224, 224, 3] -> [B, 14, 14, 1024]."""

    dtype: Dtype = jnp.bfloat16
    stage_depths: Tuple[int, int, int] = (3, 4, 6)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = Conv(
            64, (7, 7), strides=2, padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = Norm(dtype=self.dtype, name="bn1")(x, train)
        x = nn.relu(x)
        # torch maxpool k3 s2 p1: pad by 1 then VALID 3x3/2
        x = jnp.pad(
            x,
            ((0, 0), (1, 1), (1, 1), (0, 0)),
            constant_values=-jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else 0,
        )
        x = max_pool(x, 3, 2)

        widths = (64, 128, 256)
        for stage_idx, (depth, width) in enumerate(zip(self.stage_depths, widths)):
            for block_idx in range(depth):
                first = block_idx == 0
                x = Bottleneck(
                    width=width,
                    strides=2 if (first and stage_idx > 0) else 1,
                    project=first,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_block{block_idx}",
                )(x, train)
        return x
