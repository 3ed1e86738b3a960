"""Context-aware merger: per-voxel softmax weighting over views.

Semantics of reference models/merger.py: four stacked Conv3d(9->9, k3)
blocks over each view's raw features, concat of the four intermediate
outputs -> Conv3d(36->9), Conv3d(9->1) (all BatchNorm + LeakyReLU(0.2)),
softmax of the resulting per-view scalar fields over the view axis, and a
weighted sum of the per-view coarse **logit** volumes.

Layout: NDHWC; raw_features [B, N, 32, 32, 32, 9], coarse [B, N, 32^3].
Returns merged logits [B, 32, 32, 32].
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.layers import Conv, Norm

Dtype = Any


class Merger(nn.Module):
    leaky_value: float = 0.2
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, raw_features: jax.Array, coarse_volumes: jax.Array, train: bool
    ) -> jax.Array:
        b, n_views = raw_features.shape[:2]
        x = raw_features.reshape(b * n_views, 32, 32, 32, 9)

        intermediates = []
        y = x
        for i in range(4):
            y = Conv(9, (3, 3, 3), padding=1, dtype=self.dtype,
                     name=f"conv{i + 1}")(y)
            y = Norm(dtype=self.dtype, name=f"bn{i + 1}")(y, train)
            y = nn.leaky_relu(y, self.leaky_value)
            intermediates.append(y)

        y = jnp.concatenate(intermediates, axis=-1)  # [BN, 32^3, 36]
        y = Conv(9, (3, 3, 3), padding=1, dtype=self.dtype, name="conv5")(y)
        y = Norm(dtype=self.dtype, name="bn5")(y, train)
        y = nn.leaky_relu(y, self.leaky_value)

        y = Conv(1, (3, 3, 3), padding=1, dtype=self.dtype, name="conv6")(y)
        y = Norm(dtype=self.dtype, name="bn6")(y, train)
        y = nn.leaky_relu(y, self.leaky_value)

        weights = y.reshape(b, n_views, 32, 32, 32)
        weights = jax.nn.softmax(weights.astype(jnp.float32), axis=1)
        merged = jnp.sum(
            coarse_volumes.astype(jnp.float32) * weights, axis=1
        )
        return merged.astype(self.dtype)
