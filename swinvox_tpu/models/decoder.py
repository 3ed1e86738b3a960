"""Per-view 2D -> 3D lifting decoder.

Semantics of reference models/decoder.py: adaptive-avg-pool the 7x7 encoder
features to 2x2, replicate along a new depth axis into a 2^3 cube, then a
3D transposed-conv chain 256 -> 128 -> 64 -> 32 -> 8 doubling the grid
2^3 -> 32^3, and a final 1x1x1 tconv to 1-channel occupancy **logits**.

Layout: NDHWC.  Returns
  raw_features [B, N, 32, 32, 32, 9]  (8 feature channels + 1 logit channel)
  coarse       [B, N, 32, 32, 32]     logits per view
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.layers import (
    ConvTranspose,
    Norm,
    adaptive_avg_pool_7_to_2,
)

Dtype = Any


class Decoder(nn.Module):
    tconv_use_bias: bool = False
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, image_features: jax.Array, train: bool
    ) -> Tuple[jax.Array, jax.Array]:
        b, n_views, h, w, c = image_features.shape
        x = image_features.reshape(b * n_views, h, w, c)

        x = adaptive_avg_pool_7_to_2(x)  # [BN, 2, 2, 256]
        # replicate along a new leading depth axis -> [BN, 2, 2, 2, 256]
        x = jnp.broadcast_to(x[:, None], (b * n_views, 2, 2, 2, c))

        specs = [  # (features, kernel, padding)
            (128, (6, 4, 4), (2, 1, 1)),
            (64, (4, 4, 4), (1, 1, 1)),
            (32, (4, 4, 4), (1, 1, 1)),
            (8, (4, 4, 4), (1, 1, 1)),
        ]
        for i, (feats, kernel, pad) in enumerate(specs):
            x = ConvTranspose(
                feats,
                kernel,
                strides=2,
                padding=pad,
                use_bias=self.tconv_use_bias,
                dtype=self.dtype,
                name=f"tconv{i + 1}",
            )(x)
            x = Norm(dtype=self.dtype, name=f"bn{i + 1}")(x, train)
            x = nn.relu(x)

        raw = x  # [BN, 32, 32, 32, 8]
        logits = ConvTranspose(
            1,
            (1, 1, 1),
            strides=1,
            padding=0,
            use_bias=self.tconv_use_bias,
            dtype=self.dtype,
            name="tconv5",
        )(x)  # [BN, 32, 32, 32, 1]

        raw_features = jnp.concatenate([raw, logits], axis=-1)
        raw_features = raw_features.reshape(b, n_views, 32, 32, 32, 9)
        coarse = logits.reshape(b, n_views, 32, 32, 32)
        return raw_features, coarse
