"""Cross-view attention: multi-head attention across the view axis.

Re-implements the semantics of reference models/cross_view_attention.py:
each view's feature map is projected to Q/K/V with 1x1 convs (after an
optional depthwise strided downsample), Q/K are flattened to one vector per
(view, head), attention scores are [B, heads, N, N] over views scaled by
1/sqrt(head_dim * n_views) (reference :89), softmax over views, the value
mix is projected back, bilinearly upsampled, residually added, then passed
through a 1x1-conv FFN (no skip), BatchNorm, and dropout.

Layout here is channels-last: [B, N, H, W, C].  The flattening order of the
per-view Q/K/V vectors differs from torch's (C,H,W) order — a pure
reparameterization for freshly trained weights, applied consistently to
Q, K, and V.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.layers import Conv, Norm, resize_bilinear

Dtype = Any


class CrossViewAttention(nn.Module):
    in_channels: int = 512
    num_heads: int = 4
    reduction_ratio: int = 4
    spatial_downsample_ratio: int = 2
    dropout_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        b, n_views, h, w, c = x.shape
        assert c == self.in_channels
        reduced = self.in_channels // self.reduction_ratio
        head_dim = reduced // self.num_heads

        x_flat = x.reshape(b * n_views, h, w, c)

        # optional depthwise strided downsample for Q/K/V
        r = self.spatial_downsample_ratio
        if r > 1:
            x_qkv = Conv(
                c,
                (r, r),
                strides=r,
                padding=0,
                feature_group_count=c,
                dtype=self.dtype,
                name="downsample_qkv",
            )(x_flat)
        else:
            x_qkv = x_flat
        nh, nw = x_qkv.shape[1], x_qkv.shape[2]

        qkv = Conv(3 * reduced, (1, 1), dtype=self.dtype, name="qkv_conv")(x_qkv)
        qkv = qkv.reshape(b, n_views, nh * nw, 3, self.num_heads, head_dim)
        # -> [3, B, heads, N, h*w*head_dim]
        qkv = qkv.transpose(3, 0, 4, 1, 2, 5).reshape(
            3, b, self.num_heads, n_views, nh * nw * head_dim
        )
        q, k, v = qkv[0], qkv[1], qkv[2]

        if n_views == 1:
            # softmax over a singleton view axis is exactly 1.0, so the
            # value mix IS v bitwise and the q/k gradients are exactly
            # zero (same algebra as the merger's single_view_identity,
            # models/merger.py) — skip the score/softmax/mix einsums;
            # XLA then narrows the qkv matmul and its backward to the
            # live v slice.  Exactness pinned in tests/test_models.py.
            attended = v.astype(self.dtype)
        else:
            scale = 1.0 / jnp.sqrt(jnp.float32(head_dim * n_views))
            scores = (
                jnp.einsum(
                    "bhnd,bhmd->bhnm", q, k,
                    preferred_element_type=jnp.float32,
                )
                * scale
            )
            probs = jax.nn.softmax(scores, axis=-1)  # softmax over views
            attended = jnp.einsum(
                "bhnm,bhmd->bhnd",
                probs.astype(v.dtype),
                v,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        # back to per-view feature maps [B*N, nh, nw, reduced]
        attended = attended.reshape(
            b, self.num_heads, n_views, nh * nw, head_dim
        )
        attended = attended.transpose(0, 2, 3, 1, 4).reshape(
            b * n_views, nh, nw, reduced
        )
        attended = Conv(c, (1, 1), dtype=self.dtype, name="proj_conv")(attended)

        if r > 1:
            attended = resize_bilinear(attended, (h, w))

        # residual around attention only (reference :120)
        y = attended.reshape(b, n_views, h, w, c) + x
        y = y.reshape(b * n_views, h, w, c)

        # FFN with no skip (reference :125)
        y = Conv(c, (1, 1), dtype=self.dtype, name="ffn_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = Conv(c, (1, 1), dtype=self.dtype, name="ffn_fc2")(y)

        y = Norm(dtype=self.dtype, name="batch_norm")(y, train)
        y = nn.Dropout(self.dropout_rate, deterministic=not train)(y)
        return y.reshape(b, n_views, h, w, c)
