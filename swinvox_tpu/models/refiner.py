"""3D U-Net-style refiner over the merged volume.

Semantics of reference models/refiner.py: three Conv3d(k4, p2) + BN +
LeakyReLU + MaxPool3d(2) levels (1->32->64->128 channels, 32^3 -> 4^3),
an FC bottleneck 8192 -> 2048 -> 8192 (ReLU), then three ConvTranspose3d
(k4, s2, p1) levels with **additive** skip connections at each resolution,
and output (input + reconstruction) * 0.5 — still logits.

Layout: NDHWC internally; takes and returns [B, 32, 32, 32] logits.
The FC flatten order is (D, H, W, C) instead of torch's (C, D, H, W) —
a reparameterization of the dense weights, consistent on both sides of the
bottleneck.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.layers import Conv, ConvTranspose, Dense, Norm, max_pool

Dtype = Any


class Refiner(nn.Module):
    leaky_value: float = 0.2
    tconv_use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    # tap-unrolled custom backward for the 1-channel first conv
    # (ops/unrolled_conv.py) — same forward, reassociated adjoints.
    # Off by default (slower in the full step; see PERFORMANCE.md)
    unrolled_first_conv: bool = False
    # fused Pallas backward for the same conv (ops/pallas_down1.py):
    # dW and dx in one kernel pass over the cotangent
    down1_pallas: bool = False
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, coarse_volumes: jax.Array, train: bool) -> jax.Array:
        x32 = coarse_volumes[..., None].astype(self.dtype)  # [B, 32^3, 1]

        def down(x, feats, name):
            conv = Conv(feats, (4, 4, 4), padding=2, dtype=self.dtype,
                        name=f"{name}_conv")
            if self.down1_pallas and x.shape[-1] == 1:
                from swinvox_tpu.ops.pallas_down1 import conv3d_down1

                # materialize the identical param tree, then run the
                # custom-backward op (forward is the same lax conv)
                conv(jnp.zeros((1, 4, 4, 4, 1), self.dtype))
                cp = conv.variables["params"]["Conv_0"]
                y = conv3d_down1(
                    x, cp["kernel"].astype(self.dtype),
                    interpret=self.pallas_interpret,
                )
                y = y + cp["bias"].astype(y.dtype)
            elif self.unrolled_first_conv and x.shape[-1] == 1:
                from swinvox_tpu.ops.unrolled_conv import conv3d_1ch

                # materialize the identical param tree, then run the
                # custom-backward op (forward is the same lax conv)
                conv(jnp.zeros((1, 4, 4, 4, 1), self.dtype))
                cp = conv.variables["params"]["Conv_0"]
                y = conv3d_1ch(x, cp["kernel"].astype(self.dtype))
                y = y + cp["bias"].astype(y.dtype)
            else:
                y = conv(x)
            y = Norm(dtype=self.dtype, name=f"{name}_bn")(y, train)
            y = nn.leaky_relu(y, self.leaky_value)
            return max_pool(y, 2)  # k4 p2 grows 32->33; pool floors to 16

        x16 = down(x32, 32, "down1")  # [B, 16^3, 32]
        x8 = down(x16, 64, "down2")  # [B, 8^3, 64]
        x4 = down(x8, 128, "down3")  # [B, 4^3, 128]

        b = x4.shape[0]
        flat = x4.reshape(b, 4 * 4 * 4 * 128)
        flat = nn.relu(Dense(2048, dtype=self.dtype, name="fc1")(flat))
        flat = nn.relu(Dense(8192, dtype=self.dtype, name="fc2")(flat))
        x4_r = x4 + flat.reshape(b, 4, 4, 4, 128)

        def up(x, feats, name):
            y = ConvTranspose(
                feats, (4, 4, 4), strides=2, padding=1,
                use_bias=self.tconv_use_bias, dtype=self.dtype,
                name=f"{name}_tconv",
            )(x)
            y = Norm(dtype=self.dtype, name=f"{name}_bn")(y, train)
            return nn.relu(y)

        x8_r = x8 + up(x4_r, 64, "up1")
        x16_r = x16 + up(x8_r, 32, "up2")
        y = ConvTranspose(
            1, (4, 4, 4), strides=2, padding=1,
            use_bias=self.tconv_use_bias, dtype=self.dtype, name="up3_tconv",
        )(x16_r)
        out = (x32 + y) * 0.5
        return out[..., 0]
