"""Hybrid ResNet-50 + Swin-Tiny encoder with cross-view fusion.

Semantics of reference models/encoder.py: per view,
  * ResNet-50 trunk -> 1x1 reduce to 256 -> 2x2 avg-pool -> [7, 7, 256];
  * Swin-Tiny stages, each LayerNorm([H,W,C])+dropout(0.05) (the reference's
    wrapper, swin_transformer.py:62-69), then either
      - multi-stage: per-stage 1x1 reduce to 256 + strided-conv downsample
        chains to 7x7, stage features summed (encoder.py:42-75, 133-138), or
      - single-stage: last stage 1x1 reduced 768 -> 256 (encoder.py:77);
  * concat -> [7, 7, 512]; optional CrossViewAttention over the view axis;
  * fusion conv 512 -> 256 + three 3x3 conv blocks (encoder.py:89-111).

In: [B, N, 224, 224, 3] -> out [B, N, 7, 7, 256] (channels-last).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.models.cross_view import CrossViewAttention
from swinvox_tpu.models.layers import Conv, LayerNorm, Norm, avg_pool
from swinvox_tpu.models.resnet import ResNet50Trunk
from swinvox_tpu.models.swin import SwinTiny

Dtype = Any

_SWIN_CHANNELS = (96, 192, 384, 768)


class Encoder(nn.Module):
    use_swin_multi_stage: bool = True
    swin_stages: Tuple[int, ...] = (0, 1, 2, 3)
    use_cross_view_attention: bool = True
    cross_att_num_heads: int = 4
    cross_att_reduction_ratio: int = 4
    att_spatial_downsample_ratio: int = 2
    swin_drop_path_rate: float = 0.1
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False
    use_pallas_swin_block: bool = False
    use_pallas_swin_block_train: bool = False
    use_rewindow_chain: bool = True
    pallas_interpret: bool = False  # run kernels in the Pallas interpreter
    # backbone scale knobs (defaults = reference's ResNet-50 + Swin-Tiny;
    # smaller settings give cheap CI variants and a model-family axis)
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    resnet_stage_depths: Tuple[int, int, int] = (3, 4, 6)

    @nn.compact
    def __call__(self, rendering_images: jax.Array, train: bool) -> jax.Array:
        b, n_views, h, w, c = rendering_images.shape
        img = rendering_images.reshape(b * n_views, h, w, c).astype(self.dtype)

        # ---- ResNet branch ------------------------------------------------
        rf = ResNet50Trunk(
            dtype=self.dtype,
            stage_depths=self.resnet_stage_depths,
            name="resnet",
        )(img, train)
        rf = Conv(256, (1, 1), dtype=self.dtype, name="resnet_reduce")(rf)
        rf = avg_pool(rf, 2)  # [BN, 7, 7, 256]

        # ---- Swin branch --------------------------------------------------
        all_stages = SwinTiny(
            depths=self.swin_depths,
            drop_path_rate=self.swin_drop_path_rate,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_pallas_block=self.use_pallas_swin_block,
            use_pallas_block_train=self.use_pallas_swin_block_train,
            use_rewindow_chain=self.use_rewindow_chain,
            pallas_interpret=self.pallas_interpret,
            name="swin",
        )(img, train)
        # reference wrapper: per selected stage LayerNorm([C,H,W]) + dropout
        selected = []
        for j, stage_idx in enumerate(self.swin_stages):
            feat = all_stages[stage_idx]
            feat = LayerNorm(dtype=self.dtype, num_axes=3,
                             name=f"swin_stage_norm{j}")(feat)
            feat = nn.Dropout(0.05, deterministic=not train)(feat)
            selected.append(feat)

        if self.use_swin_multi_stage:
            processed = []
            for j, (stage_idx, feat) in enumerate(
                zip(self.swin_stages, selected)
            ):
                feat = Conv(256, (1, 1), dtype=self.dtype,
                            name=f"swin_reduce{j}")(feat)
                # strided-conv chain down to 7x7: stage s needs (3 - s) steps
                for step in range(3 - stage_idx):
                    feat = Conv(
                        256, (3, 3), strides=2, padding=1, dtype=self.dtype,
                        name=f"swin_down{j}_{step}_conv",
                    )(feat)
                    feat = Norm(dtype=self.dtype,
                                name=f"swin_down{j}_{step}_bn")(feat, train)
                    feat = nn.relu(feat)
                processed.append(feat)
            sf = sum(processed)  # [BN, 7, 7, 256]
        else:
            sf = Conv(256, (1, 1), dtype=self.dtype, name="swin_reduce")(
                selected[-1]
            )

        # ---- fuse ---------------------------------------------------------
        fused = jnp.concatenate([rf, sf], axis=-1)  # [BN, 7, 7, 512]
        fused = fused.reshape(b, n_views, 7, 7, 512)

        if self.use_cross_view_attention:
            fused = CrossViewAttention(
                in_channels=512,
                num_heads=self.cross_att_num_heads,
                reduction_ratio=self.cross_att_reduction_ratio,
                spatial_downsample_ratio=self.att_spatial_downsample_ratio,
                dtype=self.dtype,
                name="cross_view_attention",
            )(fused, train)

        x = fused.reshape(b * n_views, 7, 7, 512)
        for i, name in enumerate(["fusion", "layer1", "layer2", "layer3"]):
            x = Conv(
                256, (3, 3), padding=1, dtype=self.dtype, name=f"{name}_conv"
            )(x)
            x = Norm(dtype=self.dtype, name=f"{name}_bn")(x, train)
            x = nn.relu(x)

        return x.reshape(b, n_views, 7, 7, 256)
