"""The assembled SwinVox model: encoder -> decoder -> merger -> refiner.

One flax module whose submodules are named encoder/decoder/merger/refiner so
the parameter tree splits into the same four groups the reference trains,
checkpoints, and assigns per-module learning rates to (reference
core/train.py:79-149, 358-369) — but at runtime the whole pipeline is a
single jitted function with no module seams.

Forward semantics (reference core/train.py:235-261, core/test.py:118-133):
  images [B, N, H, W, 3]
    -> encoder  -> [B, N, 7, 7, 256]
    -> decoder  -> raw [B, N, 32^3, 9], coarse logits [B, N, 32^3]
    -> merger (if enabled) weighted fusion, else mean over views
    -> refiner (if enabled) on the merged logits
  returns dict(coarse_volumes, merged_volumes, refined_volumes) — all logits.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from swinvox_tpu.config import Config
from swinvox_tpu.models.decoder import Decoder
from swinvox_tpu.models.encoder import Encoder
from swinvox_tpu.models.merger import Merger
from swinvox_tpu.models.refiner import Refiner

Dtype = Any


def _dtype_from_str(s: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[s]


class SwinVoxModel(nn.Module):
    """Build with SwinVoxModel.from_config(cfg) for reference-named flags."""

    use_swin_multi_stage: bool = True
    swin_stages: Tuple[int, ...] = (0, 1, 2, 3)
    use_cross_view_attention: bool = True
    cross_att_num_heads: int = 4
    cross_att_reduction_ratio: int = 4
    att_spatial_downsample_ratio: int = 2
    use_merger: bool = True
    use_refiner: bool = True
    leaky_value: float = 0.2
    tconv_use_bias: bool = False
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False
    use_pallas_merger: bool = False
    use_pallas_merger_train: bool = False
    use_band2d_merger: bool = False
    use_slab_merger: bool = False
    use_merger_stack: bool = False
    merger_stack_max_volumes: int = 64
    merger_single_view_identity: bool = True
    refiner_unrolled_conv: bool = False
    # fused Pallas backward for the refiner's 1-channel first conv
    # (ops/pallas_down1.py): one pass over the cotangent computes both
    # dW and dx; forward unchanged (stock lax conv)
    refiner_down1_pallas: bool = False
    use_pallas_swin_block: bool = False
    use_pallas_swin_block_train: bool = False
    use_rewindow_chain: bool = True
    pallas_interpret: bool = False  # run Pallas kernels in the interpreter
    swin_depths: Tuple[int, ...] = (2, 2, 6, 2)
    resnet_stage_depths: Tuple[int, int, int] = (3, 4, 6)

    @classmethod
    def from_config(cls, cfg: Config) -> "SwinVoxModel":
        net = cfg.NETWORK
        return cls(
            use_swin_multi_stage=net.USE_SWIN_T_MULTI_STAGE,
            swin_stages=tuple(net.SWIN_T_STAGES),
            use_cross_view_attention=net.USE_CROSS_VIEW_ATTENTION,
            cross_att_num_heads=net.CROSS_ATT_NUM_HEADS,
            cross_att_reduction_ratio=net.CROSS_ATT_REDUCTION_RATIO,
            att_spatial_downsample_ratio=net.ATT_SPATIAL_DOWNSAMPLE_RATIO,
            use_merger=net.USE_MERGER,
            use_refiner=net.USE_REFINER,
            leaky_value=net.LEAKY_VALUE,
            tconv_use_bias=net.TCONV_USE_BIAS,
            dtype=_dtype_from_str(net.COMPUTE_DTYPE),
            use_pallas=net.USE_PALLAS_WINDOW_ATTENTION,
            use_pallas_merger=net.USE_PALLAS_MERGER,
            use_pallas_merger_train=net.USE_PALLAS_MERGER_TRAIN,
            use_band2d_merger=net.USE_BAND2D_MERGER,
            use_slab_merger=net.USE_SLAB_MERGER,
            use_merger_stack=net.USE_MERGER_STACK,
            merger_stack_max_volumes=net.MERGER_STACK_MAX_VOLUMES,
            merger_single_view_identity=net.MERGER_SINGLE_VIEW_IDENTITY,
            refiner_unrolled_conv=net.REFINER_UNROLLED_CONV,
            refiner_down1_pallas=net.REFINER_DOWN1_PALLAS,
            use_pallas_swin_block=net.USE_PALLAS_SWIN_BLOCK,
            use_pallas_swin_block_train=net.USE_PALLAS_SWIN_BLOCK_TRAIN,
            use_rewindow_chain=net.USE_REWINDOW_CHAIN,
            pallas_interpret=net.PALLAS_INTERPRET,
            swin_depths=tuple(net.SWIN_DEPTHS),
            resnet_stage_depths=tuple(net.RESNET_STAGE_DEPTHS),
        )

    @nn.compact
    def __call__(
        self,
        rendering_images: jax.Array,
        train: bool = False,
        enable_merger: bool = True,
        enable_refiner: bool = True,
    ) -> Dict[str, jax.Array]:
        features = Encoder(
            use_swin_multi_stage=self.use_swin_multi_stage,
            swin_stages=self.swin_stages,
            use_cross_view_attention=self.use_cross_view_attention,
            cross_att_num_heads=self.cross_att_num_heads,
            cross_att_reduction_ratio=self.cross_att_reduction_ratio,
            att_spatial_downsample_ratio=self.att_spatial_downsample_ratio,
            dtype=self.dtype,
            use_pallas=self.use_pallas,
            use_pallas_swin_block=self.use_pallas_swin_block,
            use_pallas_swin_block_train=self.use_pallas_swin_block_train,
            use_rewindow_chain=self.use_rewindow_chain,
            pallas_interpret=self.pallas_interpret,
            swin_depths=self.swin_depths,
            resnet_stage_depths=self.resnet_stage_depths,
            name="encoder",
        )(rendering_images, train)

        raw_features, coarse = Decoder(
            tconv_use_bias=self.tconv_use_bias, dtype=self.dtype, name="decoder"
        )(features, train)

        if self.use_merger and enable_merger:
            merged = Merger(
                leaky_value=self.leaky_value,
                dtype=self.dtype,
                use_pallas=self.use_pallas_merger,
                use_pallas_train=self.use_pallas_merger_train,
                use_band2d=self.use_band2d_merger,
                use_slab=self.use_slab_merger,
                use_stack=self.use_merger_stack,
                stack_max_volumes=self.merger_stack_max_volumes,
                single_view_identity=self.merger_single_view_identity,
                pallas_interpret=self.pallas_interpret,
                name="merger",
            )(raw_features, coarse, train)
        else:
            merged = jnp.mean(coarse.astype(jnp.float32), axis=1).astype(
                self.dtype
            )

        if self.use_refiner and enable_refiner:
            refined = Refiner(
                leaky_value=self.leaky_value,
                tconv_use_bias=self.tconv_use_bias,
                dtype=self.dtype,
                unrolled_first_conv=self.refiner_unrolled_conv,
                down1_pallas=self.refiner_down1_pallas,
                pallas_interpret=self.pallas_interpret,
                name="refiner",
            )(merged, train)
        else:
            refined = merged

        return {
            "coarse_volumes": coarse,
            "merged_volumes": merged,
            "refined_volumes": refined,
        }
