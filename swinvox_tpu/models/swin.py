"""Swin-Tiny backbone, implemented natively (the reference uses timm).

Architecture parity with timm's ``swin_tiny_patch4_window7_224`` consumed at
reference models/swin_transformer.py:19-24: patch size 4, window 7, embed dim
96, depths (2, 2, 6, 2), heads (3, 6, 12, 24), MLP ratio 4, qkv bias, relative
position bias, alternating W-MSA / SW-MSA (shift = window//2), patch merging
(concat 2x2 -> LN -> Linear 4C->2C no bias), stochastic depth 0.1 linearly
scaled over blocks.  Stage outputs (NHWC): [56,56,96], [28,28,192],
[14,14,384], [7,7,7,768 -> 7,7,768].

TPU-first design notes:
  * windows are flattened into the batch axis and attention runs through
    swinvox_tpu.ops.window_attention (XLA einsum or fused Pallas kernel);
  * cyclic shift is jnp.roll (lowered to cheap HBM-free slices by XLA);
  * the shifted-window mask and relative-position index are numpy constants
    baked at trace time — no dynamic shapes anywhere.
"""

from __future__ import annotations

import functools
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from swinvox_tpu.models.layers import (
    Conv,
    Dense,
    DropPath,
    LayerNorm,
    trunc_normal_init,
)
from swinvox_tpu.ops.window_attention import window_attention

Dtype = Any


@functools.lru_cache(maxsize=None)
def relative_position_index(window: int) -> np.ndarray:
    """[T, T] indices into the (2w-1)^2 relative-position bias table."""
    coords = np.stack(
        np.meshgrid(np.arange(window), np.arange(window), indexing="ij")
    )  # [2, w, w]
    flat = coords.reshape(2, -1)  # [2, T]
    rel = flat[:, :, None] - flat[:, None, :]  # [2, T, T]
    rel = rel.transpose(1, 2, 0) + (window - 1)  # shift to >= 0
    return (rel[..., 0] * (2 * window - 1) + rel[..., 1]).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shifted_window_mask(h: int, w: int, window: int, shift: int) -> np.ndarray:
    """Additive attention mask [nW, T, T] for SW-MSA (0 same-region, -100 else)."""
    img_mask = np.zeros((h, w), dtype=np.int32)
    region = 0
    for hs in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
        for ws in (slice(0, -window), slice(-window, -shift), slice(-shift, None)):
            img_mask[hs, ws] = region
            region += 1
    windows = img_mask.reshape(h // window, window, w // window, window)
    windows = windows.transpose(0, 2, 1, 3).reshape(-1, window * window)
    diff = windows[:, :, None] - windows[:, None, :]
    return np.where(diff == 0, 0.0, -100.0).astype(np.float32)


def window_partition(x: jax.Array, window: int) -> jax.Array:
    """[B, H, W, C] -> [B * nW, T, C]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // window, window, w // window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, window * window, c)


def window_unpartition(x: jax.Array, window: int, h: int, w: int) -> jax.Array:
    """[B * nW, T, C] -> [B, H, W, C]."""
    t, c = x.shape[-2:]
    b = x.shape[0] // ((h // window) * (w // window))
    x = x.reshape(b, h // window, w // window, window, window, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h, w, c)


class WindowMSA(nn.Module):
    """Multi-head self-attention within windows, with rel-pos bias.

    Owns raw qkv/proj weights so both execution paths share one parameter
    layout: the fully fused Pallas kernel (qkv projection + attention core +
    output projection in one kernel, ops/pallas_fused_msa.py) on TPU, or
    plain XLA einsums elsewhere.  Init matches the reference's init_weights
    treatment of torch Linear layers (normal(0, 0.001), helpers.py:36-41);
    the bias table keeps its native trunc-normal(0.02).
    """

    dim: int
    num_heads: int
    window: int = 7
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False

    @nn.compact
    def __call__(
        self, x_windows: jax.Array, mask: Optional[np.ndarray]
    ) -> jax.Array:
        from swinvox_tpu.models.layers import reference_dense_init

        nw, tokens, c = x_windows.shape
        head_dim = self.dim // self.num_heads

        wqkv = self.param(
            "qkv_kernel", reference_dense_init(), (c, 3 * self.dim), jnp.float32
        )
        bqkv = self.param("qkv_bias", nn.initializers.zeros, (3 * self.dim,), jnp.float32)
        wproj = self.param(
            "proj_kernel", reference_dense_init(), (self.dim, self.dim), jnp.float32
        )
        bproj = self.param("proj_bias", nn.initializers.zeros, (self.dim,), jnp.float32)

        bias_table = self.param(
            "rel_pos_bias_table",
            trunc_normal_init(0.02),
            ((2 * self.window - 1) ** 2, self.num_heads),
            jnp.float32,
        )
        idx = relative_position_index(self.window).reshape(-1)
        rel_bias = bias_table[idx].reshape(tokens, tokens, self.num_heads)
        rel_bias = rel_bias.transpose(2, 0, 1)  # [heads, T, T]

        mask_arr = None if mask is None else jnp.asarray(mask)

        if self.use_pallas and jax.default_backend() == "tpu":
            # Fully fused W-MSA: qkv projection + per-head attention + out
            # projection in one Pallas kernel (every intermediate in VMEM).
            from swinvox_tpu.ops.pallas_fused_msa import fused_window_msa

            return fused_window_msa(
                x_windows,
                wqkv.astype(self.dtype),
                bqkv.astype(self.dtype),
                wproj.astype(self.dtype),
                bproj.astype(self.dtype),
                rel_bias,
                mask_arr,
                self.num_heads,
            )

        # Head-major q/k/v via split einsums: XLA folds the [nW, heads, T,
        # hd] output layout into the GEMM epilogue, avoiding the big
        # [nW, T, 3, heads, hd] transpose of the naive packed-qkv form.
        w3 = wqkv.astype(self.dtype).reshape(c, 3, self.num_heads, head_dim)
        b3 = bqkv.astype(jnp.float32).reshape(3, self.num_heads, 1, head_dim)
        q = (
            jnp.einsum("wtc,chd->whtd", x_windows, w3[:, 0],
                       preferred_element_type=jnp.float32) + b3[0]
        ).astype(self.dtype)
        k = (
            jnp.einsum("wtc,chd->whtd", x_windows, w3[:, 1],
                       preferred_element_type=jnp.float32) + b3[1]
        ).astype(self.dtype)
        v = (
            jnp.einsum("wtc,chd->whtd", x_windows, w3[:, 2],
                       preferred_element_type=jnp.float32) + b3[2]
        ).astype(self.dtype)

        out = window_attention(
            q, k, v, rel_bias, mask_arr, use_pallas=self.use_pallas
        )
        out = (
            jnp.einsum(
                "whtd,hdc->wtc",
                out,
                wproj.astype(self.dtype).reshape(
                    self.num_heads, head_dim, self.dim
                ),
                preferred_element_type=jnp.float32,
            )
            + bproj.astype(jnp.float32)
        )
        return out.astype(self.dtype)


class SwinBlock(nn.Module):
    """LN -> (S)W-MSA -> residual -> LN -> MLP -> residual.

    Two execution paths over ONE parameter layout: the XLA path (training,
    CPU), or the whole-block Pallas megakernel at inference on TPU
    (ops/pallas_swin_block.py) — every per-token op between the window
    (un)partition permutations runs in one VMEM-resident kernel, removing
    the per-block HBM round trips that make the backbone memory-bound.
    """

    dim: int
    num_heads: int
    window: int = 7
    shift: int = 0
    drop_path_rate: float = 0.0
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False
    use_pallas_block: bool = False
    use_pallas_block_train: bool = False
    pallas_interpret: bool = False  # CPU parity tests of the fused block

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        deterministic: bool,
        win_shape: Optional[Tuple[int, int, int]] = None,
        win_layout: str = "aligned",
    ) -> jax.Array:
        if win_shape is not None:
            # window-major chaining (SwinTiny drives it): x is [B*nW, T, C]
            # tokens in `win_layout` ("aligned" or "shifted"); the block
            # converts with ONE rewindow pass instead of the
            # unpartition -> roll -> partition HBM round trips, and returns
            # tokens in its own layout.  Fused-kernel paths only.
            b, h, w = win_shape
            c = x.shape[-1]
        else:
            b, h, w, c = x.shape
        shortcut = x

        # canonical swin (and timm) zero the shift when the feature map is
        # no larger than the window — stage 3 at 224 input runs 7x7 with
        # window 7, where a shift would wrongly mask the single window
        shift = 0 if (h <= self.window and w <= self.window) else self.shift
        mask = (
            shifted_window_mask(h, w, self.window, shift) if shift > 0 else None
        )

        use_fused_block = (
            (self.use_pallas_block and deterministic)
            or (self.use_pallas_block_train and not deterministic)
        ) and (self.pallas_interpret or jax.default_backend() == "tpu")
        if win_shape is not None and not use_fused_block:
            raise ValueError(
                "window-major SwinBlock input requires an active fused-block "
                "path (use_pallas_block[_train] on TPU or pallas_interpret)"
            )

        norm1 = LayerNorm(dtype=self.dtype, name="norm1")
        # The fused Pallas kernels win at inference but their backward is
        # an XLA recompute from x+weights, which costs ~16 ms/step at
        # batch 64 in training (measured) — gate them to deterministic.
        # Under the fused block, attn() only runs on a dummy to material-
        # ize the param tree: keep that trace on the XLA path (the param
        # tree is identical) so no dead pallas_call relies on XLA DCE.
        attn = WindowMSA(
            dim=self.dim,
            num_heads=self.num_heads,
            window=self.window,
            dtype=self.dtype,
            use_pallas=self.use_pallas and deterministic and not use_fused_block,
            name="attn",
        )
        norm2 = LayerNorm(dtype=self.dtype, name="norm2")
        fc1 = Dense(4 * self.dim, dtype=self.dtype, name="mlp_fc1")
        fc2 = Dense(self.dim, dtype=self.dtype, name="mlp_fc2")
        if use_fused_block:
            from swinvox_tpu.ops.pallas_swin_block import (
                fused_swin_block,
                fused_swin_block_train,
            )

            # materialize the SAME param tree the XLA path creates by
            # tracing each module on a tiny dummy (dead code to XLA),
            # then run the whole block in one kernel on real data
            tokens = self.window * self.window
            dummy = jnp.zeros((1, 1, self.dim), self.dtype)
            norm1(dummy)
            attn(jnp.zeros((1, tokens, self.dim), self.dtype), None)
            norm2(dummy)
            fc1(dummy)
            fc2(jnp.zeros((1, 1, 4 * self.dim), self.dtype))
            n1 = norm1.variables["params"]["LayerNorm_0"]
            n2 = norm2.variables["params"]["LayerNorm_0"]
            av = attn.variables["params"]
            f1 = fc1.variables["params"]["Dense_0"]
            f2 = fc2.variables["params"]["Dense_0"]
            idx = relative_position_index(self.window).reshape(-1)
            rel_bias = (
                av["rel_pos_bias_table"][idx]
                .reshape(tokens, tokens, self.num_heads)
                .transpose(2, 0, 1)
            )

            if win_shape is not None:
                y = x
                want = "shifted" if shift > 0 else "aligned"
                if win_layout != want:
                    from swinvox_tpu.ops.rewindow import rewindow

                    y = rewindow(
                        y,
                        h // self.window,
                        w // self.window,
                        self.window,
                        self.window // 2,
                        -1 if want == "shifted" else 1,
                        interpret=self.pallas_interpret,
                    )
            else:
                y = x
                if shift > 0:
                    y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
                y = window_partition(y, self.window)
            if deterministic:
                y = fused_swin_block(
                    y,
                    n1["scale"], n1["bias"],
                    av["qkv_kernel"].astype(self.dtype), av["qkv_bias"],
                    av["proj_kernel"].astype(self.dtype), av["proj_bias"],
                    rel_bias,
                    None if mask is None else jnp.asarray(mask),
                    n2["scale"], n2["bias"],
                    f1["kernel"].astype(self.dtype), f1["bias"],
                    f2["kernel"].astype(self.dtype), f2["bias"],
                    num_heads=self.num_heads,
                    interpret=self.pallas_interpret,
                    logical_tokens=tokens if win_shape is not None else None,
                )
            else:
                # per-image stochastic-depth factors drawn through the
                # SAME DropPath modules/rng stream as the XLA path (the
                # factor is input-independent: DropPath(ones) = mask/keep)
                ones = jnp.ones((b, 1, 1, 1), jnp.float32)
                dp1 = DropPath(self.drop_path_rate, name="drop_path1")(
                    ones, deterministic
                ).reshape(b)
                dp2 = DropPath(self.drop_path_rate, name="drop_path2")(
                    ones, deterministic
                ).reshape(b)
                nw_per_img = (h // self.window) * (w // self.window)
                y = fused_swin_block_train(
                    y,
                    jnp.repeat(dp1, nw_per_img),
                    jnp.repeat(dp2, nw_per_img),
                    n1["scale"], n1["bias"],
                    av["qkv_kernel"].astype(self.dtype), av["qkv_bias"],
                    av["proj_kernel"].astype(self.dtype), av["proj_bias"],
                    rel_bias,
                    None if mask is None else jnp.asarray(mask),
                    n2["scale"], n2["bias"],
                    f1["kernel"].astype(self.dtype), f1["bias"],
                    f2["kernel"].astype(self.dtype), f2["bias"],
                    num_heads=self.num_heads,
                    interpret=self.pallas_interpret,
                    logical_tokens=tokens if win_shape is not None else None,
                )
            if win_shape is not None:
                return y  # window-major (padded), in this block's layout
            y = window_unpartition(y, self.window, h, w)
            if shift > 0:
                y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
            return y

        y = norm1(x)
        if shift > 0:
            y = jnp.roll(y, shift=(-shift, -shift), axis=(1, 2))
        y = window_partition(y, self.window)
        y = attn(y, mask)
        y = window_unpartition(y, self.window, h, w)
        if shift > 0:
            y = jnp.roll(y, shift=(shift, shift), axis=(1, 2))
        x = shortcut + DropPath(self.drop_path_rate, name="drop_path1")(
            y, deterministic
        )

        y = norm2(x)
        y = fc1(y)
        y = nn.gelu(y, approximate=False)
        y = fc2(y)
        return x + DropPath(self.drop_path_rate, name="drop_path2")(
            y, deterministic
        )


class PatchMerging(nn.Module):
    """Concat 2x2 neighbors -> LN(4C) -> Linear 4C -> 2C (no bias)."""

    dim: int  # input channel count C
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, h, w, c = x.shape
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # canonical swin order: (0,0), (1,0), (0,1), (1,1) along channels
        x = jnp.concatenate(
            [x[:, :, 0, :, 0], x[:, :, 1, :, 0], x[:, :, 0, :, 1], x[:, :, 1, :, 1]],
            axis=-1,
        )
        x = LayerNorm(dtype=self.dtype, name="norm")(x)
        return Dense(
            2 * self.dim, use_bias=False, dtype=self.dtype, name="reduction"
        )(x)


class SwinTiny(nn.Module):
    """Swin-Tiny feature extractor returning all four stage outputs (NHWC)."""

    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window: int = 7
    patch_size: int = 4
    drop_path_rate: float = 0.1
    in_channels: int = 3
    img_size: int = 224
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False
    use_pallas_block: bool = False
    use_pallas_block_train: bool = False
    use_rewindow_chain: bool = True
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> List[jax.Array]:
        # the backbone expects a fixed img_size (window-divisible grids);
        # bilinear-resize anything else, like the reference wrapper does
        # before timm (swin_transformer.py:74-75; torch interpolate with
        # align_corners=False == jax.image.resize half-pixel centers)
        b, h, w, c = x.shape
        if (h, w) != (self.img_size, self.img_size):
            x = jax.image.resize(
                x.astype(jnp.float32),
                (b, self.img_size, self.img_size, c),
                method="bilinear",
            ).astype(self.dtype)
        # patch embed: conv k4 s4 + LN
        x = Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            padding=0,
            dtype=self.dtype,
            name="patch_embed",
        )(x)
        x = LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        total_blocks = sum(self.depths)
        dp_rates = np.linspace(0.0, self.drop_path_rate, total_blocks)

        # Window-major stage chaining: when every block in a stage runs a
        # fused kernel, partition ONCE per stage and hand window-major
        # tokens from block to block — each layout change is one rewindow
        # pass (ops/rewindow.py) instead of the unpartition -> roll ->
        # partition HBM round trips (~27% of swin step time in the trace).
        chain = (
            self.use_rewindow_chain
            and (
                (self.use_pallas_block and not train)
                or (self.use_pallas_block_train and train)
            )
            and (self.pallas_interpret or jax.default_backend() == "tpu")
        )

        features: List[jax.Array] = []
        block_idx = 0
        dim = self.embed_dim
        for stage_idx, (depth, heads) in enumerate(
            zip(self.depths, self.num_heads)
        ):
            if stage_idx > 0:
                x = PatchMerging(dim=dim, dtype=self.dtype,
                                 name=f"merge{stage_idx}")(x)
                dim = dim * 2
            bb, hh, ww, _ = x.shape
            small = hh <= self.window and ww <= self.window
            if chain:
                # pad tokens to the kernels' sublane multiple ONCE per
                # stage; blocks and rewindow keep the padding resident
                # (pad rows stay finite and are re-zeroed by rewindow)
                tokens = self.window * self.window
                t_pad = -(-tokens // 32) * 32
                xw = window_partition(x, self.window)
                xw = jnp.pad(xw, ((0, 0), (0, t_pad - tokens), (0, 0)))
                layout = "aligned"
            for d in range(depth):
                shift = 0 if d % 2 == 0 else self.window // 2
                blk = SwinBlock(
                    dim=dim,
                    num_heads=heads,
                    window=self.window,
                    shift=shift,
                    drop_path_rate=float(dp_rates[block_idx]),
                    dtype=self.dtype,
                    use_pallas=self.use_pallas,
                    use_pallas_block=self.use_pallas_block,
                    use_pallas_block_train=self.use_pallas_block_train,
                    pallas_interpret=self.pallas_interpret,
                    name=f"stage{stage_idx}_block{d}",
                )
                if chain:
                    xw = blk(
                        xw,
                        deterministic=not train,
                        win_shape=(bb, hh, ww),
                        win_layout=layout,
                    )
                    eff_shift = 0 if small else shift
                    layout = "shifted" if eff_shift > 0 else "aligned"
                else:
                    x = blk(x, deterministic=not train)
                block_idx += 1
            if chain:
                x = window_unpartition(xw[:, :tokens], self.window, hh, ww)
                if layout == "shifted":
                    s = self.window // 2
                    x = jnp.roll(x, shift=(s, s), axis=(1, 2))
            features.append(x)
        return features
