"""Fused Swin BLOCK Pallas kernel: LN1 + W-MSA + residual + LN2 + MLP +
residual in ONE kernel (the "megakernel", inference path).

Why: ablation at batch 128 puts the swin backbone at ~35 ms of the
63.6 ms model forward while its matmuls need only ~3 ms of MXU — it is
memory-bound on the per-block HBM round trips (LN outputs, attention
in/out, the 4C MLP hidden, residuals; each full-activation tensor is
~77 MB at batch 128).  Everything in a Swin block except the cyclic roll
and the window (un)partition is per-token, and those are permutations the
per-token math commutes with — so one kernel can consume the PRE-LN
window-major tokens and emit the block output in the same layout, leaving
only one permutation per block boundary outside:

  x_win --LN1--> qkv --per-head attention(+rel bias, +shift mask)--> proj
        --(+x_win)--> LN2 --> MLP fc1 -> GELU -> fc2 --(+res)--> out_win

Residual sums and LayerNorm statistics are computed in f32; matmuls run
in the compute dtype on the MXU.  DropPath is identity at inference and
the kernel is only used on deterministic passes (models/swin.py gates it
exactly like the fused W-MSA), so no VJP is defined.

Reference semantics: timm swin_tiny_patch4_window7_224 block (consumed by
the reference at models/swin_transformer.py:19-24); parity with the XLA
SwinBlock is pinned in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _erf(x: jax.Array) -> jax.Array:
    """Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7) — Mosaic has no
    erf/erfc lowering, but exp is fine."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    p = 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ln(x32: jax.Array, scale: jax.Array, bias: jax.Array, eps: float):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _swin_block_kernel(
    x_ref,
    ln1s_ref, ln1b_ref,
    wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
    mask_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, num_heads: int, scale: float, masked: bool, eps: float,
):
    bw, t, c = x_ref.shape
    hd = c // num_heads
    dtype = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)

    # ---- LN1 + fused W-MSA ---------------------------------------------
    h = _ln(
        x32, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
        eps,
    ).astype(dtype)
    qkv = (
        jax.lax.dot_general(
            h, wqkv_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(dtype)  # [bw, t, 3c]

    bias = bias_ref[:].astype(jnp.float32)  # [heads, t, t]
    mask = mask_ref[:].astype(jnp.float32) if masked else None

    ctx_heads = []
    for head in range(num_heads):
        qh = qkv[:, :, head * hd : (head + 1) * hd]
        kh = qkv[:, :, c + head * hd : c + (head + 1) * hd]
        vh = qkv[:, :, 2 * c + head * hd : 2 * c + (head + 1) * hd]
        s = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias[head][None]
        )
        if masked:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        ctx_heads.append(
            jax.lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    ctx = jnp.concatenate(ctx_heads, axis=-1)  # [bw, t, c]

    attn = (
        jax.lax.dot_general(
            ctx, wproj_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:].astype(jnp.float32)
    )  # f32

    # ---- residual + LN2 + MLP + residual --------------------------------
    x2 = x32 + attn
    h2 = _ln(
        x2, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
        eps,
    ).astype(dtype)
    m = (
        jax.lax.dot_general(
            h2, w1_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:].astype(jnp.float32)
    )
    # exact-GELU via the A&S erf polynomial (no erf/erfc Pallas lowering)
    m = (0.5 * m * (1.0 + _erf(m * 0.7071067811865476))).astype(dtype)
    m = (
        jax.lax.dot_general(
            m, w2_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:].astype(jnp.float32)
    )
    o_ref[:] = (x2 + m).astype(o_ref.dtype)


def _pick_block(
    n_windows: int, nw_per_image: int, num_heads: int, t: int, c: int,
    itemsize: int,
) -> int:
    """VMEM-budgeted window block (double-buffered x/out, const weights)."""

    def ps(n, isz):
        m = {4: 8, 2: 16, 1: 32}[isz]
        return -(-n // m) * m

    def plane(n):
        return -(-n // 128) * 128

    hd = c // num_heads
    budget = 40 * 1024 * 1024
    fixed = (
        c * plane(3 * c) * itemsize  # wqkv
        + c * plane(c) * itemsize  # wproj
        + c * plane(4 * c) * itemsize  # mlp fc1
        + 4 * c * plane(c) * itemsize  # mlp fc2
        + num_heads * ps(t, 4) * plane(t) * 4  # rel bias
    )
    for bw in (64, 32, 16, 8, 4, 2, 1):
        if n_windows % bw:
            continue
        if nw_per_image and (
            nw_per_image % bw if bw <= nw_per_image else bw % nw_per_image
        ):
            continue
        xo = 2 * 2 * bw * ps(t, itemsize) * plane(c) * itemsize  # x+out dbuf
        x32 = 2 * bw * ps(t, 4) * plane(c) * 4  # x32 + x2 residuals (f32)
        qkv_i = bw * ps(t, itemsize) * plane(3 * c) * itemsize
        per_head = (
            3 * bw * ps(t, itemsize) * plane(hd) * itemsize
            + 2 * bw * ps(t, 4) * plane(t) * 4
        )
        ctx = bw * ps(t, itemsize) * plane(c) * itemsize
        mlp_h = bw * ps(t, 4) * plane(4 * c) * 4  # f32 fc1 out
        mask_b = 2 * bw * ps(t, 4) * plane(t) * 4 if nw_per_image else 0
        if (
            fixed + xo + x32 + qkv_i + 2 * per_head + ctx + mlp_h + mask_b
            <= budget
        ):
            return bw
    return 1


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "eps", "interpret")
)
def _swin_block_impl(
    x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, rel_bias, mask,
    ln2s, ln2b, w1, b1, w2, b2, num_heads, scale, eps, interpret,
):
    nw, t, c = x.shape
    nw_per_image = 0 if mask is None else mask.shape[0]
    bw = _pick_block(nw, nw_per_image, num_heads, t, c, x.dtype.itemsize)
    grid = (nw // bw,)

    x_spec = pl.BlockSpec((bw, t, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    in_specs = [
        x_spec,
        const((c,)), const((c,)),
        const((c, 3 * c)), const((3 * c,)),
        const((c, c)), const((c,)),
        const((num_heads, t, t)),
    ]
    operands = [x, ln1s, ln1b, wqkv, bqkv, wproj, bproj, rel_bias]
    masked = mask is not None
    if masked:
        if bw <= nw_per_image:
            blocks_per_image = nw_per_image // bw
            in_specs.append(
                pl.BlockSpec(
                    (bw, t, t),
                    lambda j: (j % blocks_per_image, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            )
            operands.append(mask)
        else:
            # block spans whole images: pre-tile the per-image mask so it
            # is constant across the grid (see _pick_block's bw rule)
            in_specs.append(const((bw, t, t)))
            operands.append(jnp.tile(mask, (bw // nw_per_image, 1, 1)))
        kernel = functools.partial(
            _swin_block_kernel,
            num_heads=num_heads, scale=scale, masked=True, eps=eps,
        )
    else:
        def kernel(x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                   bproj_ref, bias_ref, ln2s_ref, ln2b_ref, w1_ref, b1_ref,
                   w2_ref, b2_ref, o_ref):
            _swin_block_kernel(
                x_ref, ln1s_ref, ln1b_ref, wqkv_ref, bqkv_ref, wproj_ref,
                bproj_ref, bias_ref, None, ln2s_ref, ln2b_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                num_heads=num_heads, scale=scale, masked=False, eps=eps,
            )

    in_specs += [
        const((c,)), const((c,)),
        const((c, 4 * c)), const((4 * c,)),
        const((4 * c, c)), const((c,)),
    ]
    operands += [ln2s, ln2b, w1, b1, w2, b2]

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)


def fused_swin_block(
    x: jax.Array,
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array,
    wproj: jax.Array, bproj: jax.Array,
    rel_bias: jax.Array,
    mask: Optional[jax.Array],
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    logical_tokens: Optional[int] = None,
) -> jax.Array:
    """Whole Swin block on window-major tokens: x [nW, T, C] -> [nW, T, C].

    The token axis is padded to a multiple of 32 (Mosaic sublane collapse
    in the rank-3 matmuls); padded KEY columns get a -1e9 bias so softmax
    ignores them, padded query rows are sliced off.  With
    ``logical_tokens`` the caller hands tokens ALREADY padded (the
    window-major stage chain keeps the padding resident across blocks to
    skip the per-block pad/slice HBM passes) and gets the padded output
    back — pad rows stay finite (LN of whatever rewindow zeroed there)
    and the next rewindow re-zeroes them.  Inference only — use under
    `deterministic` (DropPath = identity); no VJP.
    """
    if scale is None:
        scale = (x.shape[-1] // num_heads) ** -0.5
    nw, t_in, c = x.shape
    t = logical_tokens if logical_tokens is not None else t_in
    t_pad = -(-t // 32) * 32
    prepadded = t_in != t
    if prepadded:
        assert t_in == t_pad, (t_in, t_pad)
    if t_pad != t:
        pad = t_pad - t
        if not prepadded:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        rel_bias = jnp.pad(
            rel_bias.astype(jnp.float32),
            ((0, 0), (0, pad), (0, pad)),
            constant_values=0.0,
        )
        rel_bias = rel_bias.at[:, :, t:].set(-1e9)
        if mask is not None:
            mask = jnp.pad(
                mask.astype(jnp.float32), ((0, 0), (0, pad), (0, pad))
            )
    out = _swin_block_impl(
        x, ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj, rel_bias, mask,
        ln2_scale, ln2_bias, w1, b1, w2, b2,
        num_heads, float(scale), float(eps), interpret,
    )
    return out[:, :t] if (t_pad != t and not prepadded) else out


# ======================================================================
# Training path: forward with stochastic-depth factors + a full backward
# kernel (flash-style: residuals are just x + weights; every forward
# intermediate is recomputed in VMEM during the backward pass, and the
# weight gradients accumulate in VMEM across the sequential TPU grid).
#
# Motivation (v5e trace, batch 64 training step): the XLA swin backbone
# costs 86.6 ms of the 180.8 ms step (fwd 34.6 + bwd 52.0) while its
# matmul FLOPs need ~3 ms of MXU — it is memory-bound on per-block HBM
# round trips, double in the backward where every intermediate is both
# re-read and produced.  This pass reads x + dout and writes dx + weight
# grads: three activation passes total.
# ======================================================================


def _gelu_exact(m: jax.Array) -> jax.Array:
    return 0.5 * m * (1.0 + _erf(m * 0.7071067811865476))


def _dgelu_exact(m: jax.Array) -> jax.Array:
    # d/dm [m * Phi(m)] = Phi(m) + m * phi(m)
    phi = 0.3989422804014327 * jnp.exp(-0.5 * m * m)
    cdf = 0.5 * (1.0 + _erf(m * 0.7071067811865476))
    return cdf + m * phi


def _gelu_and_dgelu(m: jax.Array):
    """Fused exact GELU + its derivative: erf(m/sqrt2) and phi(m) share
    exp(-m^2/2) and the A&S polynomial, so computing them together costs
    ~23 VPU ops/element instead of ~30 for the separate calls — the MLP
    4C-wide f32 elementwise is the train kernel's largest VPU cost
    (PERFORMANCE.md round-3 ablations)."""
    a1, a2, a3, a4, a5 = (
        0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429
    )
    pco = 0.3275911
    z = m * 0.7071067811865476
    az = jnp.abs(z)
    t = 1.0 / (1.0 + pco * az)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    e = jnp.exp(-az * az)          # = exp(-m^2 / 2)
    erf = jnp.sign(z) * (1.0 - poly * e)
    cdf = 0.5 * (1.0 + erf)
    return m * cdf, cdf + m * (0.3989422804014327 * e)


def _ln_fwd_stats(x32, scale, bias, eps):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    xhat = (x32 - mu) * inv
    return xhat * scale + bias, xhat, inv


def _ln_bwd(dh, xhat, inv, scale):
    """Returns (dx, dscale_contrib [c], dbias_contrib [c])."""
    dscale = jnp.sum(dh * xhat, axis=(0, 1))
    dbias = jnp.sum(dh, axis=(0, 1))
    dxhat = dh * scale
    m1 = jnp.mean(dxhat, axis=-1, keepdims=True)
    m2 = jnp.mean(dxhat * xhat, axis=-1, keepdims=True)
    return inv * (dxhat - m1 - xhat * m2), dscale, dbias


def _swin_block_train_fwd_kernel(
    x_ref, dp1_ref, dp2_ref,
    ln1s_ref, ln1b_ref,
    wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, num_heads: int, scale: float, eps: float,
):
    """Inference kernel + per-window stochastic-depth factors dp1/dp2.

    Mask is ALWAYS materialized here (zeros for W-MSA blocks): training
    pays a negligible [bw, t, t] add for much simpler plumbing.
    """
    bw, t, c = x_ref.shape
    hd = c // num_heads
    dtype = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)

    h, _, _ = _ln_fwd_stats(
        x32, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
        eps,
    )
    h = h.astype(dtype)
    qkv = (
        jax.lax.dot_general(
            h, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(dtype)

    bias = bias_ref[:].astype(jnp.float32)
    mask = mask_ref[:].astype(jnp.float32)

    ctx_heads = []
    for head in range(num_heads):
        qh = qkv[:, :, head * hd : (head + 1) * hd]
        kh = qkv[:, :, c + head * hd : c + (head + 1) * hd]
        vh = qkv[:, :, 2 * c + head * hd : 2 * c + (head + 1) * hd]
        s = (
            jax.lax.dot_general(
                qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias[head][None]
            + mask
        )
        p = jax.nn.softmax(s, axis=-1)
        ctx_heads.append(
            jax.lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    ctx = jnp.concatenate(ctx_heads, axis=-1)

    attn = (
        jax.lax.dot_general(
            ctx, wproj_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:].astype(jnp.float32)
    )

    x2 = x32 + dp1_ref[:].astype(jnp.float32) * attn
    h2, _, _ = _ln_fwd_stats(
        x2, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
        eps,
    )
    h2 = h2.astype(dtype)
    m = (
        jax.lax.dot_general(
            h2, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:].astype(jnp.float32)
    )
    g = _gelu_exact(m).astype(dtype)
    m2 = (
        jax.lax.dot_general(
            g, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:].astype(jnp.float32)
    )
    o_ref[:] = (x2 + dp2_ref[:].astype(jnp.float32) * m2).astype(o_ref.dtype)



def _wgrad(a, b):
    """Contract [bw, t, K] x [bw, t, N] over (bw, t) -> [K, N] f32.

    Mosaic's matmul wants a single contracting dim, so collapse the
    window/token dims first (t is tiling-aligned, so the reshape is a
    no-op relayout).
    """
    bw, t, ka = a.shape
    kb = b.shape[-1]
    return jax.lax.dot_general(
        a.reshape(bw * t, ka), b.reshape(bw * t, kb),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _swin_block_train_bwd_kernel(
    # inputs
    x_ref, dout_ref, dp1_ref, dp2_ref,
    ln1s_ref, ln1b_ref,
    wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    # outputs
    dx_ref, dln1s_ref, dln1b_ref,
    dwqkv_ref, dbqkv_ref, dwproj_ref, dbproj_ref, dbias_ref,
    dln2s_ref, dln2b_ref,
    dw1_ref, db1_ref, dw2_ref, db2_ref,
    *, num_heads: int, scale: float, eps: float,
):
    """Recompute-forward + full backward for one window block.

    Weight/bias/rel-bias gradients ACCUMULATE across the (sequential) TPU
    grid: their output blocks map every grid step to the same location,
    so Mosaic keeps them VMEM-resident until the last step writes back.
    """
    bw, t, c = x_ref.shape
    hd = c // num_heads
    dtype = x_ref.dtype
    first = pl.program_id(0) == 0

    x32 = x_ref[:].astype(jnp.float32)
    dout = dout_ref[:].astype(jnp.float32)
    dp1 = dp1_ref[:].astype(jnp.float32)
    dp2 = dp2_ref[:].astype(jnp.float32)
    ln1s = ln1s_ref[:].astype(jnp.float32)
    ln2s = ln2s_ref[:].astype(jnp.float32)

    # ---------------- recompute forward ---------------------------------
    h32, xhat1, inv1 = _ln_fwd_stats(
        x32, ln1s, ln1b_ref[:].astype(jnp.float32), eps
    )
    h = h32.astype(dtype)
    qkv = (
        jax.lax.dot_general(
            h, wqkv_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(dtype)

    bias = bias_ref[:].astype(jnp.float32)
    mask = mask_ref[:].astype(jnp.float32)

    p_heads = []
    ctx_heads = []
    for head in range(num_heads):
        qh = qkv[:, :, head * hd : (head + 1) * hd]
        kh = qkv[:, :, c + head * hd : c + (head + 1) * hd]
        vh = qkv[:, :, 2 * c + head * hd : 2 * c + (head + 1) * hd]
        s = (
            jax.lax.dot_general(
                qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias[head][None]
            + mask
        )
        p = jax.nn.softmax(s, axis=-1)
        p_heads.append(p)
        ctx_heads.append(
            jax.lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    ctx = jnp.concatenate(ctx_heads, axis=-1)

    attn = (
        jax.lax.dot_general(
            ctx, wproj_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:].astype(jnp.float32)
    )
    x2 = x32 + dp1 * attn
    h232, xhat2, inv2 = _ln_fwd_stats(
        x2, ln2s, ln2b_ref[:].astype(jnp.float32), eps
    )
    h2 = h232.astype(dtype)
    m = (
        jax.lax.dot_general(
            h2, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:].astype(jnp.float32)
    )
    g32, dgelu32 = _gelu_and_dgelu(m)
    g = g32.astype(dtype)

    # ---------------- backward -------------------------------------------
    def accum(ref, val):
        @pl.when(first)
        def _init():
            ref[...] = val.astype(ref.dtype)

        @pl.when(jnp.logical_not(first))
        def _add():
            ref[...] = (ref[...].astype(jnp.float32) + val).astype(ref.dtype)

    # mlp tail
    dmlp_f = dout * dp2
    dmlp = dmlp_f.astype(dtype)  # [bw, t, c]
    accum(dw2_ref, _wgrad(g, dmlp))
    accum(db2_ref, jnp.sum(dmlp_f, axis=(0, 1)))
    dg = jax.lax.dot_general(
        dmlp, w2_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dm1_f = dg * dgelu32
    dm1 = dm1_f.astype(dtype)
    accum(dw1_ref, _wgrad(h2, dm1))
    accum(db1_ref, jnp.sum(dm1_f, axis=(0, 1)))
    dh2 = jax.lax.dot_general(
        dm1, w1_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx2_ln, dln2s_c, dln2b_c = _ln_bwd(dh2, xhat2, inv2, ln2s)
    accum(dln2s_ref, dln2s_c)
    accum(dln2b_ref, dln2b_c)
    dx2 = dout + dx2_ln

    # attention tail
    dattn = (dx2 * dp1).astype(dtype)
    accum(dwproj_ref, _wgrad(ctx, dattn))
    accum(dbproj_ref, jnp.sum(dx2 * dp1, axis=(0, 1)))
    dctx = jax.lax.dot_general(
        dattn, wproj_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(dtype)

    dq_heads, dk_heads, dv_heads, dbias_heads = [], [], [], []
    for head in range(num_heads):
        qh = qkv[:, :, head * hd : (head + 1) * hd]
        kh = qkv[:, :, c + head * hd : c + (head + 1) * hd]
        vh = qkv[:, :, 2 * c + head * hd : 2 * c + (head + 1) * hd]
        p = p_heads[head]
        dctx_h = dctx[:, :, head * hd : (head + 1) * hd]
        # dp_ = dctx_h @ vh^T  [bw, t, t]
        dp_ = jax.lax.dot_general(
            dctx_h, vh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        dv_heads.append(
            jax.lax.dot_general(
                p.astype(dtype), dctx_h,
                dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
        ds = p * (dp_ - jnp.sum(dp_ * p, axis=-1, keepdims=True))
        dbias_heads.append(jnp.sum(ds, axis=0))
        ds_l = (ds * scale).astype(dtype)
        dq_heads.append(
            jax.lax.dot_general(
                ds_l, kh, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
        dk_heads.append(
            jax.lax.dot_general(
                ds_l, qh, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
        )
    accum(dbias_ref, jnp.stack(dbias_heads))
    dqkv = jnp.concatenate(dq_heads + dk_heads + dv_heads, axis=-1)

    accum(dwqkv_ref, _wgrad(h, dqkv))
    accum(dbqkv_ref, jnp.sum(dqkv.astype(jnp.float32), axis=(0, 1)))
    dh1 = jax.lax.dot_general(
        dqkv, wqkv_ref[:], dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dx_ln, dln1s_c, dln1b_c = _ln_bwd(dh1, xhat1, inv1, ln1s)
    accum(dln1s_ref, dln1s_c)
    accum(dln1b_ref, dln1b_c)
    dx_ref[:] = (dx2 + dx_ln).astype(dx_ref.dtype)


def _pick_block_train(
    n_windows: int, nw_per_image: int, num_heads: int, t: int, c: int,
    itemsize: int, backward: bool,
) -> int:
    """VMEM-budgeted window block for the training kernels."""

    def ps(n, isz):
        m = {4: 8, 2: 16, 1: 32}[isz]
        return -(-n // m) * m

    def plane(n):
        return -(-n // 128) * 128

    budget = 96 * 1024 * 1024
    # weights (bf16) + (backward) their f32 gradient accumulators
    w_words = (
        c * plane(3 * c) + c * plane(c) + c * plane(4 * c) + 4 * c * plane(c)
    )
    fixed = w_words * itemsize + num_heads * ps(t, 4) * plane(t) * 4
    if backward:
        fixed += w_words * 4 + num_heads * ps(t, 4) * plane(t) * 4
    for bw in (64, 32, 16, 8, 4, 2, 1):
        if n_windows % bw:
            continue
        # the mask repeats with period nw_per_image: blocks either divide
        # an image's windows (modulo index map) or span whole images
        # (pre-tiled constant mask) — bw and nw_per_image must nest
        if nw_per_image and (
            nw_per_image % bw if bw <= nw_per_image else bw % nw_per_image
        ):
            continue
        io = (3 if backward else 2) * 2 * bw * ps(t, itemsize) * plane(c) * itemsize
        x32 = 2 * bw * ps(t, 4) * plane(c) * 4
        # qkv (+ the dq/dk/dv head lists and their concat in backward)
        qkv_b = (3 if backward else 1) * bw * ps(t, itemsize) * plane(3 * c) * itemsize
        # per-head scores/probs; backward stashes p for every head
        ph = (num_heads + 2 if backward else 2) * bw * ps(t, 4) * plane(t) * 4
        mlp_h = (3 if backward else 1) * bw * ps(t, 4) * plane(4 * c) * 4
        mask_b = 2 * bw * ps(t, 4) * plane(t) * 4
        total = fixed + io + x32 + qkv_b + ph + mlp_h + mask_b
        if total <= budget:
            return bw
    return 1


@functools.lru_cache(maxsize=None)
def _make_train_fn(num_heads, scale, eps, masked, interpret):
    """custom_vjp'd fused swin block for one static configuration.

    Operand order (all arrays): x [nW,T,C], dp1 [nW,1,1], dp2 [nW,1,1],
    ln1s, ln1b, wqkv, bqkv, wproj, bproj, rel_bias [H,T,T] (f32,
    pre-padded with -1e9 key columns when T is padded), mask [nWpi,T,T]
    (zeros when not masked), ln2s, ln2b, w1, b1, w2, b2.
    """

    def _call(kernel, x, operands, n_outs_extra=None):
        nw, t, c = x.shape
        n_lead = len(operands) - 16  # 1 fwd (x), 2 bwd (x, dout)
        nw_per_image = operands[n_lead + 2 + 7].shape[0] if masked else 0
        bw = _pick_block_train(
            nw, nw_per_image, num_heads, t, c, x.dtype.itemsize,
            backward=n_outs_extra is not None,
        )
        grid = (nw // bw,)
        x_spec = pl.BlockSpec(
            (bw, t, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        )
        dp_spec = pl.BlockSpec(
            (bw, 1, 1), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        )

        def const(shape):
            return pl.BlockSpec(
                shape, lambda j, _s=shape: tuple(0 for _ in _s),
                memory_space=pltpu.VMEM,
            )

        mask_idx = n_lead + 2 + 7
        if masked:
            if bw <= nw_per_image:
                bpi = nw_per_image // bw
                mask_spec = pl.BlockSpec(
                    (bw, t, t),
                    lambda j: (j % bpi, 0, 0),
                    memory_space=pltpu.VMEM,
                )
            else:
                # block spans whole images: rows repeat the per-image
                # mask with period nw_per_image, so a pre-tiled [bw,t,t]
                # mask is CONSTANT across the grid (lifts the bw cap the
                # modulo indexing imposed on small-nW stages)
                operands = list(operands)
                operands[mask_idx] = jnp.tile(
                    operands[mask_idx], (bw // nw_per_image, 1, 1)
                )
                mask_spec = const((bw, t, t))
        else:
            mask_spec = const((1, t, t))

        # operands: x [, dout], dp1, dp2, then the 14-element trailing
        # block: ln1s, ln1b, wqkv, bqkv, wproj, bproj, rel_bias, mask,
        # ln2s, ln2b, w1, b1, w2, b2 (mask is trailing index 7)
        in_specs = [x_spec] * n_lead + [dp_spec, dp_spec]
        shapes = [op.shape for op in operands[n_lead + 2 :]]
        for i, shp in enumerate(shapes):
            if i == 7:
                in_specs.append(mask_spec)
            else:
                in_specs.append(const(shp))

        if n_outs_extra is None:
            out_specs = x_spec
            out_shape = jax.ShapeDtypeStruct(x.shape, x.dtype)
        else:
            wg_specs = [const(s.shape) for s in n_outs_extra]
            out_specs = [x_spec] + wg_specs
            out_shape = [jax.ShapeDtypeStruct(x.shape, x.dtype)] + list(
                n_outs_extra
            )
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=128 * 1024 * 1024
            ),
            interpret=interpret,
        )(*operands)

    kern_fwd = functools.partial(
        _swin_block_train_fwd_kernel,
        num_heads=num_heads, scale=scale, eps=eps,
    )
    kern_bwd = functools.partial(
        _swin_block_train_bwd_kernel,
        num_heads=num_heads, scale=scale, eps=eps,
    )

    @jax.custom_vjp
    def run(*operands):
        return _call(kern_fwd, operands[0], list(operands))

    def run_fwd(*operands):
        return _call(kern_fwd, operands[0], list(operands)), operands

    def run_bwd(res, dout):
        (x, dp1, dp2, ln1s, ln1b, wqkv, bqkv, wproj, bproj, rel_bias,
         mask, ln2s, ln2b, w1, b1, w2, b2) = res
        t = x.shape[1]
        f32 = jnp.float32
        wg_shapes = [
            jax.ShapeDtypeStruct(ln1s.shape, f32),
            jax.ShapeDtypeStruct(ln1b.shape, f32),
            jax.ShapeDtypeStruct(wqkv.shape, f32),
            jax.ShapeDtypeStruct(bqkv.shape, f32),
            jax.ShapeDtypeStruct(wproj.shape, f32),
            jax.ShapeDtypeStruct(bproj.shape, f32),
            jax.ShapeDtypeStruct(rel_bias.shape, f32),
            jax.ShapeDtypeStruct(ln2s.shape, f32),
            jax.ShapeDtypeStruct(ln2b.shape, f32),
            jax.ShapeDtypeStruct(w1.shape, f32),
            jax.ShapeDtypeStruct(b1.shape, f32),
            jax.ShapeDtypeStruct(w2.shape, f32),
            jax.ShapeDtypeStruct(b2.shape, f32),
        ]
        operands = [x, dout.astype(x.dtype), dp1, dp2, ln1s, ln1b, wqkv,
                    bqkv, wproj, bproj, rel_bias, mask, ln2s, ln2b, w1,
                    b1, w2, b2]
        outs = _call(kern_bwd, x, operands, n_outs_extra=wg_shapes)
        (dx, dln1s, dln1b, dwqkv, dbqkv, dwproj, dbproj, dbias,
         dln2s, dln2b, dw1, db1, dw2, db2) = outs
        zeros = jnp.zeros_like
        return (
            dx,
            zeros(dp1), zeros(dp2),
            dln1s.astype(ln1s.dtype), dln1b.astype(ln1b.dtype),
            dwqkv.astype(wqkv.dtype), dbqkv.astype(bqkv.dtype),
            dwproj.astype(wproj.dtype), dbproj.astype(bproj.dtype),
            dbias.astype(rel_bias.dtype),
            zeros(mask),
            dln2s.astype(ln2s.dtype), dln2b.astype(ln2b.dtype),
            dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
        )

    run.defvjp(run_fwd, run_bwd)
    return run


def fused_swin_block_train(
    x: jax.Array,
    dp1: jax.Array,  # [nW] stochastic-depth factors (1/keep or 0)
    dp2: jax.Array,
    ln1_scale: jax.Array, ln1_bias: jax.Array,
    wqkv: jax.Array, bqkv: jax.Array,
    wproj: jax.Array, bproj: jax.Array,
    rel_bias: jax.Array,
    mask: Optional[jax.Array],
    ln2_scale: jax.Array, ln2_bias: jax.Array,
    w1: jax.Array, b1: jax.Array,
    w2: jax.Array, b2: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
    eps: float = 1e-5,
    interpret: bool = False,
    logical_tokens: Optional[int] = None,
) -> jax.Array:
    """Differentiable fused Swin block on window-major tokens.

    Same contract as fused_swin_block (incl. pre-padded ``logical_tokens``
    I/O for the stage chain) plus per-window stochastic-depth factors;
    gradients flow to x and every parameter via the in-kernel backward
    (flash-style recompute, residuals = inputs only).  Pre-padded mode is
    gradient-exact: pad query rows receive zero cotangent from the next
    rewindow/slice, so they contribute nothing to any weight gradient.
    """
    if scale is None:
        scale = (x.shape[-1] // num_heads) ** -0.5
    nw, t_in, c = x.shape
    t = logical_tokens if logical_tokens is not None else t_in
    t_pad = -(-t // 32) * 32
    prepadded = t_in != t
    if prepadded:
        assert t_in == t_pad, (t_in, t_pad)
    masked = mask is not None
    rel_bias = rel_bias.astype(jnp.float32)
    if t_pad != t:
        pad = t_pad - t
        if not prepadded:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        rel_bias = jnp.pad(rel_bias, ((0, 0), (0, pad), (0, pad)))
        rel_bias = rel_bias.at[:, :, t:].add(-1e9)
        if masked:
            mask = jnp.pad(
                mask.astype(jnp.float32), ((0, 0), (0, pad), (0, pad))
            )
    if not masked:
        mask = jnp.zeros((1, t_pad, t_pad), jnp.float32)
    fn = _make_train_fn(
        num_heads, float(scale), float(eps), masked, interpret
    )
    out = fn(
        x, dp1.reshape(-1, 1, 1).astype(jnp.float32),
        dp2.reshape(-1, 1, 1).astype(jnp.float32),
        ln1_scale, ln1_bias, wqkv, bqkv, wproj, bproj, rel_bias,
        mask.astype(jnp.float32), ln2_scale, ln2_bias, w1, b1, w2, b2,
    )
    return out[:, :t] if (t_pad != t and not prepadded) else out
