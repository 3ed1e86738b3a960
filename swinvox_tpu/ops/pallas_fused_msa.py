"""Fully fused Swin W-MSA Pallas kernel: qkv projection + windowed
attention + output projection in ONE kernel.

Measured motivation (v5e, batch 64): with only the attention core fused,
~half the swin time is XLA-side layout work — the [nW, T, 3C] ->
[3, nW, heads, T, hd] transposes and the q/k/v/out HBM round trips.  This
kernel keeps every intermediate in VMEM:

    x[nW, T, C] --(x @ Wqkv + b)--> qkv
      --(per-head LANE SLICES; Mosaic forbids lane-splitting reshapes but
         allows slices)--> q_h, k_h, v_h
      --(QK^T * s + rel_bias + mask, softmax, @V, unrolled over heads)-->
      --(lane concat)--> ctx [T, C] --(@ Wproj + b)--> out[nW, T, C]

The projections contract over C (96..768) — proper MXU shapes — and the
weights are fetched once per grid pass (constant index maps).  Backward is
an XLA recompute (residuals: x + weights only, flash-style).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fused_kernel(
    x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, mask_ref, o_ref,
    *, num_heads: int, scale: float, masked: bool,
):
    bw, t, c = x_ref.shape
    hd = c // num_heads
    x3 = x_ref[:]

    # rank-3 x rank-2 contraction: Mosaic handles [bw, t, c] @ [c, 3c]
    # natively; flattening to [bw*t, c] would need an unsupported reshape
    # across padded sublanes.
    qkv = (
        jax.lax.dot_general(
            x3, wqkv_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bqkv_ref[:].astype(jnp.float32)
    ).astype(x3.dtype)  # [bw, t, 3c]

    bias = bias_ref[:].astype(jnp.float32)  # [heads, t, t]
    mask = mask_ref[:].astype(jnp.float32) if masked else None  # [bw, t, t]

    ctx_heads = []
    for h in range(num_heads):
        qh = qkv[:, :, h * hd : (h + 1) * hd]
        kh = qkv[:, :, c + h * hd : c + (h + 1) * hd]
        vh = qkv[:, :, 2 * c + h * hd : 2 * c + (h + 1) * hd]
        s = (
            jax.lax.dot_general(
                qh, kh,
                dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias[h][None]
        )
        if masked:
            s = s + mask
        p = jax.nn.softmax(s, axis=-1)
        ctx_heads.append(
            jax.lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            ).astype(x3.dtype)
        )
    ctx = jnp.concatenate(ctx_heads, axis=-1)  # [bw, t, c]

    out = (
        jax.lax.dot_general(
            ctx, wproj_ref[:],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + bproj_ref[:].astype(jnp.float32)
    )
    o_ref[:] = out.astype(o_ref.dtype)


def _pick_block(
    n_windows: int, nw_per_image: int, num_heads: int, t: int, c: int,
    itemsize: int,
) -> int:
    """VMEM-budgeted window block honoring Mosaic tile padding and the
    pipeline's double-buffering of blocked operands."""

    def ps(n, isz):  # sublane pad
        m = {4: 8, 2: 16, 1: 32}[isz]
        return -(-n // m) * m

    def plane(n):  # lane pad
        return -(-n // 128) * 128

    hd = c // num_heads
    budget = 9 * 1024 * 1024
    fixed = (
        c * plane(3 * c) * itemsize  # wqkv (single-buffered, constant map)
        + c * plane(c) * itemsize  # wproj
        + num_heads * ps(t, 4) * plane(t) * 4  # bias
    )
    for bw in (64, 32, 16, 8, 4, 2, 1):
        if n_windows % bw:
            continue
        if nw_per_image and nw_per_image % bw:
            continue
        xo = 2 * 2 * bw * ps(t, itemsize) * plane(c) * itemsize  # x+out dbuf
        qkv_i = bw * ps(t, itemsize) * plane(3 * c) * itemsize
        # per-head transient slices + scores/probs; head loop reuses buffers
        # but count a couple of live heads of slack
        per_head = (
            3 * bw * ps(t, itemsize) * plane(hd) * itemsize
            + 2 * bw * ps(t, 4) * plane(t) * 4
        )
        ctx = bw * ps(t, itemsize) * plane(c) * itemsize
        mask_b = 2 * bw * ps(t, 4) * plane(t) * 4 if nw_per_image else 0
        if fixed + xo + qkv_i + 2 * per_head + ctx + mask_b <= budget:
            return bw
    return 1


@functools.partial(
    jax.jit, static_argnames=("num_heads", "scale", "interpret")
)
def _fused_msa_impl(
    x, wqkv, bqkv, wproj, bproj, rel_bias, mask, num_heads, scale, interpret
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
        const((c, 3 * c)),
        const((3 * c,)),
        const((c, c)),
        const((c,)),
        const((num_heads, t, t)),
    ]
    operands = [x, wqkv, bqkv, wproj, bproj, rel_bias]
    masked = mask is not None
    if masked:
        blocks_per_image = nw_per_image // bw
        in_specs.append(
            pl.BlockSpec(
                (bw, t, t),
                lambda j: (j % blocks_per_image, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        operands.append(mask)
        kernel = functools.partial(
            _fused_kernel, num_heads=num_heads, scale=scale, masked=True
        )
    else:
        def kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref, o_ref):
            _fused_kernel(
                x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
                None, o_ref,
                num_heads=num_heads, scale=scale, masked=False,
            )

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(*operands)


def _reference_fused_msa(x, wqkv, bqkv, wproj, bproj, rel_bias, mask, num_heads, scale):
    """Plain-XLA reference for parity tests and the custom-VJP backward."""
    nw, t, c = x.shape
    hd = c // num_heads
    qkv = (
        jnp.einsum("wtc,cd->wtd", x, wqkv, preferred_element_type=jnp.float32)
        + bqkv
    ).astype(x.dtype)
    qkv = qkv.reshape(nw, t, 3, num_heads, hd).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    scores = (
        jnp.einsum("whtd,whsd->whts", q, k, preferred_element_type=jnp.float32)
        * scale
    )
    scores = scores + rel_bias[None].astype(jnp.float32)
    if mask is not None:
        nwpi = mask.shape[0]
        scores = scores.reshape(nw // nwpi, nwpi, num_heads, t, t)
        scores = scores + mask.astype(jnp.float32)[None, :, None]
        scores = scores.reshape(nw, num_heads, t, t)
    probs = jax.nn.softmax(scores, axis=-1)
    ctx = jnp.einsum(
        "whts,whsd->whtd", probs.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(nw, t, c)
    out = (
        jnp.einsum("wtc,cd->wtd", ctx, wproj, preferred_element_type=jnp.float32)
        + bproj
    )
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def _fused_msa_vjp(x, wqkv, bqkv, wproj, bproj, rel_bias, mask,
                   num_heads, scale, interpret):
    return _fused_msa_impl(
        x, wqkv, bqkv, wproj, bproj, rel_bias, mask, num_heads, scale, interpret
    )


def _fused_vjp_fwd(x, wqkv, bqkv, wproj, bproj, rel_bias, mask,
                   num_heads, scale, interpret):
    out = _fused_msa_impl(
        x, wqkv, bqkv, wproj, bproj, rel_bias, mask, num_heads, scale, interpret
    )
    return out, (x, wqkv, bqkv, wproj, bproj, rel_bias, mask)


def _fused_vjp_bwd(num_heads, scale, interpret, residuals, g):
    x, wqkv, bqkv, wproj, bproj, rel_bias, mask = residuals

    def f(x_, wqkv_, bqkv_, wproj_, bproj_, rel_bias_):
        return _reference_fused_msa(
            x_, wqkv_, bqkv_, wproj_, bproj_, rel_bias_, mask, num_heads, scale
        )

    _, vjp = jax.vjp(f, x, wqkv, bqkv, wproj, bproj, rel_bias)
    dx, dwqkv, dbqkv, dwproj, dbproj, dbias = vjp(g)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return dx, dwqkv, dbqkv, dwproj, dbproj, dbias, dmask


_fused_msa_vjp.defvjp(_fused_vjp_fwd, _fused_vjp_bwd)


def fused_window_msa(
    x: jax.Array,
    wqkv: jax.Array,
    bqkv: jax.Array,
    wproj: jax.Array,
    bproj: jax.Array,
    rel_bias: jax.Array,
    mask: Optional[jax.Array],
    num_heads: int,
    scale: Optional[float] = None,
    interpret: bool = False,
) -> jax.Array:
    """Fused W-MSA: x [nW, T, C] -> attention output [nW, T, C].

    Differentiable (custom VJP; backward recomputes in XLA from x+weights).

    The token axis is padded to a multiple of 32 (Mosaic's sublane collapse
    inside the rank-3 matmul lowering requires it for bf16); padded KEY
    columns are disabled with a -1e9 bias so the softmax ignores them, and
    padded query rows are sliced off the output.
    """
    if scale is None:
        scale = (x.shape[-1] // num_heads) ** -0.5
    nw, t, c = x.shape
    t_pad = -(-t // 32) * 32
    if t_pad != t:
        pad = t_pad - t
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        # extend the bias; -1e9 on padded key columns kills their softmax
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
    out = _fused_msa_vjp(
        x, wqkv, bqkv, wproj, bproj, rel_bias, mask,
        num_heads, float(scale), interpret,
    )
    return out[:, :t] if t_pad != t else out
