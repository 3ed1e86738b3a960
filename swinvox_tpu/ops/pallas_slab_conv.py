"""Differentiable slab band-conv: the merger's Conv3d as MXU matmuls.

The merger's 9-channel NDHWC Conv3d stack costs ~35 ms of a 148 ms
batch-64 train step in XLA (convs at 35-70 GB/s effective: 9 lanes padded
to 128, ~14x memory inflation — PERFORMANCE.md).  This op re-expresses
ONE Conv3d on a "slab" layout that keeps lanes dense and turns the whole
conv into a few big matmuls per volume:

  * rows   = the (d, h) grid with a one-cell halo: r = (d+1)*34 + (h+1),
    1156 rows, padded with margins so every tap row-shift stays in
    bounds: [V, 1240, LANES];
  * lanes  = (w, c) with a one-slot w-halo: lane = (w+1)*ci + c
    (34*ci lanes, padded to a 128 multiple).  The kernel's dw taps fold
    into a banded (w_in*ci -> w_out*co) matrix (exactly the
    ops/band2d_merger.py trick) — but here the band matmuls run in
    Pallas with everything VMEM-resident, so the ~5x band-zero FLOP
    inflation rides the idle MXU instead of inflating HBM traffic (the
    XLA variant of this trade measurably LOST: 555 -> 534 img/s);
  * the 9 (dd, dh) taps are static row-shifted slices of the slab; the
    per-tap band matmuls accumulate in f32 VMEM scratch.

Packing/unpacking ([V, D, H, W, C] <-> slab) is pure pad+reshape in XLA
(no transposes), fused into the neighboring elementwise ops.  Bias,
train-mode BatchNorm, LeakyReLU and the view softmax stay in XLA, so the
module keeps flax Norm semantics and the canonical parameter tree.

Backward is exact and in-kernel (custom_vjp):
  * dx reuses the FORWARD kernel with the adjoint band weights (taps
    flipped, ci/co swapped) on the lane-rehalo'd cotangent;
  * dW contracts tap slices of x against dz blocks over the row axis,
    accumulated across the volume grid in VMEM (constant-index output);
    the adjoint from band matrices back to the canonical [3,3,3,ci,co]
    kernel falls out of XLA autodiff because the band build is an XLA
    einsum inside the differentiable wrapper.

Reference semantics: each layer of models/merger.py:70-93.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = H = W = 32
G = 34          # (d, h) and w pitch including the one-cell halo
R = G * G       # 1156 data rows per volume
Q0 = 40         # top row margin (>= max tap shift 35, 8-aligned)
RB = 1240       # Q0 + R + bottom margin (covers +35 shift reads)
RPAD = 1160     # 8-aligned row extent processed per tap read
# (dd, dh) tap row shifts; tap index t = dd*3 + dh
TAP_SHIFTS = tuple(
    (dd - 1) * G + (dh - 1) for dd in range(3) for dh in range(3)
)


def _lanes_pad(n: int) -> int:
    return -(-n // 128) * 128


def _sub_pad(n: int) -> int:
    """Per-tap K extents pad to 8 sublanes (Mosaic ref-slice rule)."""
    return -(-n // 8) * 8


def blocks_for(co: int) -> Tuple[Tuple[int, int], ...]:
    """Output w-blocks (w0, wb): 14+14+4 for co=9 (126->128 lanes),
    one 32-block for co=1."""
    return ((0, 14), (14, 14), (28, 4)) if co >= 2 else ((0, 32),)


# ---------------------------------------------------------------- pack
def pack_slab(x: jax.Array) -> jax.Array:
    """[V, D, H, W, C] -> [V, RB, lanes_pad(34*C)] (pads + reshapes only)."""
    v, d, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    x = x.reshape(v, (d + 2) * (h + 2), (w + 2) * c)
    lanes = _lanes_pad((w + 2) * c)
    return jnp.pad(
        x,
        ((0, 0), (Q0, RB - Q0 - R), (0, lanes - (w + 2) * c)),
    )


def unpack_slab(z: jax.Array, co: int) -> jax.Array:
    """[V, RB, lanes] -> [V, D, H, W, co] (slices + reshapes only).

    z's lanes are (w, co) WITHOUT halo (the conv only emits interior w);
    halo (d, h) rows carry garbage and are sliced off here."""
    v = z.shape[0]
    z = z[:, Q0 : Q0 + R, : W * co].reshape(v, G, G, W, co)
    return z[:, 1 : D + 1, 1 : H + 1]


def rehalo_lanes(dz: jax.Array, co: int) -> jax.Array:
    """Shift (w, co) lanes to (w+halo, co): the cotangent of z becomes a
    valid INPUT slab for the adjoint conv (pad + reshape only)."""
    v = dz.shape[0]
    body = dz[:, :, : W * co].reshape(v, RB, W, co)
    body = jnp.pad(body, ((0, 0), (0, 0), (1, 1), (0, 0)))
    body = body.reshape(v, RB, (W + 2) * co)
    lanes = _lanes_pad((W + 2) * co)
    return jnp.pad(body, ((0, 0), (0, 0), (0, lanes - (W + 2) * co)))


# ------------------------------------------------------------- weights
def _shift_tensor(wb: int) -> np.ndarray:
    s = np.zeros((3, wb + 2, wb), np.float32)
    for dw in range(3):
        for o in range(wb):
            s[dw, o + dw, o] = 1.0
    return s


def build_band_weights(kernel: jax.Array):
    """Canonical kernel [3, 3, 3, ci, co] -> per-block tap-concatenated
    band matrices [9 * sub_pad((wb+2)*ci), 128-padded wb*co], in XLA
    (differentiable — its autodiff is the dW un-banding adjoint).  Each
    tap's K segment is zero-padded to 8 sublanes so in-kernel per-tap
    slices stay Mosaic-legal.  Stays in the kernel's dtype (keep f32 for
    the dW adjoint; cast the returned blocks for the MXU)."""
    ci, co = kernel.shape[3], kernel.shape[4]
    out = []
    for w0, wb in blocks_for(co):
        kt = (wb + 2) * ci
        s = jnp.asarray(_shift_tensor(wb), kernel.dtype)
        # taps (dd, dh) stay explicit; dw folds into the band
        band = jnp.einsum("wio,dhwce->dhicoe", s, kernel)
        band = band.reshape(9, kt, wb * co)
        band = jnp.pad(
            band,
            ((0, 0), (0, _sub_pad(kt) - kt),
             (0, _lanes_pad(wb * co) - wb * co)),
        )
        out.append(band.reshape(9 * _sub_pad(kt), -1))
    return tuple(out)


def adjoint_kernel(kernel: jax.Array) -> jax.Array:
    """[3,3,3,ci,co] -> the transposed-conv kernel [3,3,3,co,ci]
    (spatial flip + ci/co swap)."""
    return jnp.transpose(kernel[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


# -------------------------------------------------------------- kernels
def _fwd_kernel(x_ref, *args, ci: int, co: int, n_blocks: int):
    """One banded conv per volume, all matmuls VMEM-resident.

    Mosaic legality notes (each measured to fail otherwise):
      * the 9 tap reads are sublane-misaligned ref slices — legal, each
        costs one implicit relayout copy;
      * those misaligned VALUES cannot be lane-concatenated or padded
        ("result/input offset mismatch on non-concat dimension"), so
        each tap gets its own dot and the f32 accumulation is a value
        add chain — no concat, no pad, no scratch;
      * per-tap K slices take sub_pad(kt) lanes straight from the slab
        (always in bounds: the slab's 128-lane padding covers the
        overhang) — the weight rows beyond kt are structural zeros, so
        the extra neighbor lanes contribute nothing.
    """
    w_refs = args[:n_blocks]
    o_ref = args[n_blocks]
    dtype = x_ref.dtype
    cblocks = blocks_for(co)

    taps = [x_ref[0, pl.ds(Q0 + s, RPAD), :] for s in TAP_SHIFTS]
    parts = []
    for b, (w0, wb) in enumerate(cblocks):
        kt = (wb + 2) * ci
        ktp = _sub_pad(kt)
        acc = None
        for t in range(9):
            d = jax.lax.dot_general(
                taps[t][:, w0 * ci : w0 * ci + ktp],
                w_refs[b][pl.ds(t * ktp, ktp), :].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
        parts.append(acc[:, : wb * co])
    y = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    lanes = o_ref.shape[-1]
    if y.shape[1] < lanes:
        y = jnp.pad(y, ((0, 0), (0, lanes - y.shape[1])))
    o_ref[0, 0:Q0, :] = jnp.zeros((Q0, lanes), o_ref.dtype)
    o_ref[0, pl.ds(Q0, RPAD), :] = y.astype(o_ref.dtype)
    o_ref[0, pl.ds(Q0 + RPAD, RB - Q0 - RPAD), :] = jnp.zeros(
        (RB - Q0 - RPAD, lanes), o_ref.dtype
    )


def _wgrad_kernel(x_ref, dz_ref, *out_refs, ci: int, co: int):
    """dW band accumulation across the volume grid.

    out_refs[b]: [9*sub_pad((wb+2)*ci), 128-padded] f32, constant-index
    (VMEM-resident) — the same shape build_band_weights emits, so the
    band-adjoint vjp consumes it directly; dz lanes are the REHALO'D
    cotangent (w offset by one group of co)."""
    first = pl.program_id(0) == 0
    cblocks = blocks_for(co)
    taps = [x_ref[0, pl.ds(Q0 + s, RPAD), :] for s in TAP_SHIFTS]
    dz = dz_ref[0, pl.ds(Q0, RPAD), :]
    for b, (w0, wb) in enumerate(cblocks):
        kt = (wb + 2) * ci
        ktp = _sub_pad(kt)
        # dz block lanes in rehalo'd coords: (w0+1)*co .. (w0+1+wb)*co
        dzb = dz[:, (w0 + 1) * co : (w0 + 1 + wb) * co]
        n = out_refs[b].shape[-1]
        if dzb.shape[1] < n:
            dzb = jnp.pad(dzb, ((0, 0), (0, n - dzb.shape[1])))
        # slice sub_pad(kt) lanes straight off the slab (no value pads —
        # Mosaic rejects pads/concats of offset-carrying values); the
        # overhang rows of the result land in the band's structural-zero
        # rows, whose cotangent build_band_weights' pad-vjp discards
        vals = []
        for t in range(9):
            vals.append(
                jax.lax.dot_general(
                    taps[t][:, w0 * ci : w0 * ci + ktp], dzb,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        val = jnp.concatenate(vals, axis=0)  # [9*ktp, n]

        @pl.when(first)
        def _init(b=b, val=val):
            out_refs[b][...] = val

        @pl.when(jnp.logical_not(first))
        def _acc(b=b, val=val):
            out_refs[b][...] += val


# ------------------------------------------------------------ wrappers
@functools.partial(
    jax.jit, static_argnames=("ci", "co", "interpret")
)
def _fwd_call(x, w_blocks, ci, co, interpret):
    n_vol = x.shape[0]
    lanes_out = _lanes_pad(W * co)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j, _s=shape: tuple(0 for _ in _s),
            memory_space=pltpu.VMEM,
        )

    in_specs = [
        pl.BlockSpec((1, RB, x.shape[-1]), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM)
    ] + [const(w.shape) for w in w_blocks]
    kernel = functools.partial(
        _fwd_kernel, ci=ci, co=co, n_blocks=len(w_blocks)
    )
    return pl.pallas_call(
        kernel,
        grid=(n_vol,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, RB, lanes_out), lambda j: (j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n_vol, RB, lanes_out), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, *w_blocks)


@functools.partial(jax.jit, static_argnames=("ci", "co", "interpret"))
def _wgrad_call(x, dzh, ci, co, interpret):
    n_vol = x.shape[0]
    cblocks = blocks_for(co)

    def const_out(shape):
        return pl.BlockSpec(
            shape, lambda j, _s=shape: tuple(0 for _ in _s),
            memory_space=pltpu.VMEM,
        )

    out_shapes = [
        jax.ShapeDtypeStruct(
            (9 * _sub_pad((wb + 2) * ci), _lanes_pad(wb * co)),
            jnp.float32,
        )
        for (w0, wb) in cblocks
    ]
    kernel = functools.partial(_wgrad_kernel, ci=ci, co=co)
    return pl.pallas_call(
        kernel,
        grid=(n_vol,),
        in_specs=[
            pl.BlockSpec((1, RB, x.shape[-1]), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, RB, dzh.shape[-1]), lambda j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[const_out(s.shape) for s in out_shapes],
        out_shape=out_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, dzh)


def slab_band_conv(
    x_slab: jax.Array, kernel: jax.Array, interpret: bool = False
) -> jax.Array:
    """One merger Conv3d on the slab layout, fully differentiable.

    x_slab: [V, RB, lanes_pad(34*ci)] (from pack_slab); kernel: canonical
    [3, 3, 3, ci, co] (float32 tree params).  Returns the output slab
    [V, RB, lanes_pad(32*co)] in x's dtype (bias is added by the caller).
    """
    ci, co = kernel.shape[3], kernel.shape[4]
    dtype = x_slab.dtype

    @jax.custom_vjp
    def run(x, k):
        w = tuple(b.astype(dtype) for b in build_band_weights(k))
        return _fwd_call(x, w, ci, co, interpret)

    def run_fwd(x, k):
        return run(x, k), (x, k)

    def run_bwd(res, dz):
        x, k = res
        dzh = rehalo_lanes(dz, co)
        # dx through the adjoint conv (same kernel, adjoint band)
        wT = tuple(
            b.astype(dtype)
            for b in build_band_weights(adjoint_kernel(k))
        )
        dx_body = _fwd_call(dzh, wT, co, ci, interpret)
        # the adjoint conv emits only interior w lanes; x's w-halo
        # cotangent is dropped downstream anyway (pack_slab's pad vjp),
        # so re-halo the lane axis with zeros to match x's shape
        dx = rehalo_lanes(dx_body, ci)[:, :, : x.shape[-1]]
        # dW via the band adjoint: the band build is an f32 XLA einsum,
        # so its vjp maps band-matrix grads (f32, straight from the
        # wgrad kernel) back to the canonical [3,3,3,ci,co] kernel
        dw_bands = _wgrad_call(x, dzh, ci, co, interpret)
        _, band_vjp = jax.vjp(
            build_band_weights, k.astype(jnp.float32)
        )
        (dk,) = band_vjp(tuple(dw_bands))
        return dx.astype(x.dtype), dk.astype(k.dtype)

    run.defvjp(run_fwd, run_bwd)
    return run(x_slab, kernel)
