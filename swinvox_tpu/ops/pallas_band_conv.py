"""Differentiable banded 3D convolution for tiny channel counts (TPU).

The merger's Conv3d(9->9, k3) layers cost ~3.5 ms EACH in the XLA
backward at batch 64 (35-70 GB/s effective: XLA pads 9 channels to 128
lanes, a ~14x inflation).  This op reuses the band formulation of
ops/pallas_merger.py — rows = a (d, w) grid with a zero halo, lanes =
(h, c) — but as a SINGLE-LAYER, fully differentiable primitive:

  * forward: 9 (dd, dw) taps, each a static sublane slice of the halo'd
    buffer, contracted against banded (dh, ci -> co) weight matrices on
    the MXU (output lanes pack (h_out, co) blocks up to 128 lanes);
  * input gradient: the SAME kernel applied to dy with the
    flipped/transposed conv kernel (conv adjoint = correlation);
  * weight gradient: per-tap [K, N] outer products contracted over grid
    rows, ACCUMULATED IN VMEM across the sequential volume grid; the
    band-matrix gradient maps back to the [3,3,3,ci,co] kernel through
    the (linear) band construction via jax.vjp — out-of-band entries of
    the accumulated matrix are ignored by construction.

BatchNorm / bias / LeakyReLU stay in XLA on the standard layout: the
public `band_conv3d(x, kernel)` wraps layout transforms (pad/transpose/
reshape) around the band core, so it is a drop-in replacement for a
SAME-padded, stride-1, bias-free `lax.conv_general_dilated` on
[V, 32, 32, 32, ci] -> [V, 32, 32, 32, co].

Reference semantics: the conv stacks of models/merger.py:20-54 (ci 9 and
36, co 9).  Parity (fwd + grads) pinned in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swinvox_tpu.ops.pallas_merger import (
    BROWS,
    D,
    G,
    H,
    MROWS,
    Q0,
    TAPS,
    W,
    _shift_tensor,
)

MPAD = MROWS + 12  # 16-aligned accumulator rows


def _layout(ci: int):
    """(lanes, lanes_pad) for a band buffer with ci channels."""
    lanes = (H + 2) * ci
    return lanes, -(-lanes // 128) * 128


@functools.lru_cache(maxsize=None)
def _blocks(co: int):
    """Output h-blocks (h0, hb) packing (h, co) lanes up to 128."""
    hb = max(min(128 // co, H), 1)
    out = []
    h0 = 0
    while h0 < H:
        out.append((h0, min(hb, H - h0)))
        h0 += hb
    return tuple(out)


def _k_pad(h_in: int, ci: int) -> int:
    """Weight sublane count for an input slab (16-aligned for bf16)."""
    return -(-(h_in * ci) // 16) * 16


def _band_forms(kernel: jax.Array, dtype):
    """[3,3,3,ci,co] -> per-h-block band matrices [9, K_pad, 128].

    Linear in `kernel`, so its jax.vjp maps band-matrix cotangents back
    to the conv kernel (ignoring out-of-band/padded entries).
    """
    ci, co = kernel.shape[3], kernel.shape[4]
    k = jnp.transpose(kernel, (0, 2, 1, 3, 4))  # [dd, dw, dh, ci, co]
    k = k.reshape(9, 3, ci, co)
    forms = []
    for h0, hb in _blocks(co):
        s = _shift_tensor(hb + 2, hb)
        w = jnp.einsum("dio,tdce->ticoe", jnp.asarray(s), k)
        w = w.reshape(9, (hb + 2) * ci, hb * co)
        w = jnp.pad(
            w,
            ((0, 0), (0, _k_pad(hb + 2, ci) - w.shape[1]),
             (0, 128 - w.shape[2])),
        )
        forms.append(w.astype(dtype))
    return tuple(forms)


def _conv_kernel(x_ref, *rest, ci: int, co: int, compute_dtype):
    blocks = _blocks(co)
    w_refs = rest[: len(blocks)]
    o_ref = rest[len(blocks)]
    accs = rest[len(blocks) + 1 :]
    lanes_in, lanes_in_pad = _layout(ci)
    lanes_out, lanes_out_pad = _layout(co)

    q = jax.lax.broadcasted_iota(jnp.int32, (MROWS, 1), 0)
    gd, gw = q // G, q % G
    interior = (
        (gd >= 1) & (gd <= D) & (gw >= 1) & (gw <= W)
    ).astype(jnp.float32)

    x = x_ref.at[0]
    o = o_ref.at[0]
    o[0:Q0, :] = jnp.zeros((Q0, lanes_out_pad), o_ref.dtype)
    o[Q0 + MROWS : BROWS, :] = jnp.zeros(
        (BROWS - Q0 - MROWS, lanes_out_pad), o_ref.dtype
    )
    for bi in range(len(blocks)):
        accs[bi][:, :] = jnp.zeros((MPAD, 128), jnp.float32)
    for t in range(9):
        dd, dw = TAPS[t]
        shift = (dd - 1) * G + (dw - 1)
        full = x[pl.ds(Q0 + shift, MPAD), :]
        for bi, (h0, hb) in enumerate(blocks):
            kp = _k_pad(hb + 2, ci)
            accs[bi][:, :] += jax.lax.dot_general(
                full[:, h0 * ci : h0 * ci + kp],
                w_refs[bi][t].astype(compute_dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    parts = [jnp.zeros((MROWS, co), jnp.float32)]  # h = -1 halo lanes
    for bi, (h0, hb) in enumerate(blocks):
        parts.append(accs[bi][0:MROWS, 0 : hb * co])
    parts.append(
        jnp.zeros((MROWS, co + lanes_out_pad - lanes_out), jnp.float32)
    )
    y = jnp.concatenate(parts, axis=1) * interior
    o[pl.ds(Q0, MROWS), :] = y.astype(o_ref.dtype)


def _wgrad_kernel(x_ref, dy_ref, *dw_refs, ci: int, co: int):
    """Accumulate per-tap band-matrix gradients across the volume grid."""
    first = pl.program_id(0) == 0
    blocks = _blocks(co)
    x = x_ref.at[0]
    dy = dy_ref.at[0][pl.ds(Q0, MROWS), :]

    for bi, (h0, hb) in enumerate(blocks):
        kp = _k_pad(hb + 2, ci)
        lo = (h0 + 1) * co
        dyb = dy[:, lo : lo + hb * co].astype(jnp.float32)
        dyb = jnp.pad(dyb, ((0, 0), (0, 128 - hb * co)))
        taps = []
        for t in range(9):
            dd, dw = TAPS[t]
            shift = (dd - 1) * G + (dw - 1)
            xs = x[pl.ds(Q0 + shift, MPAD), :][0:MROWS, h0 * ci : h0 * ci + kp]
            taps.append(
                jax.lax.dot_general(
                    xs.astype(jnp.float32), dyb,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )
        val = jnp.stack(taps)  # [9, kp, 128]
        ref = dw_refs[bi]

        @pl.when(first)
        def _init(ref=ref, val=val):
            ref[...] = val

        @pl.when(jnp.logical_not(first))
        def _add(ref=ref, val=val):
            ref[...] = ref[...] + val


def _vol_spec(lanes):
    return pl.BlockSpec(
        (1, BROWS, lanes), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
    )


def _const_spec(shape):
    return pl.BlockSpec(
        shape, lambda j, _s=shape: tuple(0 for _ in _s),
        memory_space=pltpu.VMEM,
    )


def _conv_call(kernel_fn, x_band, weights, out_lanes_pad, interpret):
    v = x_band.shape[0]
    return pl.pallas_call(
        kernel_fn,
        grid=(v,),
        in_specs=[_vol_spec(x_band.shape[2])]
        + [_const_spec(w.shape) for w in weights],
        out_specs=_vol_spec(out_lanes_pad),
        out_shape=jax.ShapeDtypeStruct(
            (v, BROWS, out_lanes_pad), x_band.dtype
        ),
        scratch_shapes=[pltpu.VMEM((MPAD, 128), jnp.float32) for _ in weights],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_band, *weights)


def _wgrad_call(kernel_fn, x_band, dy_band, grad_shapes, interpret):
    v = x_band.shape[0]
    return pl.pallas_call(
        kernel_fn,
        grid=(v,),
        in_specs=[_vol_spec(x_band.shape[2]), _vol_spec(dy_band.shape[2])],
        out_specs=[_const_spec(s) for s in grad_shapes],
        out_shape=[jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_band, dy_band)


@functools.lru_cache(maxsize=None)
def _make_core(ci: int, co: int, interpret: bool):
    """custom_vjp'd band conv core: (x_band, kernel) -> y_band."""

    def _fwd_impl(x_band, kernel):
        weights = _band_forms(kernel, x_band.dtype)
        fn = functools.partial(
            _conv_kernel, ci=ci, co=co, compute_dtype=x_band.dtype
        )
        return _conv_call(fn, x_band, weights, _layout(co)[1], interpret)

    @jax.custom_vjp
    def core(x_band, kernel):
        return _fwd_impl(x_band, kernel)

    def core_fwd(x_band, kernel):
        return _fwd_impl(x_band, kernel), (x_band, kernel)

    def core_bwd(res, dy_band):
        x_band, kernel = res
        # input grad: correlate dy with the flipped, ci<->co-swapped kernel
        kt = jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)
        dx_band = _make_core(co, ci, interpret)(
            dy_band, kt.astype(kernel.dtype)
        )
        # NOTE: dx comes from the transposed core's own fwd (linear op) —
        # but route through its _fwd_impl to avoid a second VJP level
        # weight grad: banded outer products accumulated over volumes
        fn = functools.partial(_wgrad_kernel, ci=ci, co=co)
        grad_shapes = [
            (9, _k_pad(hb + 2, ci), 128) for (h0, hb) in _blocks(co)
        ]
        dwf = _wgrad_call(fn, x_band, dy_band, grad_shapes, interpret)
        _, band_vjp = jax.vjp(
            lambda k: _band_forms(k, jnp.float32), kernel.astype(jnp.float32)
        )
        (dkernel,) = band_vjp(tuple(dwf))
        return dx_band, dkernel.astype(kernel.dtype)

    core.defvjp(core_fwd, core_bwd)
    return core


def to_band(x: jax.Array) -> jax.Array:
    """[V, D, H, W, ci] -> band layout [V, BROWS, lanes_pad(ci)]."""
    v, _, _, _, ci = x.shape
    lanes, lanes_pad = _layout(ci)
    x_h = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))
    x_h = jnp.transpose(x_h, (0, 1, 3, 2, 4)).reshape(v, D, W, lanes)
    x_g = jnp.pad(x_h, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x_p = x_g.reshape(v, MROWS, lanes)
    return jnp.pad(
        x_p, ((0, 0), (Q0, BROWS - Q0 - MROWS), (0, lanes_pad - lanes))
    )


def from_band(y: jax.Array, co: int) -> jax.Array:
    """Band layout [V, BROWS, lanes_pad(co)] -> [V, D, H, W, co]."""
    v = y.shape[0]
    lanes, _ = _layout(co)
    y = y[:, Q0 : Q0 + MROWS, :lanes].reshape(v, G, G, H + 2, co)
    y = y[:, 1 : D + 1, 1 : W + 1, 1 : H + 1]
    return jnp.transpose(y, (0, 1, 3, 2, 4))


def band_conv3d(
    x: jax.Array, kernel: jax.Array, interpret: bool = False
) -> jax.Array:
    """SAME-padded stride-1 bias-free conv3d, band-kernel execution.

    x: [V, 32, 32, 32, ci]; kernel: [3, 3, 3, ci, co] -> [V, 32^3, co].
    Differentiable in both arguments (in-kernel input/weight gradients).
    """
    ci, co = kernel.shape[3], kernel.shape[4]
    core = _make_core(ci, co, interpret)
    return from_band(core(to_band(x), kernel), co)
