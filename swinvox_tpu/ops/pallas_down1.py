"""Fused Pallas backward for the refiner's down1 conv (1->32ch, k4, p2).

XLA's backward for this layer is its worst case on TPU: the filter
gradient's contraction has ONE input channel (1.9% MXU, 69 GB/s, ~8 ms
at batch 128) and the input gradient writes a 1-lane tensor (~4.3 ms) —
together 12.3 ms of the 220 ms train step (trace + tools/down1_bench.py;
every XLA-level reformulation tied or lost: patch stacks 40-55 ms,
z-patch 8.9 ms, slice-dot 7.8 ms).  The information floor is one
streaming read of the cotangent (294 MB at batch 128 ~ 0.4 ms), so this
module computes BOTH gradients in ONE Pallas pass over dy.

Layout (the v16-slab trick proven by ops/pallas_slab_conv.py): sixteen
volumes interleave in the sublane axis with a 37-slot (d, h) pitch —
row = (d * 37 + h) * 16 + v — so every (kd, kh) kernel tap is a row
shift of (kd * 37 + kh) * 16, perfectly aligned with the (16, 128)
bf16 tile (no Mosaic relayout).  Lanes:

  * x slab:  iw + 2 in [0, 37) on 128 lanes (zero pad above 37);
  * dy slab: (ow, c) packed dense — 33 * 32 = 1056 lanes, padded to
    9 * 128 = 1152;
  * the kw taps fold into small matmuls on the lane side: the filter
    gradient contracts x-slab rows against dy-slab rows per (kd, kh)
    into T[t] = x_t^T dy  ([128, 1152], K = rows), from which
    dW[kd,kh,kw,c] = sum_ow T[t][ow+kw, ow*32+c] — a cheap banded
    einsum in XLA; the input gradient is Y_t = dy @ M_t with
    M_t[(ow,c), ixw] = W[kd,kh,ixw-ow,c], accumulated into an f32
    scratch at the tap's row shift.

Grid: (groups of 16 volumes, 3 od-blocks of 11).  The od split keeps
the dy block at ~14 MB so everything double-buffers inside VMEM; the
dW accumulator and dx scratch persist across the inner grid dimension.

The public op conv3d_down1(x, w) is a custom_vjp whose FORWARD is the
stock lax conv (bit-identical fwd; XLA handles it well) and whose
backward is the fused kernel.  Reference layer: models/refiner.py:51-55
(torch Conv3d(1, 32, kernel_size=4, padding=2)).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 32                 # input spatial size
SO = S + 1             # output spatial size (k4, p2, stride 1)
K = 4                  # kernel size
C = 32                 # output channels
G = 37                 # (d, h) row pitch = padded input extent (-2..34)
V16 = 16               # volumes interleaved per sublane group
XROWS = G * G * V16    # 21904 x-slab rows per group
ODB = 3                # od values per inner grid block
NB = SO // ODB         # 11 od blocks (keeps the dy block ~4 MB: the
                       # whole working set double-buffers under the
                       # 128 MB VMEM ceiling — ODB=11 compiled to 152 MB)
DZROWS = SO * G * V16  # 19536 dy-slab rows per group
DZB = ODB * G * V16    # 6512 dy rows per block
DYL = SO * C           # 1056 real dy lanes
DYLP = 1152            # padded to 9 * 128
TAPS = tuple((kd, kh) for kd in range(K) for kh in range(K))
SHIFTS = tuple((kd * G + kh) * V16 for kd, kh in TAPS)


# ---------------------------------------------------------------- pack
def pack_x(x: jax.Array) -> jax.Array:
    """[N, 32, 32, 32, 1] -> [N/16, XROWS, 128] (N must be a multiple
    of 16; callers pad).  x sits at gd/gh/lane = coord + 2."""
    n = x.shape[0]
    xp = jnp.pad(
        x[..., 0], ((0, 0), (2, 3), (2, 3), (2, 128 - S - 2))
    )  # [n, 37, 37, 128]
    xp = xp.reshape(n // V16, V16, G * G, 128).transpose(0, 2, 1, 3)
    return xp.reshape(n // V16, XROWS, 128)


def pack_dy(dy: jax.Array) -> jax.Array:
    """[N, 33, 33, 33, 32] -> [N/16, DZROWS, 1152] with (ow, c) dense
    in lanes and oh padded 33 -> 37 in the row pitch."""
    n = dy.shape[0]
    z = dy.reshape(n, SO, SO, DYL)
    z = jnp.pad(z, ((0, 0), (0, 0), (0, G - SO), (0, DYLP - DYL)))
    z = z.reshape(n // V16, V16, SO * G, DYLP).transpose(0, 2, 1, 3)
    return z.reshape(n // V16, DZROWS, DYLP)


def unpack_dx(dxs: jax.Array, n: int) -> jax.Array:
    """[N/16, XROWS, 128] -> [N, 32, 32, 32, 1] (inverse of pack_x)."""
    g = dxs.shape[0]
    z = dxs.reshape(g, G * G, V16, 128).transpose(0, 2, 1, 3)
    z = z.reshape(g * V16, G, G, 128)[:, 2 : 2 + S, 2 : 2 + S, 2 : 2 + S]
    return z[:n, ..., None]


def build_m(w: jax.Array) -> jax.Array:
    """Canonical kernel [4, 4, 4, 1, 32] -> the 16 per-(kd, kh) input-
    gradient matrices [16, DYLP, 128]: M[t, ow*32+c, ixw] =
    w[kd, kh, ixw-ow, 0, c] for 0 <= ixw - ow < 4."""
    sel = np.zeros((SO, K, G), np.float32)
    for ow in range(SO):
        for kw in range(K):
            sel[ow, kw, ow + kw] = 1.0
    m = jnp.einsum(
        "okx,dhkc->dhocx", jnp.asarray(sel, w.dtype), w[..., 0, :]
    )  # [4, 4, 33, 32, 37]
    m = m.reshape(K * K, DYL, G)
    return jnp.pad(m, ((0, 0), (0, DYLP - DYL), (0, 128 - G)))


def extract_dw(t_acc: jax.Array) -> jax.Array:
    """[16, 128, DYLP] f32 tap contractions -> canonical dW
    [4, 4, 4, 1, 32] f32: dW[kd,kh,kw,c] = sum_ow T[t][ow+kw, ow*32+c]."""
    sel = np.zeros((SO, K, G), np.float32)
    for ow in range(SO):
        for kw in range(K):
            sel[ow, kw, ow + kw] = 1.0
    t = t_acc[:, :G, :DYL].reshape(K * K, G, SO, C)
    dw = jnp.einsum("txoc,okx->tkc", t, jnp.asarray(sel))
    return dw.reshape(K, K, K, 1, C)


# -------------------------------------------------------------- kernel
def _bwd_kernel(x_ref, dz_ref, m_ref, dw_ref, dx_ref, dxs_ref):
    i, rb = pl.program_id(0), pl.program_id(1)
    first = jnp.logical_and(i == 0, rb == 0)
    dz = dz_ref[0]        # [DZB, DYLP] bf16
    base = rb * DZB

    @pl.when(first)
    def _init_dw():
        dw_ref[...] = jnp.zeros((K * K, 128, DYLP), jnp.float32)

    @pl.when(rb == 0)
    def _init_dx():
        dxs_ref[...] = jnp.zeros((XROWS, 128), jnp.float32)

    for t, s_t in enumerate(SHIFTS):
        xt = x_ref[0, pl.ds(base + s_t, DZB), :]  # [DZB, 128] bf16
        # filter gradient: T[t] += x_t^T dy  (K = rows on the MXU)
        dw_ref[t] += jax.lax.dot_general(
            xt, dz,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        # input gradient: Y_t = dy @ M_t, accumulated at the tap shift
        y = jax.lax.dot_general(
            dz, m_ref[t],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [DZB, 128] f32
        dxs_ref[pl.ds(base + s_t, DZB), :] += y

    @pl.when(rb == NB - 1)
    def _emit_dx():
        dx_ref[0] = dxs_ref[...].astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bwd_call(xs, dzs, m, interpret=False):
    g = xs.shape[0]
    dw_acc, dxs = pl.pallas_call(
        _bwd_kernel,
        grid=(g, NB),
        in_specs=[
            pl.BlockSpec(
                (1, XROWS, 128), lambda i, r: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, DZB, DYLP), lambda i, r: (i, r, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (K * K, DYLP, 128), lambda i, r: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec(
                (K * K, 128, DYLP), lambda i, r: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, XROWS, 128), lambda i, r: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((K * K, 128, DYLP), jnp.float32),
            jax.ShapeDtypeStruct((g, XROWS, 128), xs.dtype),
        ],
        scratch_shapes=[pltpu.VMEM((XROWS, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(xs, dzs, m)
    return dw_acc, dxs


def _down1_bwd(x, w, dy, interpret=False):
    n = x.shape[0]
    npad = -n % V16
    if npad:
        x = jnp.pad(x, ((0, npad),) + ((0, 0),) * 4)
        dy = jnp.pad(dy, ((0, npad),) + ((0, 0),) * 4)
    dw_acc, dxs = _bwd_call(
        pack_x(x), pack_dy(dy), build_m(w.astype(dy.dtype)), interpret
    )
    dx = unpack_dx(dxs, n)
    dw = extract_dw(dw_acc).astype(w.dtype)
    return dx.astype(x.dtype), dw


# ------------------------------------------------------------- public
def _fwd_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(2, 2)] * 3, dimension_numbers=dn
    )


def conv3d_down1(
    x: jax.Array, w: jax.Array, interpret: bool = False
) -> jax.Array:
    """Conv3d(1 -> 32, k4, p2) with the stock XLA forward (bit-identical
    to lax.conv_general_dilated) and the fused Pallas backward.

    x: [N, 32, 32, 32, 1]; w: [4, 4, 4, 1, 32].  Bias is the caller's
    (models/refiner.py adds it separately)."""

    @jax.custom_vjp
    def run(x, w):
        return _fwd_conv(x, w)

    def run_fwd(x, w):
        return run(x, w), (x, w)

    def run_bwd(res, dy):
        x, w = res
        return _down1_bwd(x, w, dy, interpret=interpret)

    run.defvjp(run_fwd, run_bwd)
    return run(x, w)
