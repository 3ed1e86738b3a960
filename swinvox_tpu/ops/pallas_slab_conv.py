"""Differentiable v16-slab conv: the merger's Conv3d as single MXU dots.

The merger's 9-channel NDHWC Conv3d stack costs ~35 ms of a 154 ms
batch-64 train step in XLA (convs at 35-70 GB/s effective: 9 lanes padded
to 128, ~14x memory inflation — PERFORMANCE.md).  This op re-expresses
ONE Conv3d on a "v16 slab" layout measured 3x faster than the XLA conv
in isolation (0.43 vs 1.4 ms for a 64-volume 9->9 layer):

  * rows interleave SIXTEEN volumes in the sublane axis:
    row = ((d+1)*34 + (h+1)) * 16 + v16, with >=35-spatial-row margins
    top and bottom.  Every (dd, dh) kernel tap is then a row shift of
    16 * (dd-1)*34 + (dh-1)) — a multiple of 16, i.e. perfectly aligned
    with the (16, 128) bf16 tile, so tap reads cost no Mosaic relayout;
  * lanes pack (w, c) in three 128-aligned w-blocks of 12/12/8 output
    columns with a one-slot halo ((wb+2)*ci <= 126 lanes each), folding
    the dw taps into a banded channel matrix;
  * because the 9 tap slices are aligned VALUES, they lane-concatenate
    into ONE [rows, 9*128] operand per block, turning the whole conv
    into one K=1152 MXU dot per w-block — the tap accumulation happens
    inside the MXU.  (Both earlier variants measurably lost: per-tap
    f32 accumulator adds cost 24 VMEM round-trips of a 9.5 MB
    accumulator (2.7 ms/layer), and the misaligned per-volume layout
    paid a relayout per tap (2.0 ms/layer).)

Packing/unpacking ([N, D, H, W, C] <-> slab) is pad + reshape + one
leading-dim transpose in XLA.  Bias, train-mode BatchNorm, LeakyReLU and
the view softmax stay in XLA, so the module keeps flax Norm semantics
and the canonical parameter tree.

Backward is exact, via custom_vjp:
  * dx is the SAME forward kernel with the adjoint band weights (taps
    flipped, ci/co swapped) on the repacked cotangent — a transposed
    conv is just another conv on this layout;
  * dW contracts the tap concatenation of x against dz blocks over the
    18560-row axis (one K=rows dot per w-block), accumulated across
    volume groups in VMEM; the adjoint from band matrices back to the
    canonical [3,3,3,ci,co] kernel falls out of XLA autodiff because
    the band build is an XLA einsum inside the differentiable wrapper.

Inputs with ci > 9 (the merger's 36-channel concat layer) are split into
ci<=9 source chunks and summed — conv is linear in the input channels.

Reference semantics: each layer of models/merger.py:70-93.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = H = W = 32
G = 34                 # (d, h) pitch including the one-cell halo
V16 = 16               # volumes interleaved per sublane group
Q0 = 36                # top margin in spatial rows (>= max tap shift 35)
PITCH = Q0 + G * G + 40   # 1232 spatial rows per group (40-row bottom margin)
RB = PITCH * V16       # 19712 physical rows per group
RPAD = (G * G + 4) * V16  # 18560 rows processed per tap read (8-aligned)
WBLOCKS = ((0, 12), (12, 12), (24, 8))
N_BLOCKS = len(WBLOCKS)
LANES = 128 * N_BLOCKS  # 384
MAX_CI = 9             # (wb+2)*ci <= 128 requires ci <= 9
# (dd, dh) tap row shifts in spatial rows; tap index t = dd*3 + dh
TAP_SHIFTS = tuple(
    (dd - 1) * G + (dh - 1) for dd in range(3) for dh in range(3)
)
KCAT = 9 * 128         # taps stacked along K in the concatenated operand


# ---------------------------------------------------------------- pack
def pack_slab(x: jax.Array) -> jax.Array:
    """[N, D, H, W, C] -> [ceil(N/16), RB, 384], 16 volumes per group
    interleaved in rows (pads + reshapes + one leading transpose).

    C must be <= MAX_CI.  N is zero-padded up to a multiple of 16; the
    pad volumes are all-zero, so convs of them are zero and they are
    sliced away by unpack_slab."""
    n, d, h, w, c = x.shape
    assert c <= MAX_CI, c
    npad = -n % V16
    if npad:
        x = jnp.pad(x, ((0, npad),) + ((0, 0),) * 4)
    n += npad
    xw = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))  # w halo
    blocks = []
    for w0, wb in WBLOCKS:
        blk = xw[:, :, :, w0 : w0 + wb + 2, :].reshape(n, d, h, (wb + 2) * c)
        blocks.append(
            jnp.pad(blk, ((0, 0),) * 3 + ((0, 128 - (wb + 2) * c),))
        )
    y = jnp.concatenate(blocks, -1)                   # [n, 32, 32, 384]
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))  # (d, h) halo
    y = y.reshape(n // V16, V16, G * G, LANES).transpose(0, 2, 1, 3)
    y = y.reshape(n // V16, G * G * V16, LANES)
    return jnp.pad(
        y, ((0, 0), (Q0 * V16, (PITCH - Q0 - G * G) * V16), (0, 0))
    )


def pack_out(z: jax.Array) -> jax.Array:
    """[N, D, H, W, C] -> [g, RB, 384] in the forward-OUTPUT layout
    (wb*c columns per block, no w-halo slots) — the layout _fwd_kernel
    writes and _wgrad_kernel reads for the cotangent operand."""
    n, d, h, w, c = z.shape
    npad = -n % V16
    if npad:
        z = jnp.pad(z, ((0, npad),) + ((0, 0),) * 4)
    n += npad
    blocks = []
    for w0, wb in WBLOCKS:
        blk = z[:, :, :, w0 : w0 + wb, :].reshape(n, d, h, wb * c)
        blocks.append(jnp.pad(blk, ((0, 0),) * 3 + ((0, 128 - wb * c),)))
    y = jnp.concatenate(blocks, -1)
    y = jnp.pad(y, ((0, 0), (1, 1), (1, 1), (0, 0)))
    y = y.reshape(n // V16, V16, G * G, LANES).transpose(0, 2, 1, 3)
    y = y.reshape(n // V16, G * G * V16, LANES)
    return jnp.pad(
        y, ((0, 0), (Q0 * V16, (PITCH - Q0 - G * G) * V16), (0, 0))
    )


def unpack_slab(z: jax.Array, co: int, n: int) -> jax.Array:
    """[g, RB, 384] -> [n, D, H, W, co].

    z's block lanes hold wb*co output columns (no halo slots); group
    margins and (d, h) halo rows carry garbage and are sliced off."""
    g = z.shape[0]
    z = z[:, Q0 * V16 : (Q0 + G * G) * V16, :].reshape(g, G * G, V16, LANES)
    z = z.transpose(0, 2, 1, 3).reshape(g * V16, G, G, LANES)
    parts = [
        z[:, :, :, b * 128 : b * 128 + wb * co].reshape(
            g * V16, G, G, wb, co
        )
        for b, (w0, wb) in enumerate(WBLOCKS)
    ]
    y = jnp.concatenate(parts, 3)[:, 1 : D + 1, 1 : H + 1]
    return y[:n]


# ------------------------------------------------------------- weights
def _shift_tensor(wb: int) -> np.ndarray:
    s = np.zeros((3, wb + 2, wb), np.float32)
    for dw in range(3):
        for o in range(wb):
            s[dw, o + dw, o] = 1.0
    return s


def build_band_weights(kernel: jax.Array) -> jax.Array:
    """Canonical kernel [3, 3, 3, ci, co] -> [3 blocks, 9*128, 128], the
    taps stacked along K to match the in-kernel tap concatenation, in
    XLA (differentiable — its autodiff is the dW un-banding adjoint).
    Stays in the kernel's dtype (keep f32 for the dW adjoint; cast the
    returned blocks for the MXU)."""
    ci, co = kernel.shape[3], kernel.shape[4]
    mats = []
    for w0, wb in WBLOCKS:
        s = jnp.asarray(_shift_tensor(wb), kernel.dtype)
        # taps (dd, dh) stay explicit; dw folds into the band
        band = jnp.einsum("wio,dhwce->dhicoe", s, kernel)
        band = band.reshape(9, (wb + 2) * ci, wb * co)
        band = jnp.pad(
            band,
            ((0, 0), (0, 128 - (wb + 2) * ci), (0, 128 - wb * co)),
        )
        mats.append(band.reshape(KCAT, 128))
    return jnp.stack(mats, 0)


def adjoint_kernel(kernel: jax.Array) -> jax.Array:
    """[3,3,3,ci,co] -> the transposed-conv kernel [3,3,3,co,ci]
    (spatial flip + ci/co swap)."""
    return jnp.transpose(kernel[::-1, ::-1, ::-1], (0, 1, 2, 4, 3))


# -------------------------------------------------------------- kernels
def _tap_cat(x, b):
    """Lane-concat of the 9 aligned tap slices of block b: [RPAD, 9*128].
    All slices start at multiples of 16 rows / 128 lanes, so the concat
    is Mosaic-legal and feeds one K=1152 MXU dot."""
    return jnp.concatenate(
        [
            jax.lax.slice(
                x,
                ((Q0 + s) * V16, b * 128),
                ((Q0 + s) * V16 + RPAD, b * 128 + 128),
            )
            for s in TAP_SHIFTS
        ],
        axis=1,
    )


def _fwd_kernel(x_ref, w_ref, o_ref):
    dtype = x_ref.dtype
    x = x_ref[0]
    outs = []
    for b in range(N_BLOCKS):
        outs.append(
            jax.lax.dot_general(
                _tap_cat(x, b), w_ref[b].astype(dtype),
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )
    y = jnp.concatenate(outs, -1).astype(o_ref.dtype)
    o_ref[0, 0 : Q0 * V16, :] = jnp.zeros((Q0 * V16, LANES), o_ref.dtype)
    o_ref[0, Q0 * V16 : Q0 * V16 + RPAD, :] = y
    o_ref[0, Q0 * V16 + RPAD :, :] = jnp.zeros(
        (RB - Q0 * V16 - RPAD, LANES), o_ref.dtype
    )


def _wgrad_kernel(x_ref, dz_ref, o_ref):
    """dW band accumulation across volume groups: one K=RPAD dot per
    block; o_ref [3, 9*128, 128] f32 is constant-index (VMEM-resident),
    the same shape build_band_weights emits, so the band-adjoint vjp
    consumes it directly.  Band pad rows/cols receive garbage from the
    operands' structural-pad lanes; the pad-vjp of build_band_weights
    discards exactly those entries."""
    first = pl.program_id(0) == 0
    x = x_ref[0]
    dz = dz_ref[0]
    for b in range(N_BLOCKS):
        dzb = jax.lax.slice(
            dz, (Q0 * V16, b * 128), (Q0 * V16 + RPAD, b * 128 + 128)
        )
        val = jax.lax.dot_general(
            _tap_cat(x, b), dzb,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        @pl.when(first)
        def _init(b=b, val=val):
            o_ref[b] = val

        @pl.when(jnp.logical_not(first))
        def _acc(b=b, val=val):
            o_ref[b] += val


# ------------------------------------------------------------ wrappers
@functools.partial(jax.jit, static_argnames=("interpret",))
def _fwd_call(x, wbands, interpret):
    g = x.shape[0]
    return pl.pallas_call(
        _fwd_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, RB, LANES), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (N_BLOCKS, KCAT, 128), lambda j: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, RB, LANES), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, RB, LANES), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, wbands)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _wgrad_call(x, dz, interpret):
    g = x.shape[0]
    return pl.pallas_call(
        _wgrad_kernel,
        grid=(g,),
        in_specs=[
            pl.BlockSpec(
                (1, RB, LANES), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, RB, LANES), lambda j: (j, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (N_BLOCKS, KCAT, 128),
            lambda j: (0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((N_BLOCKS, KCAT, 128), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(x, dz)


def _conv(x, kernel, interpret):
    """One ci<=9 conv [N,D,H,W,ci] -> [N,D,H,W,co], fully differentiable
    (pack/kernel/unpack inside the custom_vjp boundary)."""
    n = x.shape[0]
    ci, co = kernel.shape[3], kernel.shape[4]

    @jax.custom_vjp
    def run(x, k):
        z = _fwd_call(
            pack_slab(x), build_band_weights(k).astype(x.dtype), interpret
        )
        return unpack_slab(z, co, n)

    def run_fwd(x, k):
        return run(x, k), (x, k)

    def run_bwd(res, dz):
        x, k = res
        # dx: the transposed conv is the SAME-padding conv of the
        # cotangent with the flipped/swapped kernel — pack_slab's zero
        # halo provides the padding
        wT = build_band_weights(adjoint_kernel(k)).astype(dz.dtype)
        dx = unpack_slab(_fwd_call(pack_slab(dz), wT, interpret), ci, n)
        # dW via the band adjoint: the band build is an f32 XLA einsum,
        # so its vjp maps band-matrix grads (f32, straight from the
        # wgrad kernel) back to the canonical [3,3,3,ci,co] kernel
        dw_bands = _wgrad_call(pack_slab(x), pack_out(dz), interpret)
        _, band_vjp = jax.vjp(build_band_weights, k.astype(jnp.float32))
        (dk,) = band_vjp(dw_bands)
        return dx.astype(x.dtype), dk.astype(k.dtype)

    run.defvjp(run_fwd, run_bwd)
    return run(x, kernel)


def slab_conv3d(
    x: jax.Array, kernel: jax.Array, interpret: bool = False
) -> jax.Array:
    """One merger Conv3d (stride 1, padding 1, NDHWC), differentiable.

    x: [N, 32, 32, 32, ci]; kernel: canonical [3, 3, 3, ci, co] float32
    tree params.  Returns [N, 32, 32, 32, co] in x's dtype (bias is
    added by the caller).  ci > 9 splits into <=9-channel source chunks
    (conv is linear in input channels) so every chunk fits the 128-lane
    w-block budget."""
    ci = kernel.shape[3]
    if ci <= MAX_CI:
        return _conv(x, kernel, interpret)
    acc = None
    for c0 in range(0, ci, MAX_CI):
        c1 = min(c0 + MAX_CI, ci)
        z = _conv(x[..., c0:c1], kernel[:, :, :, c0:c1, :], interpret)
        acc = z if acc is None else acc + z
    return acc
