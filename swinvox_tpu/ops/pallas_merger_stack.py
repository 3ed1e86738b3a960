"""Whole-stack merger training megakernel: ONE fwd call, ONE bwd call.

Why: the merger conv stack costs ~35 ms of a 154 ms batch-64 train step
in XLA, and BOTH per-layer Pallas replacements lost in the full step
even with a 3x-faster conv body (PERFORMANCE.md): the per-layer glue —
pack/unpack transposes, BatchNorm round trips, and ~27 pallas_call
barriers — costs exactly what the kernels save.  This kernel keeps the
whole six-layer stack (reference models/merger.py:70-93: five
Conv3d+BN+LeakyReLU layers feeding a softmax head conv) slab-resident:
pack once, run every conv + train-mode BatchNorm + LeakyReLU inside a
single pallas_call, unpack once; backward is one more call.

Layout (= ops/pallas_slab_conv.py, validated there):
  * rows interleave 16 volumes in the sublane axis with >=35-spatial-row
    margins, so every (dd, dh) tap is a 16-aligned row shift;
  * lanes pack (w, c) in three 128-aligned w-blocks; dw folds into a
    banded channel matrix; the 9 aligned tap slices lane-concatenate
    into ONE K=1152 MXU dot per block.

In-kernel structure (fwd, grid = (6 layers, groups), layer-major):
  * raw conv outputs r_l = conv_l + bias live in HBM (ANY memory space,
    manual DMA) in the CANONICAL un-halo'd lane layout;
  * BatchNorm is normalize-on-READ: layer l's body loads r_{l-1},
    applies (x*a + c) with a/c built from the accumulated batch sums of
    layer l-1 (complete, because the grid is layer-major sequential),
    LeakyReLU, a row-validity mask, then a 0/1 permutation MATMUL that
    performs the halo-fill (canonical -> halo'd input layout) as one
    MXU dot instead of a lane shuffle;
  * per-channel batch sums (sum, sum of squares) accumulate in VMEM
    scratch from the bf16-cast conv outputs (matching what the XLA
    BatchNorm sees) and are emitted for the running-average update;
  * layer 4 (the 36-channel concat conv) runs as four 9-channel source
    convs accumulated in an f32 VMEM accumulator (conv linearity);
  * layer 5's BatchNorm stays in XLA (1 channel; the module recomputes
    its batch stats from raw5 so plain autodiff handles the BN-5
    backward including the stats terms).

Backward (grid = (6 stages, groups), stages walk layers 5..0):
  * d(r_l) for l<5 is finalized from an accumulated d(BNout_l) HBM
    buffer plus the global BN-backward sums S1 = sum d(BNout) and
    S2 = sum d(BNout)*xhat — both accumulated AT THE CONTRIBUTING
    STAGE (l+1 and 4, all strictly earlier), so no extra pass is
    needed; S1/S2 double as dbeta/dgamma;
  * the transposed conv is the same cat+dot machinery on the halo-fill
    of d(r_l) with the flipped/swapped kernel (the halo-fill
    permutation's adjoint folds into the canonical transposed conv);
  * dW accumulates per-unit band gradients in VMEM (one K=rows dot per
    w-block per chunk) and is un-banded in XLA through the band-build
    einsum's autodiff; db comes from masked lane sums of d(r_l).

The flax parameter tree is untouched: the module reads conv/BN
variables (differentiable) and applies the running-average update via
Norm's external-stats mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swinvox_tpu.ops.pallas_slab_conv import (
    G,
    KCAT,
    LANES,
    N_BLOCKS,
    PITCH,
    Q0,
    RB,
    RPAD,
    TAP_SHIFTS,
    V16,
    WBLOCKS,
    adjoint_kernel,
    build_band_weights,
    pack_out,
    pack_slab,
    unpack_slab,
)

D = H = W = 32
CH = RPAD // 8          # 2320-row chunks bound Mosaic register spills
NCH = 8
CPAD = 128              # channel axis padded to one lane tile
# conv units: layers 0..3, the four 9-channel source chunks of layer 4,
# and layer 5; unit u covers (layer, input-source-layer)
UNITS = ((0, None), (1, None), (2, None), (3, None),
         (4, 0), (4, 1), (4, 2), (4, 3), (5, None))
N_UNITS = len(UNITS)


# ---------------------------------------------------------- constants
def _out_lane(w: int, c: int, cc: int) -> int:
    bb = 0 if w < 12 else (1 if w < 24 else 2)
    return bb * 128 + (w - WBLOCKS[bb][0]) * c + cc


@functools.lru_cache(maxsize=None)
def _np_consts():
    """P9/P1 (canonical->halo'd layout permutations), E9/E1 (channel->
    lane indicators over canonical lanes), row-validity mask."""
    out = {}
    for c, name in ((9, "9"), (1, "1")):
        p = np.zeros((LANES, LANES), np.float32)
        for b, (w0, wb) in enumerate(WBLOCKS):
            for j in range(wb + 2):
                w = w0 - 1 + j
                if 0 <= w < W:
                    for cc in range(c):
                        p[_out_lane(w, c, cc), b * 128 + j * c + cc] = 1.0
        e = np.zeros((CPAD, LANES), np.float32)
        for b, (w0, wb) in enumerate(WBLOCKS):
            for j in range(wb):
                for cc in range(c):
                    e[cc, b * 128 + j * c + cc] = 1.0
        out["P" + name] = p
        out["E" + name] = e
    rowm = np.zeros((RB, 128), np.float32)
    for sp in range(G * G):
        d_, h_ = sp // G, sp % G
        if 1 <= d_ < G - 1 and 1 <= h_ < G - 1:
            rowm[(Q0 + sp) * V16 : (Q0 + sp + 1) * V16, :] = 1.0
    out["rowm"] = rowm
    return out


def _unit_kernels(kernels):
    """The 6 canonical kernels -> 9 per-unit [3,3,3,9,co] kernels."""
    us = list(kernels[:4])
    for s in range(4):
        us.append(kernels[4][:, :, :, s * 9 : (s + 1) * 9, :])
    us.append(kernels[5])
    return us


def _pad_c(v, rows=1):
    """[co] -> [rows, CPAD] f32 (zero-padded channel row vector)."""
    v = jnp.asarray(v, jnp.float32).reshape(1, -1)
    v = jnp.pad(v, ((0, 0), (0, CPAD - v.shape[1])))
    return jnp.broadcast_to(v, (rows, CPAD)) if rows != 1 else v


# ------------------------------------------------------ kernel helpers
def _lane(vec, e_ref):
    """[1, CPAD] f32 @ E [CPAD, LANES] -> [1, LANES] f32."""
    return jax.lax.dot_general(
        vec, e_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _cat_chunk(zh_ref, b, r0):
    """[CH, 9*128] tap concatenation of block b for the chunk whose
    data-region row start is r0 (= Q0*V16 + i*CH, always 16-aligned —
    the pl.multiple_of hint lets Mosaic keep the dynamic tap slices
    relayout-free)."""
    return jnp.concatenate(
        [
            zh_ref[
                pl.ds(pl.multiple_of(r0 + s * V16, V16), CH),
                b * 128 : (b + 1) * 128,
            ]
            for s in TAP_SHIFTS
        ],
        axis=1,
    )


def _chunk_loop(body, carry=None):
    """fori_loop over the NCH row chunks of the data region; body gets
    the 16-aligned absolute row start.  A real loop (not a Python
    unroll) keeps Mosaic's register/spill liveness bounded to ONE
    chunk."""

    def wrapped(i, c):
        r0 = pl.multiple_of(Q0 * V16 + i * CH, V16)
        return body(r0, c)

    return jax.lax.fori_loop(0, NCH, wrapped, 0 if carry is None else carry)


def _zero_margins(ref):
    lanes = ref.shape[-1]
    ref[0 : Q0 * V16, :] = jnp.zeros((Q0 * V16, lanes), ref.dtype)
    ref[Q0 * V16 + RPAD : RB, :] = jnp.zeros(
        (RB - Q0 * V16 - RPAD, lanes), ref.dtype
    )


def _bn_consts(s_ref, pp_ref, e9_ref, lp, count, eps):
    """Normalize-affine (a, c) lane vectors for layer lp: y = x*a + c."""
    s1 = s_ref[lp, 0:1, :].astype(jnp.float32)
    s2 = s_ref[lp, 1:2, :].astype(jnp.float32)
    mu = s1 * (1.0 / count)
    var = s2 * (1.0 / count) - mu * mu
    inv = jax.lax.rsqrt(var + eps)
    gi = pp_ref[lp, 0:1, :] * inv
    a = _lane(gi, e9_ref)
    cc = _lane(pp_ref[lp, 1:2, :] - mu * gi, e9_ref)
    return a, cc, mu, inv


# -------------------------------------------------------------- forward
def _fwd_kernel(
    x_hbm, w_ref, p9_ref, e9_ref, e1_ref, e9t_ref, e1t_ref, rowm_ref,
    pp_ref,
    r0, r1, r2, r3, r4, r5, sums_o,
    in_v, zh_v, acc4, sums_s, sem,
    *, ng, count, leaky, eps,
):
    l = pl.program_id(0)
    g = pl.program_id(1)
    rbufs = (r0, r1, r2, r3, r4, r5)
    dtype = in_v.dtype

    @pl.when((l == 0) & (g == 0))
    def _init():
        sums_s[...] = jnp.zeros_like(sums_s)

    def copy(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    def rowm32(r0):
        return rowm_ref[pl.ds(r0, CH), 0:1].astype(jnp.float32)

    def norm_to_zh(lp):
        """in_v (raw r_lp) -> zh_v: BN(stats lp) + leaky + row mask +
        halo-fill permutation dot."""
        a, cc, _, _ = _bn_consts(sums_s, pp_ref, e9_ref, lp, count, eps)
        _zero_margins(zh_v)
        p9 = p9_ref[...]

        def chunk(r0, carry):
            z = in_v[pl.ds(r0, CH), :].astype(jnp.float32) * a + cc
            z = jnp.where(z > 0, z, z * leaky)
            z = z * rowm32(r0)
            zh_v[pl.ds(r0, CH), :] = jax.lax.dot_general(
                z.astype(dtype), p9,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            return carry

        _chunk_loop(chunk)

    def conv_emit(li, u, et_ref, e_ref, from_acc):
        """cat+dot (or acc4 readout) + bias -> out_v, accumulating the
        batch sums of the bf16-cast output (in_v doubles as the output
        staging buffer: its r_{l-1} contents are dead once zh_v is
        built)."""
        bias_lane = _lane(pp_ref[li, 2:3, :], e_ref)
        out_v = in_v
        _zero_margins(out_v)
        s1_parts, s2_parts = [], []
        for b in range(N_BLOCKS):
            bsl = slice(b * 128, (b + 1) * 128)

            def chunk(r0, carry, b=b, bsl=bsl):
                s1b, s2b = carry
                if from_acc:
                    d = acc4[pl.ds(pl.multiple_of(r0 - Q0 * V16, V16), CH), bsl]
                else:
                    d = jax.lax.dot_general(
                        _cat_chunk(zh_v, b, r0), w_ref[u, b].astype(dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                d = d + bias_lane[:, bsl]
                vb = d.astype(dtype)
                out_v[pl.ds(r0, CH), bsl] = vb
                v32 = vb.astype(jnp.float32) * rowm32(r0)
                s1b = s1b + jnp.sum(v32, axis=0, keepdims=True)
                s2b = s2b + jnp.sum(
                    v32 * vb.astype(jnp.float32), axis=0, keepdims=True
                )
                return s1b, s2b

            zero = jnp.zeros((1, 128), jnp.float32)
            s1b, s2b = _chunk_loop(chunk, (zero, zero))
            s1_parts.append(s1b)
            s2_parts.append(s2b)
        s1 = jnp.concatenate(s1_parts, axis=1)
        s2 = jnp.concatenate(s2_parts, axis=1)
        et = et_ref[...]
        sums_s[li, 0:1, :] += jax.lax.dot_general(
            s1, et, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        sums_s[li, 1:2, :] += jax.lax.dot_general(
            s2, et, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    for li in range(6):

        @pl.when(l == li)
        def _body(li=li):
            if li == 0:
                copy(x_hbm.at[g], zh_v)  # x is packed halo'd + masked
                conv_emit(0, 0, e9t_ref, e9_ref, False)
            elif li != 4:
                copy(rbufs[li - 1].at[g], in_v)
                norm_to_zh(li - 1)
                et, e = (
                    (e1t_ref, e1_ref) if li == 5 else (e9t_ref, e9_ref)
                )
                conv_emit(li, 8 if li == 5 else li, et, e, False)
            else:
                for s in range(4):
                    copy(rbufs[s].at[g], in_v)
                    norm_to_zh(s)
                    for b in range(N_BLOCKS):
                        bsl = slice(b * 128, (b + 1) * 128)

                        def chunk(r0, carry, s=s, b=b, bsl=bsl):
                            d = jax.lax.dot_general(
                                _cat_chunk(zh_v, b, r0),
                                w_ref[4 + s, b].astype(dtype),
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            ar = pl.ds(pl.multiple_of(r0 - Q0 * V16, V16), CH)
                            if s == 0:
                                acc4[ar, bsl] = d
                            else:
                                acc4[ar, bsl] += d
                            return carry

                        _chunk_loop(chunk)
                conv_emit(4, 0, e9t_ref, e9_ref, True)
            copy(in_v, rbufs[li].at[g])

            if li == 5:

                @pl.when(g == ng - 1)
                def _emit():
                    sums_o[...] = sums_s[...]


@functools.partial(
    jax.jit, static_argnames=("ng", "count", "leaky", "eps", "interpret")
)
def _fwd_call(xp, wbands, p9, e9, e1, e9t, e1t, rowm, pp,
              ng, count, leaky, eps, interpret):
    dtype = xp.dtype
    slab = jax.ShapeDtypeStruct((ng, RB, LANES), dtype)
    kernel = functools.partial(
        _fwd_kernel, ng=ng, count=count, leaky=leaky, eps=eps
    )
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def const(a):
        return vm(a.shape, lambda l, g, _s=a.shape: (0,) * len(_s))

    return pl.pallas_call(
        kernel,
        grid=(6, ng),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [const(a) for a in (wbands, p9, e9, e1, e9t, e1t, rowm, pp)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
        + [vm((6, 8, CPAD), lambda l, g: (0, 0, 0))],
        out_shape=[slab] * 6
        + [jax.ShapeDtypeStruct((6, 8, CPAD), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((RB, LANES), dtype),
            pltpu.VMEM((RB, LANES), dtype),
            pltpu.VMEM((RPAD, LANES), jnp.float32),
            pltpu.VMEM((6, 8, CPAD), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, wbands, p9, e9, e1, e9t, e1t, rowm, pp)


# ------------------------------------------------------------- backward
def _bwd_kernel(
    x_hbm, r0, r1, r2, r3, r4, dz5,
    w_ref, wa_ref, p9_ref, p1_ref, e9_ref, e1_ref, e9t_ref, e1t_ref,
    rowm_ref, pp_ref, sums_ref,
    dx_hbm, dB0, dB1, dB2, dB3, dB4, dw_o, dgb_o,
    a_v, b_v, c_v, d_v, s_v, sem,
    *, ng, count, leaky, eps,
):
    sidx = pl.program_id(0)
    g = pl.program_id(1)
    rbufs = (r0, r1, r2, r3, r4)
    dbufs = (dB0, dB1, dB2, dB3, dB4)
    dtype = a_v.dtype

    @pl.when((sidx == 0) & (g == 0))
    def _init():
        dw_o[...] = jnp.zeros_like(dw_o)
        dgb_o[...] = jnp.zeros_like(dgb_o)

    def copy(src, dst):
        cp = pltpu.make_async_copy(src, dst, sem)
        cp.start()
        cp.wait()

    def rowm32(c):
        return rowm_ref[pl.ds(c, CH), 0:1].astype(jnp.float32)

    def dot(a, b):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def norm_to_zh(lp):
        """a_v (raw r_lp) -> b_v (zh), stats from the saved fwd sums."""
        a, cc, _, _ = _bn_consts(sums_ref, pp_ref, e9_ref, lp, count, eps)
        _zero_margins(b_v)
        p9 = p9_ref[...]

        def chunk(r0, carry):
            z = a_v[pl.ds(r0, CH), :].astype(jnp.float32) * a + cc
            z = jnp.where(z > 0, z, z * leaky)
            z = z * rowm32(r0)
            b_v[pl.ds(r0, CH), :] = dot(z.astype(dtype), p9).astype(dtype)
            return carry

        _chunk_loop(chunk)

    def finalize_dr(li):
        """c_v (accumulated dBNout_li) + a_v (r_li) -> c_v (d r_li):
        d(r) = gi*(dBN - S1/Nc) - gi*inv*(S2/Nc)*(x - mu), per channel."""
        _, _, mu, inv = _bn_consts(
            sums_ref, pp_ref, e9_ref, li, count, eps
        )
        g_ = pp_ref[li, 0:1, :]
        s1n = dgb_o[li, 0:1, :] * (1.0 / count)
        s2n = dgb_o[li, 1:2, :] * (1.0 / count)
        gi = g_ * inv
        q1 = _lane(gi, e9_ref)
        q2 = _lane(gi * s2n * inv, e9_ref)
        q3 = _lane(gi * s2n * inv * mu - gi * s1n, e9_ref)
        _zero_margins(c_v)

        def chunk(r0, carry):
            x32 = a_v[pl.ds(r0, CH), :].astype(jnp.float32)
            d32 = c_v[pl.ds(r0, CH), :].astype(jnp.float32)
            dr = (q1 * d32 - q2 * x32 + q3) * rowm32(r0)
            c_v[pl.ds(r0, CH), :] = dr.astype(dtype)
            return carry

        _chunk_loop(chunk)

    def halo(p_ref):
        """c_v (d r_l, canonical) -> d_v (halo-filled for the adjoint)."""
        _zero_margins(d_v)
        p = p_ref[...]

        def chunk(r0, carry):
            d_v[pl.ds(r0, CH), :] = dot(
                c_v[pl.ds(r0, CH), :], p.astype(dtype)
            ).astype(dtype)
            return carry

        _chunk_loop(chunk)

    def wgrad(u):
        """dw_o[u] += cat(b_v)^T @ c_v blocks."""
        for b in range(N_BLOCKS):
            bsl = slice(b * 128, (b + 1) * 128)

            def chunk(r0, wacc, b=b, bsl=bsl):
                d = jax.lax.dot_general(
                    _cat_chunk(b_v, b, r0), c_v[pl.ds(r0, CH), bsl],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                return wacc + d

            dw_o[u, b] += _chunk_loop(
                chunk, jnp.zeros((KCAT, 128), jnp.float32)
            )

    def dbias(li, et_ref):
        parts = []
        for b in range(N_BLOCKS):
            bsl = slice(b * 128, (b + 1) * 128)

            def chunk(r0, sb, bsl=bsl):
                return sb + jnp.sum(
                    c_v[pl.ds(r0, CH), bsl].astype(jnp.float32)
                    * rowm32(r0),
                    axis=0, keepdims=True,
                )

            parts.append(
                _chunk_loop(chunk, jnp.zeros((1, 128), jnp.float32))
            )
        dgb_o[li, 2:3, :] += dot(
            jnp.concatenate(parts, axis=1), et_ref[...]
        )

    def contrib(lp, u_adj, dbuf, init):
        """Adjoint-conv contribution to d(BNout_lp): e = leaky' * rowm *
        (cat(d_v) @ WA[u_adj]); accumulate S1/S2 (= dbeta/dgamma) and
        init/add the HBM buffer.  a_v must hold r_lp."""
        a, cc, mu, inv = _bn_consts(
            sums_ref, pp_ref, e9_ref, lp, count, eps
        )
        mu_l = _lane(mu, e9_ref)
        inv_l = _lane(inv, e9_ref)
        s1_parts, s2_parts = [], []
        for b in range(N_BLOCKS):
            bsl = slice(b * 128, (b + 1) * 128)

            def chunk(r0, carry, b=b, bsl=bsl):
                s1b, s2b = carry
                ec = dot(
                    _cat_chunk(d_v, b, r0), wa_ref[u_adj, b].astype(dtype)
                )
                x32 = a_v[pl.ds(r0, CH), bsl].astype(jnp.float32)
                bn = x32 * a[:, bsl] + cc[:, bsl]
                fac = jnp.where(bn > 0, 1.0, leaky) * rowm32(r0)
                eb = (ec * fac).astype(dtype)
                if init:
                    s_v[...] = eb
                    copy(s_v, dbuf.at[g, pl.ds(r0, CH), bsl])
                else:
                    copy(dbuf.at[g, pl.ds(r0, CH), bsl], s_v)
                    s_v[...] += eb
                    copy(s_v, dbuf.at[g, pl.ds(r0, CH), bsl])
                e32 = eb.astype(jnp.float32)
                s1b = s1b + jnp.sum(e32, axis=0, keepdims=True)
                xh = (x32 - mu_l[:, bsl]) * inv_l[:, bsl]
                s2b = s2b + jnp.sum(e32 * xh, axis=0, keepdims=True)
                return s1b, s2b

            zero = jnp.zeros((1, 128), jnp.float32)
            s1b, s2b = _chunk_loop(chunk, (zero, zero))
            s1_parts.append(s1b)
            s2_parts.append(s2b)
        e9t = e9t_ref[...]
        dgb_o[lp, 0:1, :] += dot(jnp.concatenate(s1_parts, axis=1), e9t)
        dgb_o[lp, 1:2, :] += dot(jnp.concatenate(s2_parts, axis=1), e9t)

    for li in (5, 4, 3, 2, 1, 0):

        @pl.when(sidx == 5 - li)
        def _stage(li=li):
            # --- obtain d(r_li) in c_v -------------------------------
            if li == 5:
                copy(dz5.at[g], c_v)
            else:
                copy(dbufs[li].at[g], c_v)
                copy(rbufs[li].at[g], a_v)
                finalize_dr(li)
            dbias(li, e1t_ref if li == 5 else e9t_ref)
            # --- halo-fill for the adjoint conv ----------------------
            halo(p1_ref if li == 5 else p9_ref)
            # --- per-consumed-source: wgrad + adjoint contribution ---
            if li == 5:
                copy(rbufs[4].at[g], a_v)
                norm_to_zh(4)
                wgrad(8)
                contrib(4, 8, dB4, init=True)
            elif li == 4:
                for s in range(4):
                    copy(rbufs[s].at[g], a_v)
                    norm_to_zh(s)
                    wgrad(4 + s)
                    contrib(s, 4 + s, dbufs[s], init=True)
            elif li >= 1:
                copy(rbufs[li - 1].at[g], a_v)
                norm_to_zh(li - 1)
                wgrad(li)
                contrib(li - 1, li, dbufs[li - 1], init=False)
            else:
                copy(x_hbm.at[g], b_v)  # zh of layer 0 IS the packed x
                wgrad(0)
                # dx = adjoint conv of d(r_0), canonical layout
                _zero_margins(a_v)
                for b in range(N_BLOCKS):
                    bsl = slice(b * 128, (b + 1) * 128)

                    def chunk(r0, carry, b=b, bsl=bsl):
                        a_v[pl.ds(r0, CH), bsl] = dot(
                            _cat_chunk(d_v, b, r0),
                            wa_ref[0, b].astype(dtype),
                        ).astype(dtype)
                        return carry

                    _chunk_loop(chunk)
                copy(a_v, dx_hbm.at[g])


@functools.partial(
    jax.jit, static_argnames=("ng", "count", "leaky", "eps", "interpret")
)
def _bwd_call(xp, rs, dz5, wbands, wabands, p9, p1, e9, e1, e9t, e1t,
              rowm, pp, sums, ng, count, leaky, eps, interpret):
    dtype = xp.dtype
    slab = jax.ShapeDtypeStruct((ng, RB, LANES), dtype)
    kernel = functools.partial(
        _bwd_kernel, ng=ng, count=count, leaky=leaky, eps=eps
    )
    vm = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)

    def const(a):
        return vm(a.shape, lambda l, g, _s=a.shape: (0,) * len(_s))

    return pl.pallas_call(
        kernel,
        grid=(6, ng),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 7
        + [const(a) for a in (wbands, wabands, p9, p1, e9, e1, e9t,
                              e1t, rowm, pp, sums)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6
        + [vm((N_UNITS, N_BLOCKS, KCAT, 128), lambda l, g: (0, 0, 0, 0)),
           vm((6, 8, CPAD), lambda l, g: (0, 0, 0))],
        out_shape=[slab] * 6
        + [jax.ShapeDtypeStruct(
               (N_UNITS, N_BLOCKS, KCAT, 128), jnp.float32),
           jax.ShapeDtypeStruct((6, 8, CPAD), jnp.float32)],
        scratch_shapes=[
            pltpu.VMEM((RB, LANES), dtype),
            pltpu.VMEM((RB, LANES), dtype),
            pltpu.VMEM((RB, LANES), dtype),
            pltpu.VMEM((RB, LANES), dtype),
            pltpu.VMEM((CH, 128), dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=128 * 1024 * 1024
        ),
        interpret=interpret,
    )(xp, *rs, dz5, wbands, wabands, p9, p1, e9, e1, e9t, e1t, rowm,
      pp, sums)


# ------------------------------------------------------------- wrapper
def merger_stack(
    x, kernels, biases, gammas, betas, *,
    leaky: float = 0.2, eps: float = 1e-5, interpret: bool = False,
):
    """The six-layer merger conv stack, training mode, differentiable.

    x: [N, 32, 32, 32, 9] with N % 16 == 0.  kernels/biases: the six
    canonical Conv3d parameters; gammas/betas: BatchNorm scale/bias for
    layers 0..4 (layer 5's BatchNorm is applied by the caller in XLA
    from raw5's batch statistics).  Returns (raw5 [N, 32, 32, 32, 1],
    means (6-tuple), vars (6-tuple)); means/vars are for the
    running-average update ONLY and must be stop-gradient'ed by the
    caller.
    """
    n = x.shape[0]
    assert n % V16 == 0, n
    ng = n // V16
    count = float(n * D * H * W)
    dtype = x.dtype
    cs = _np_consts()
    p9 = jnp.asarray(cs["P9"], dtype)
    p1 = jnp.asarray(cs["P1"], dtype)
    e9 = jnp.asarray(cs["E9"])
    e1 = jnp.asarray(cs["E1"])
    e9t, e1t = e9.T.copy(), e1.T.copy()
    rowm = jnp.asarray(cs["rowm"])
    cos = [9, 9, 9, 9, 9, 1]

    def build_pp(gs, bts, bs):
        rows = []
        for l in range(6):
            gl = gs[l] if l < 5 else jnp.ones((1,), jnp.float32)
            bl = bts[l] if l < 5 else jnp.zeros((1,), jnp.float32)
            rows.append(
                jnp.concatenate(
                    [_pad_c(gl), _pad_c(bl), _pad_c(bs[l]),
                     jnp.zeros((5, CPAD), jnp.float32)],
                    axis=0,
                )
            )
        return jnp.stack(rows, 0)

    def _forward(x, ks, bs, gs, bts):
        xp = pack_slab(x)
        units = _unit_kernels(ks)
        wb = jnp.stack(
            [build_band_weights(u.astype(jnp.float32)) for u in units]
        ).astype(dtype)
        pp = build_pp(gs, bts, bs)
        outs = _fwd_call(
            xp, wb, p9, e9, e1, e9t, e1t, rowm, pp,
            ng, count, leaky, eps, interpret,
        )
        rs, sums = outs[:6], outs[6]
        means = tuple(
            sums[l, 0, : cos[l]] * (1.0 / count) for l in range(6)
        )
        vars_ = tuple(
            sums[l, 1, : cos[l]] * (1.0 / count) - means[l] ** 2
            for l in range(6)
        )
        raw5 = unpack_slab(rs[5], 1, n)
        return (raw5, means, vars_), (xp, tuple(rs[:5]), sums)

    @jax.custom_vjp
    def run(x, ks, bs, gs, bts):
        return _forward(x, ks, bs, gs, bts)[0]

    def run_fwd(x, ks, bs, gs, bts):
        out, res = _forward(x, ks, bs, gs, bts)
        return out, (res, ks, gs, bts)

    def run_bwd(saved, ct):
        (xp, rs, sums), ks, gs, bts = saved
        d_raw5 = ct[0]  # means/vars are stop-gradient'ed by the caller
        dz5 = pack_out(d_raw5.astype(dtype))
        units = _unit_kernels(ks)
        units32 = [u.astype(jnp.float32) for u in units]
        wb = jnp.stack(
            [build_band_weights(u) for u in units32]
        ).astype(dtype)
        wab = jnp.stack(
            [build_band_weights(adjoint_kernel(u)) for u in units32]
        ).astype(dtype)
        pp = build_pp(
            gs, bts, [jnp.zeros((cos[l],), jnp.float32) for l in range(6)]
        )
        outs = _bwd_call(
            xp, rs, dz5, wb, wab, p9, p1, e9, e1, e9t, e1t, rowm, pp,
            sums, ng, count, leaky, eps, interpret,
        )
        dx_slab, dw_bands, dgb = outs[0], outs[6], outs[7]
        dx = unpack_slab(dx_slab, 9, n).astype(x.dtype)
        dks_u = []
        for u, u32 in enumerate(units32):
            _, vjp = jax.vjp(build_band_weights, u32)
            (dk,) = vjp(dw_bands[u])
            dks_u.append(dk)
        dks = (
            dks_u[0], dks_u[1], dks_u[2], dks_u[3],
            jnp.concatenate(dks_u[4:8], axis=3), dks_u[8],
        )
        dks = tuple(d.astype(k.dtype) for d, k in zip(dks, ks))
        dbs = tuple(
            dgb[l, 2, : cos[l]].astype(bs_l.dtype)
            for l, bs_l in enumerate(bs)
        )
        dgs = tuple(
            dgb[l, 1, :9].astype(gs[l].dtype) for l in range(5)
        )
        dbts = tuple(
            dgb[l, 0, :9].astype(bts[l].dtype) for l in range(5)
        )
        return dx, dks, dbs, dgs, dbts

    run.defvjp(run_fwd, run_bwd)
    bs = tuple(biases)
    return run(x, tuple(kernels), bs, tuple(gammas), tuple(betas))


# ----------------------------------------------------------- reference
def merger_stack_reference(
    x, kernels, biases, gammas, betas, *, leaky=0.2, eps=1e-5
):
    """Pure-XLA mirror of merger_stack for parity tests (f32)."""

    def conv(x5, k, b):
        dn = jax.lax.conv_dimension_numbers(
            x5.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        return jax.lax.conv_general_dilated(
            x5, k.astype(x5.dtype), (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)), dimension_numbers=dn,
        ) + b.astype(x5.dtype)

    acts, means, vars_ = [], [], []
    y = x
    for l in range(6):
        inp = (
            x if l == 0
            else (jnp.concatenate(acts, -1) if l == 4 else acts[-1])
        )
        r = conv(inp, kernels[l], biases[l])
        r32 = r.astype(jnp.float32)
        m = jnp.mean(r32, axis=(0, 1, 2, 3))
        v = jnp.mean(r32 * r32, axis=(0, 1, 2, 3)) - m * m
        means.append(m)
        vars_.append(v)
        if l < 5:
            z = (r32 - m) * jax.lax.rsqrt(v + eps) * gammas[l] + betas[l]
            z = jnp.where(z > 0, z, z * leaky)
            acts.append(z.astype(x.dtype))
        else:
            y = r
    return y, tuple(means), tuple(vars_)
