"""Fused Pallas kernel for the merger's 3D conv stack (inference path).

Why: XLA lowers the merger's 9-channel NDHWC Conv3Ds by padding channels to
128 lanes — a ~14x memory inflation that makes the 17k-parameter merger
cost ~10 ms of a 41.5 ms forward at batch 64 (measured, ROADMAP.md).
This kernel keeps one whole volume's activations in VMEM and reformulates
each conv as a small set of MXU matmuls with GOOD lane utilization:

  * volume layout: rows = a (d, w) grid WITH a one-cell zero halo and
    zero margin rows (pitch 34, rows q0 + gd*34 + gw), lanes = (h, c)
    with a zero h-halo: lane = (h + 1) * 9 + c over h in [-1, 32];
  * a k3^3 conv splits into 9 (dd, dw) taps; each tap is a STATIC SUBLANE
    SLICE of the halo'd buffer (offset (dd-1)*34 + (dw-1)) — no rotate,
    no edge masking, no f32 round trip; out-of-volume reads land in the
    zero halo;
  * the remaining (dh, c_in -> c_out) contraction is a banded matrix:
    output lanes pack (h_out, c_out) for an h-block of 14 rows
    (14 x 9 = 126 lanes -> one 128-lane MXU tile, vs 9 -> 128 padding),
    contracting over (h_in, c_in) = (14 + 2) x 9 = 144 input lanes.
    The band matrices are built OUTSIDE the kernel from the conv kernels
    with a constant shift-tensor einsum, so the kernel is pure matmul;
  * BatchNorm (inference: running stats) folds into per-lane scale/shift
    vectors (conv bias folded into the shift); LeakyReLU on the VPU; halo
    grid rows are re-zeroed by one fused interior-mask multiply.

All six layers (conv1..4 -> concat -> conv5 -> conv6) run in ONE kernel
per volume; the only HBM traffic is the input volume once and the 32^3
weight field out.  The softmax over views and the weighted sum with the
coarse volumes stay in XLA (they couple volumes across the view axis and
are trivially fused by XLA).

Reference semantics: models/merger.py:70-104 (the conv/BN/LeakyReLU stack
and softmax-over-views fusion).  Inference only: training-mode BatchNorm
needs cross-volume batch statistics, so the training path stays in XLA.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

D = H = W = 32
C = 9
G = 34  # (d, w) grid pitch including the one-cell halo
MROWS = G * G  # 1156 grid rows per volume
Q0 = 40  # buffer row of grid cell 0 (margin so every tap slice is >= 0)
BROWS = 1248  # Q0 + MROWS(+pad) + bottom margin, 16-aligned
LANES = (H + 2) * C  # 306 (h + halo, c) data lanes
LANES_PAD = 384  # padded to a 128-lane tile boundary (Mosaic slice rule)
# output h-blocks: two full 14-row blocks (126 -> 128 lanes) + a 4-row tail
BLOCKS = ((0, 14), (14, 14), (28, 4))
TAPS = tuple((dd, dw) for dd in range(3) for dw in range(3))


def _shift_tensor(h_in: int, h_out: int) -> np.ndarray:
    """S[dh, i, o] = 1 iff input h-slot i == output h-slot o + dh.

    With the one-slot halo at the block start, input slot i corresponds to
    h = h0 - 1 + i and output slot o to h = h0 + o, so the conv tap
    dh_actual = i - o - 1 runs over {-1, 0, 1} as dh = i - o in {0, 1, 2}.
    """
    s = np.zeros((3, h_in, h_out), np.float32)
    for dh in range(3):
        for o in range(h_out):
            if o + dh < h_in:
                s[dh, o + dh, o] = 1.0
    return s


_S_FULL = _shift_tensor(16, 14)
_S_TAIL = _shift_tensor(6, 4)
_S_CONV6 = _shift_tensor(34, 32)


def _band_weights(kernel: jax.Array, s: np.ndarray) -> jax.Array:
    """Conv kernel [3, 3, 3, ci, co] -> per-tap band matrices
    [9, h_in * ci, h_out * co] for one output h-block."""
    k = jnp.transpose(kernel, (0, 2, 1, 3, 4))  # [dd, dw, dh, ci, co]
    k = k.reshape(9, 3, kernel.shape[3], kernel.shape[4])
    w = jnp.einsum("dio,tdce->ticoe", jnp.asarray(s), k)
    h_in, h_out = s.shape[1], s.shape[2]
    return w.reshape(9, h_in * kernel.shape[3], h_out * kernel.shape[4])


def _merger_kernel(
    x_ref,
    w1f_ref, w1t_ref, w2f_ref, w2t_ref, w3f_ref, w3t_ref, w4f_ref, w4t_ref,
    w5f_ref, w5t_ref, w6_ref,
    scales_ref, shifts_ref, bn6_ref,
    o_ref,
    y1, y2, y3, y4, y5, acc0, acc1, acc2,
    *, leaky: float, compute_dtype,
):
    accs_sc = (acc0, acc1, acc2)
    # interior-grid row mask: halo cells (gd or gw in {0, 33}) -> 0
    q = jax.lax.broadcasted_iota(jnp.int32, (MROWS, 1), 0)
    gd, gw = q // G, q % G
    interior = (
        (gd >= 1) & (gd <= D) & (gw >= 1) & (gw <= W)
    ).astype(jnp.float32)

    MPAD = MROWS + 12  # 1168: accumulator rows (16-aligned)

    def tap_rows(src, tap_idx):
        """One sublane-sliced load of the tap's shifted rows, all lanes."""
        dd, dw = TAPS[tap_idx]
        shift = (dd - 1) * G + (dw - 1)
        return src[pl.ds(Q0 + shift, MPAD), :]

    def conv_layer(srcs, get_wf, get_wt, dst, layer_idx):
        # zero the margins the next layer's tap slices read
        dst[0:Q0, :] = jnp.zeros((Q0, LANES_PAD), dst.dtype)
        dst[Q0 + MROWS : BROWS, :] = jnp.zeros(
            (BROWS - Q0 - MROWS, LANES_PAD), dst.dtype
        )
        # per-tap matmuls accumulated IN PLACE into f32 scratch (the
        # canonical Pallas K-loop idiom Mosaic fuses into MXU accumulate;
        # value-level `acc = acc + dot` costs ~5 ms of VPU adds at batch 64)
        for bi in range(len(BLOCKS)):
            accs_sc[bi][:, :] = jnp.zeros((MPAD, 128), jnp.float32)
        for si in range(len(srcs)):
            for t in range(9):
                full = tap_rows(srcs[si], t)  # [MROWS, LANES_PAD] value
                for bi, (h0, hb) in enumerate(BLOCKS):
                    w = (get_wf if hb == 14 else get_wt)(si)
                    accs_sc[bi][:, :] += jax.lax.dot_general(
                        full[:, h0 * C : h0 * C + ((hb + 2) * C if hb == 14 else 64)],
                        w[t].astype(compute_dtype),
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
        accs = [
            accs_sc[bi][0:MROWS, :][:, 0 : hb * C]
            for bi, (h0, hb) in enumerate(BLOCKS)
        ]
        # one full-lane store per layer: h-halo zeros + the three blocks
        # (lane-sliced ref accesses must be 128-aligned; value ops are free)
        scale_row = scales_ref[layer_idx, :].astype(jnp.float32)
        shift_row = shifts_ref[layer_idx, :].astype(jnp.float32)
        parts = [jnp.zeros((MROWS, C), jnp.float32)]
        for bi, (h0, hb) in enumerate(BLOCKS):
            lo = (h0 + 1) * C
            scale = scale_row[lo : lo + hb * C]
            shift = shift_row[lo : lo + hb * C]
            parts.append(accs[bi] * scale[None, :] + shift[None, :])
        parts.append(jnp.zeros((MROWS, C + LANES_PAD - LANES), jnp.float32))
        y = jnp.concatenate(parts, axis=1)  # [MROWS, LANES_PAD]
        y = jnp.where(y >= 0, y, leaky * y) * interior
        dst[pl.ds(Q0, MROWS), :] = y.astype(dst.dtype)

    def single(ref):
        return lambda si: ref

    x = x_ref.at[0]
    conv_layer([x], single(w1f_ref), single(w1t_ref), y1, 0)
    conv_layer([y1], single(w2f_ref), single(w2t_ref), y2, 1)
    conv_layer([y2], single(w3f_ref), single(w3t_ref), y3, 2)
    conv_layer([y3], single(w4f_ref), single(w4t_ref), y4, 3)
    # conv5 contracts over the concat of the four intermediates: four
    # source buffers, each with its own 9-channel slice of the 36->9 kernel
    conv_layer(
        [y1, y2, y3, y4],
        lambda si: w5f_ref.at[si],
        lambda si: w5t_ref.at[si],
        y5,
        4,
    )

    # conv6 (9 -> 1): output lanes are the 32 h positions directly; one
    # matmul over the tap-concatenated full-height windows
    accs_sc[0][:, :] = jnp.zeros((MPAD, 128), jnp.float32)
    for t in range(9):
        full = tap_rows(y5, t)
        accs_sc[0][:, :] += jax.lax.dot_general(
            full[:, 0:320],
            w6_ref[t].astype(compute_dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = accs_sc[0][0:MROWS, :][:, 0:H]
    y = acc * bn6_ref[0, 0] + bn6_ref[0, 1]
    y = jnp.where(y >= 0, y, leaky * y) * interior
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("leaky", "interpret"))
def _merger_weights_impl(x_p, w_blocks, scales, shifts, bn6, leaky, interpret):
    n_vol = x_p.shape[0]
    compute_dtype = x_p.dtype

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM
        )

    in_specs = [
        pl.BlockSpec((1, BROWS, LANES_PAD), lambda j: (j, 0, 0),
                     memory_space=pltpu.VMEM)
    ]
    in_specs += [const(w.shape) for w in w_blocks]
    in_specs += [
        const(scales.shape),
        const(shifts.shape),
        pl.BlockSpec((1, 2), lambda j: (0, 0), memory_space=pltpu.SMEM),
    ]

    kernel = functools.partial(
        _merger_kernel, leaky=leaky, compute_dtype=compute_dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(n_vol,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, MROWS, H), lambda j: (j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_vol, MROWS, H), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((BROWS, LANES_PAD), compute_dtype) for _ in range(5)
        ]
        + [pltpu.VMEM((MROWS + 12, 128), jnp.float32) for _ in range(3)],
        # weights + five volume-sized scratches exceed the default 16M
        # scoped-vmem budget
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(x_p, *w_blocks, scales, shifts, bn6)


def _fold_bn(scale, bias, mean, var, conv_bias, eps=1e-5):
    """BN(z + conv_bias) = z * s + t with s = scale/sqrt(var+eps)."""
    s = scale / jnp.sqrt(var + eps)
    t = (conv_bias - mean) * s + bias
    return s, t


def _lane_vec(per_channel: jax.Array) -> jax.Array:
    """Tile a per-channel [9] vector over interior (h, c) lanes; zero halo."""
    v = jnp.tile(per_channel, H)  # [288]
    zeros = jnp.zeros((C,), v.dtype)
    return jnp.concatenate([zeros, v, zeros])  # [306]


def merger_view_weights(
    x: jax.Array,
    conv_kernels: Sequence[jax.Array],
    conv_biases: Sequence[jax.Array],
    bn_params: Sequence,
    leaky: float = 0.2,
    interpret: bool = False,
) -> jax.Array:
    """Per-voxel view-weight logits for the merger (inference).

    x: [V, 32, 32, 32, 9] raw decoder features (V = batch * views).
    conv_kernels/conv_biases: the six Conv3d parameters in order
    (kernels [3,3,3,ci,co]); bn_params: six (scale, bias, mean, var).
    Returns [V, 32, 32, 32] float32 — the pre-softmax weight field
    (reference models/merger.py:70-93).
    """
    v = x.shape[0]
    dtype = x.dtype
    # rows: (d, w) grid with halo (pitch 34) + margins; lanes: (h+halo, c)
    x_h = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0), (0, 0)))  # h halo
    x_h = jnp.transpose(x_h, (0, 1, 3, 2, 4)).reshape(v, D, W, LANES)
    x_g = jnp.pad(x_h, ((0, 0), (1, 1), (1, 1), (0, 0)))  # d/w halo
    x_p = x_g.reshape(v, MROWS, LANES)
    x_p = jnp.pad(
        x_p,
        ((0, 0), (Q0, BROWS - Q0 - MROWS), (0, LANES_PAD - LANES)),
    )

    def pad_n(w, k_pad=None):
        # [9, K, N] -> [9, K_pad, 128]: sublane-aligned weight reads and
        # lane-aligned accumulator stores; padded rows/cols are zero
        w = jnp.pad(w, ((0, 0), (0, 0), (0, 128 - w.shape[2])))
        if k_pad is not None and k_pad > w.shape[1]:
            w = jnp.pad(w, ((0, 0), (0, k_pad - w.shape[1]), (0, 0)))
        return w

    w_blocks = []
    for i in range(4):
        k = conv_kernels[i].astype(dtype)
        w_blocks += [
            pad_n(_band_weights(k, _S_FULL)).astype(dtype),
            pad_n(_band_weights(k, _S_TAIL), 64).astype(dtype),
        ]
    k5 = conv_kernels[4].astype(dtype)  # [3,3,3,36,9]
    w5f = jnp.stack(
        [pad_n(_band_weights(k5[:, :, :, 9 * i : 9 * i + 9], _S_FULL))
         for i in range(4)]
    ).astype(dtype)
    w5t = jnp.stack(
        [pad_n(_band_weights(k5[:, :, :, 9 * i : 9 * i + 9], _S_TAIL), 64)
         for i in range(4)]
    ).astype(dtype)
    w6 = pad_n(_band_weights(conv_kernels[5].astype(dtype), _S_CONV6), 320)
    w_blocks += [w5f, w5t, w6.astype(dtype)]

    scales, shifts = [], []
    for i in range(5):
        s, t = _fold_bn(*bn_params[i], conv_biases[i])
        scales.append(_lane_vec(s.astype(jnp.float32)))
        shifts.append(_lane_vec(t.astype(jnp.float32)))
    scales = jnp.stack(scales)  # [5, 306]
    shifts = jnp.stack(shifts)
    s6, t6 = _fold_bn(*bn_params[5], conv_biases[5])
    bn6 = jnp.stack([s6.reshape(()), t6.reshape(())]).reshape(1, 2).astype(
        jnp.float32
    )

    out = _merger_weights_impl(
        x_p, tuple(w_blocks), scales, shifts, bn6, float(leaky), interpret
    )
    # grid rows are (gd, gw) with halo; lanes are h -> [V, d, h, w]
    out = out.reshape(v, G, G, H)[:, 1 : D + 1, 1 : W + 1]
    return jnp.transpose(out, (0, 1, 3, 2))
