"""Merger convs as dense-lane 2D band convs — the XLA training path.

Problem: the merger's Conv3d(9ch) stack runs at 35-70 GB/s in XLA because
9-channel NDHWC convs pad lanes 9 -> 128 (~14x memory inflation); it costs
~35 ms of a 154 ms batch-64 train step (PERFORMANCE.md).

Reformulation (same trick as the Pallas inference kernel,
ops/pallas_merger.py, but expressed IN XLA so autodiff and training-mode
BatchNorm come for free): pack the volume's (w, c) axes into the lane
dimension with a one-slot w-halo — x: [V, D, H, (W+2)*C], a pure
pad+reshape, no transpose — and absorb the kernel's dw taps into a banded
(w_in*ci -> w_out*co) channel matrix built with a constant shift tensor.
Each Conv3d becomes ONE 2D convolution over (d, h) with dense,
MXU-aligned channels (306 -> 288 lanes instead of 9 -> 128 padding).  The
band matrix is ~19% dense, so FLOPs inflate ~11x — but the layer is
bandwidth-bound, not FLOP-bound, and the MXU eats the zeros far faster
than the VPU moves 14x-padded activations.

The band weights are an einsum of the REAL [3,3,3,ci,co] parameters with a
0/1 shift tensor, so gradients flow straight back to the canonical tree
(same {conv1..6, bn1..6} parameters as every other merger path).

Reference semantics: models/merger.py:70-93 (conv/BN/LeakyReLU stack).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

D = H = W = 32
C = 9


@functools.lru_cache(maxsize=None)
def _shift_tensor() -> np.ndarray:
    """S[dw, i, o] = 1 iff halo'd input w-slot i feeds output slot o at
    kernel tap dw (input slot i is w = i - 1; tap dw covers o - 1 + dw)."""
    s = np.zeros((3, W + 2, W), np.float32)
    for dw in range(3):
        for o in range(W):
            s[dw, o + dw, o] = 1.0
    return s


def _band_weights_2d(kernel: jax.Array) -> jax.Array:
    """[3, 3, 3, ci, co] (d, h, w, ci, co) -> [3, 3, (W+2)*ci, W*co],
    spatial taps (dd, dh) with the dw taps folded into the band."""
    ci, co = kernel.shape[3], kernel.shape[4]
    s = jnp.asarray(_shift_tensor(), kernel.dtype)
    w = jnp.einsum("dio,ABdce->ABicoe", s, kernel)
    return w.reshape(3, 3, (W + 2) * ci, W * co)


def pack_wc(x: jax.Array) -> jax.Array:
    """[V, D, H, W, C] -> [V, D, H, (W+2)*C] with a zero w-halo in lanes.
    Pure pad + reshape — no transpose, so XLA fuses it into neighbors."""
    v, d, h, w, c = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1), (0, 0)))
    return x.reshape(v, d, h, (w + 2) * c)


def unpack_wc(y: jax.Array, c: int) -> jax.Array:
    """[V, D, H, W*c] -> [V, D, H, W, c] (pure reshape)."""
    v, d, h, _ = y.shape
    return y.reshape(v, d, h, W, c)


def band2d_conv(x_packed: jax.Array, kernel: jax.Array,
                bias: jax.Array) -> jax.Array:
    """One merger Conv3d on the packed layout.

    x_packed: [V, D, H, (W+2)*ci];  kernel: [3, 3, 3, ci, co] (canonical
    NDHWC tree layout);  returns [V, D, H, W*co]."""
    w2 = _band_weights_2d(kernel.astype(x_packed.dtype))
    dn = jax.lax.conv_dimension_numbers(
        x_packed.shape, w2.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x_packed, w2, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=dn,
    )
    return y + jnp.tile(bias.astype(y.dtype), W)
