"""Single-channel-input conv3d with a tap-unrolled custom backward.

The refiner's first layer (reference models/refiner.py:21-26:
Conv3d(1->32, k4, p2)) backward is XLA's worst case on TPU: the input
gradient is a convolution onto ONE output channel (1 of 128 lanes) and
costs 8.8 ms at batch 64 (34 GB/s effective, v5e trace).  This op keeps
XLA's forward (which is fine) and replaces the backward with
reshaped-matmul formulations that keep the lane dimension wide:

  * weight grad: contract 4^3-tap patch stacks of x (64 lanes) against
    dout (32 lanes) as [cb*33^3, 64]^T @ [cb*33^3, 32] matmuls,
    batch-chunked via lax.scan to bound the patch buffer;
  * input grad: XLA's own transposed conv — already fast for this
    direction (the 1-lane output tensor is small).

The weight grad is algebraically identical to the conv adjoint (pure
reassociation); parity is pinned in tests/test_pallas.py.  Pure XLA —
no Pallas, so no fusion barriers; works on every backend.  NOTE:
measured SLOWER than XLA's kernel-grad conv in the full train step
(153.7 -> 298.6 ms at batch 64, PERFORMANCE.md) — off by default.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _taps(k: int):
    return [
        (td, th, tw)
        for td in range(k)
        for th in range(k)
        for tw in range(k)
    ]


@jax.custom_vjp
def conv3d_1ch(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x [B, S, S, S, 1], kernel [4, 4, 4, 1, C] -> [B, S+1, S+1, S+1, C].

    Equivalent to lax.conv_general_dilated(stride 1, padding 2) — torch
    Conv3d(1, C, kernel_size=4, padding=2) geometry (out = S + 1).
    """
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1, 1), [(2, 2)] * 3, dimension_numbers=dn,
    )


def _fwd(x, kernel):
    return conv3d_1ch(x, kernel), (x, kernel)


def _bwd(res, dout):
    x, kernel = res
    k = kernel.shape[0]
    c = kernel.shape[-1]
    b, s = x.shape[0], x.shape[1]
    so = s + 1  # output spatial size for k=4, p=2
    taps = _taps(k)

    # ---- weight gradient: tap-patch stacks (64 lanes) against dout
    # (32 lanes), one [cb*so^3, 64]^T @ [cb*so^3, C] matmul per batch
    # chunk, scanned to bound the patch buffer to ~40 MB -----------------
    xp = jnp.pad(x[..., 0], ((0, 0),) + ((2, 2),) * 3)  # [B, S+4]^3
    cb = next(cc for cc in (8, 4, 2, 1) if b % cc == 0)
    xp_c = xp.reshape(b // cb, cb, *xp.shape[1:])
    dout_c = dout.reshape(b // cb, cb, *dout.shape[1:])

    def chunk(acc, xs):
        xpc, doc = xs
        patches = jnp.stack(
            [
                xpc[:, td : td + so, th : th + so, tw : tw + so]
                for (td, th, tw) in taps
            ],
            axis=-1,
        )  # [cb, so, so, so, k^3]
        return acc + jnp.einsum(
            "bdhwt,bdhwc->tc", patches, doc,
            preferred_element_type=jnp.float32,
        ), None

    dk_flat, _ = jax.lax.scan(
        chunk, jnp.zeros((k * k * k, c), jnp.float32), (xp_c, dout_c)
    )
    dkernel = dk_flat.reshape(k, k, k, 1, c).astype(kernel.dtype)

    # ---- input gradient: XLA's own transposed conv is already fast for
    # this direction (the 1-lane output is small) ------------------------
    dn = jax.lax.conv_dimension_numbers(
        dout.shape, (k, k, k, c, 1), ("NDHWC", "DHWIO", "NDHWC")
    )
    k_t = jnp.flip(kernel, (0, 1, 2)).swapaxes(3, 4)  # [k,k,k,C,1]
    dx = jax.lax.conv_general_dilated(
        dout, k_t.astype(dout.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=dn,
    )
    return dx.astype(x.dtype), dkernel


conv3d_1ch.defvjp(_fwd, _bwd)
