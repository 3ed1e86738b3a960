"""Single-channel-input conv3d with a tap-unrolled custom backward.

The refiner's first layer (reference models/refiner.py:21-26:
Conv3d(1->32, k4, p2)) backward is XLA's worst case on TPU: the input
gradient is a convolution onto ONE output channel (1 of 128 lanes) and
costs 8.8 ms at batch 64 (34 GB/s effective, v5e trace).  This op keeps
XLA's forward (which is fine) and replaces the backward with
reshaped-matmul formulations that keep the lane dimension wide:

  * weight grad: materialize the 4^3-tap patch stack of the 1-channel
    input ONCE ([B, 33^3, 64] — im2col is cheap precisely because the
    input has one channel) and contract it against dout in a single
    [B*33^3]-deep MXU dot.  The round-2 lax.scan-chunked variant of the
    same math lowered to per-chunk layout churn and LOST (153.7 ->
    298.6 ms full step); the flat build is one fused 64-read/1-write
    pass (~0.6 GB at batch 128) followed by one dot — measured 8.8 ->
    ~2 ms for the wgrad at batch 128;
  * input grad: XLA's own transposed conv — already fast for this
    direction (the 1-lane output tensor is small).

The weight grad is algebraically identical to the conv adjoint (pure
reassociation); parity is pinned in tests/test_pallas.py.  Pure XLA —
no Pallas, so no fusion barriers; works on every backend.
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

    # ---- weight gradient: ONE flat patch stack + ONE deep dot ---------
    xp = jnp.pad(x[..., 0], ((0, 0),) + ((2, 2),) * 3)  # [B, S+4]^3
    patches = jnp.stack(
        [
            xp[:, td : td + so, th : th + so, tw : tw + so]
            for (td, th, tw) in taps
        ],
        axis=-1,
    )  # [B, so, so, so, k^3]
    dk_flat = jax.lax.dot_general(
        patches.reshape(-1, k * k * k), dout.reshape(-1, c),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
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
