"""Window-major relayout between Swin blocks in ONE HBM pass.

Between two chained Swin blocks the XLA path round-trips the activations
through image layout: window_unpartition -> jnp.roll -> window_partition
(models/swin.py).  Those are 2-3 HBM copy passes per block boundary, and
the trace attribution puts the (un)partition + roll permutations at ~27%
of the swin backbone's step time (PERFORMANCE.md) — pure data movement.

This op performs the composed permutation directly on window-major
tokens: ``rewindow(x, sign=-1)`` maps windows of the image to windows of
the image cyclically rolled by ``-shift`` (what an SW-MSA block wants),
``sign=+1`` is the exact inverse.  One Pallas kernel, one read + one
write of the activations:

  * the grid walks images; each step holds one image's window grid
    [nWh, nWw, T, C] in VMEM;
  * the 4 source quadrants of every output window come from the window
    itself and its (i+1, j+1) — or (i-1, j-1) for sign=+1 — neighbors,
    materialized by cyclic leading-dim slices (free: no sublane/lane
    movement);
  * the token-level gather is four 0/1 selection-matrix matmuls
    S_q [T, T] @ X_q [T, C] batched over windows — tokens live on the
    sublane axis where Mosaic cannot slice/rotate at arbitrary offsets,
    but a permutation MATMUL rides the MXU for ~free (the same trick as
    the merger stack's halo fill, ops/pallas_merger_stack.py).

The adjoint of a permutation is its inverse, so the custom VJP is just
``rewindow(dout, -sign)`` — both directions stay one pass in training.

Reference semantics: the cyclic shift of timm's shifted-window attention
(consumed by the reference at models/swin_transformer.py:19-24); parity
with unpartition->roll->partition is pinned in tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@functools.lru_cache(maxsize=None)
def _s_matrices(
    window: int, shift: int, sign: int, t_store: int = 0
) -> np.ndarray:
    """[2, 2, T, T] 0/1 selection matrices: quadrant (qr, qc) -> S with
    S[t_out, t_in] = 1 iff output token t_out reads t_in of that source
    window (qr/qc: 0 = same window, 1 = the roll-direction neighbor).

    t_store > window**2 sizes S for PADDED token storage (the fused swin
    kernels keep tokens padded to a sublane multiple): pad rows/columns
    are zero, so rewindow also zero-fills the pad rows of its output —
    whatever finite values the previous kernel left there."""
    w, s = window, shift
    t = t_store or w * w
    S = np.zeros((2, 2, t, t), np.float32)
    for r in range(w):
        rr = r + s if sign < 0 else r - s
        qr, r_in = (1, rr % w) if (rr >= w or rr < 0) else (0, rr)
        for c in range(w):
            cc = c + s if sign < 0 else c - s
            qc, c_in = (1, cc % w) if (cc >= w or cc < 0) else (0, cc)
            S[qr, qc, r * w + c, r_in * w + c_in] = 1.0
    return S


def _rewindow_kernel(
    x_ref, s00_ref, s01_ref, s10_ref, s11_ref, o_ref, *, plus_neighbor: bool
):
    nwh, nww, t, c = x_ref.shape
    x = x_ref[:]

    def nbr(a, axis):
        """Cyclic leading-dim shift: a[..., k, ...] -> a[..., (k±1)%n, ...]."""
        n = a.shape[axis]
        if n == 1:
            return a
        if plus_neighbor:
            lo = jax.lax.slice_in_dim(a, 1, n, axis=axis)
            hi = jax.lax.slice_in_dim(a, 0, 1, axis=axis)
        else:
            lo = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
            hi = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
        return jax.lax.concatenate([lo, hi], dimension=axis)

    xj = nbr(x, 1)
    xi = nbr(x, 0)
    xij = nbr(xi, 1)

    n = nwh * nww
    acc = None
    for s_ref, xq in ((s00_ref, x), (s01_ref, xj), (s10_ref, xi), (s11_ref, xij)):
        term = jax.lax.dot_general(
            jnp.broadcast_to(s_ref[:][None], (n, t, t)),
            xq.reshape(n, t, c),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        acc = term if acc is None else acc + term
    o_ref[:] = acc.reshape(nwh, nww, t, c).astype(o_ref.dtype)


@functools.lru_cache(maxsize=None)
def _make_rewindow(
    nwh: int,
    nww: int,
    window: int,
    shift: int,
    sign: int,
    interpret: bool,
    t_store: int = 0,
):
    S = _s_matrices(window, shift, sign, t_store)
    kernel = functools.partial(_rewindow_kernel, plus_neighbor=sign < 0)

    def impl(x):
        nw_total, t, c = x.shape
        b = nw_total // (nwh * nww)
        x4 = x.reshape(b * nwh, nww, t, c)
        smats = [jnp.asarray(S[i, j], x.dtype) for i in (0, 1) for j in (0, 1)]
        blk = pl.BlockSpec(
            (nwh, nww, t, c), lambda g: (g, 0, 0, 0), memory_space=pltpu.VMEM
        )
        const = pl.BlockSpec((t, t), lambda g: (0, 0), memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            kernel,
            grid=(b,),
            in_specs=[blk, const, const, const, const],
            out_specs=blk,
            out_shape=jax.ShapeDtypeStruct(x4.shape, x.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(x4, *smats)
        return out.reshape(nw_total, t, c)

    @jax.custom_vjp
    def run(x):
        return impl(x)

    def run_fwd(x):
        return impl(x), None

    def run_bwd(_, dout):
        # the cotangent has the primal's dtype; the adjoint of a
        # permutation is its inverse permutation
        inv = _make_rewindow(
            nwh, nww, window, shift, -sign, interpret, t_store
        )
        return (inv(dout),)

    run.defvjp(run_fwd, run_bwd)
    return run


def rewindow(
    x: jax.Array,
    nwh: int,
    nww: int,
    window: int,
    shift: int,
    sign: int,
    interpret: bool = False,
) -> jax.Array:
    """Permute window-major tokens between window layouts in one pass.

    x: [B * nwh * nww, T, C] window-major tokens; T = window**2, or the
    fused kernels' padded token count (pad rows are zero-filled on
    output).  sign=-1: aligned -> shifted layout, i.e. equals
      window_partition(roll(window_unpartition(x), (-shift, -shift)))
    on the logical tokens; sign=+1 is the inverse.
    Differentiable (the VJP is the inverse rewindow). TPU or interpret.
    """
    assert sign in (-1, 1)
    assert 0 < shift < window
    t = x.shape[1]
    t_store = 0 if t == window * window else t
    assert t >= window * window
    return _make_rewindow(
        nwh, nww, window, shift, sign, interpret, t_store
    )(x)
