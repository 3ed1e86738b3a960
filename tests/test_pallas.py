"""Pallas kernel coverage on CPU via interpret mode.

Real-hardware parity and performance are exercised separately on the TPU;
these tests keep the kernel code paths (block sizing, mask indexing, head
loops, padding) under CI on any host.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from swinvox_tpu.models.swin import shifted_window_mask
from swinvox_tpu.ops.pallas_fused_msa import (
    _reference_fused_msa,
    fused_window_msa,
)
from swinvox_tpu.ops.pallas_window_attention import window_attention_pallas
from swinvox_tpu.ops.window_attention import window_attention_xla


@pytest.mark.parametrize("masked", [False, True])
def test_core_kernel_interpret_parity(rng, masked):
    nw, heads, t, d, nwpi = 8, 3, 49, 32, 4
    q = jnp.asarray(rng.standard_normal((nw, heads, t, d), np.float32))
    k = jnp.asarray(rng.standard_normal((nw, heads, t, d), np.float32))
    v = jnp.asarray(rng.standard_normal((nw, heads, t, d), np.float32))
    bias = jnp.asarray(rng.standard_normal((heads, t, t), np.float32))
    mask = jnp.asarray(shifted_window_mask(14, 14, 7, 3)) if masked else None
    got = window_attention_pallas(q, k, v, bias, mask, interpret=True)
    ref = window_attention_xla(q, k, v, bias, mask)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("c,heads,nwpi", [(96, 3, 4), (192, 6, 1)])
def test_fused_kernel_interpret_parity(rng, c, heads, nwpi):
    t, nw = 49, 8
    x = jnp.asarray(rng.standard_normal((nw, t, c), np.float32) * 0.5)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c), np.float32) * 0.05)
    bqkv = jnp.asarray(rng.standard_normal((3 * c,), np.float32) * 0.01)
    wproj = jnp.asarray(rng.standard_normal((c, c), np.float32) * 0.05)
    bproj = jnp.asarray(rng.standard_normal((c,), np.float32) * 0.01)
    bias = jnp.asarray(rng.standard_normal((heads, t, t), np.float32))
    g = int(np.sqrt(nwpi)) * 7
    mask = jnp.asarray(shifted_window_mask(g, g, 7, 3)) if nwpi > 1 else None
    got = fused_window_msa(
        x, wqkv, bqkv, wproj, bproj, bias, mask, heads, interpret=True
    )
    ref = _reference_fused_msa(
        x, wqkv, bqkv, wproj, bproj, bias, mask, heads, (c // heads) ** -0.5
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=5e-4, atol=5e-5
    )


def test_fused_kernel_grad_interpret(rng):
    c, heads, t, nw = 96, 3, 49, 8
    x = jnp.asarray(rng.standard_normal((nw, t, c), np.float32) * 0.5)
    wqkv = jnp.asarray(rng.standard_normal((c, 3 * c), np.float32) * 0.05)
    bqkv = jnp.zeros((3 * c,), jnp.float32)
    wproj = jnp.asarray(rng.standard_normal((c, c), np.float32) * 0.05)
    bproj = jnp.zeros((c,), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((heads, t, t), np.float32))

    def lp(a):
        return (fused_window_msa(*a, bias, None, heads, interpret=True) ** 2).sum()

    def lr(a):
        return (
            _reference_fused_msa(*a, bias, None, heads, (c // heads) ** -0.5) ** 2
        ).sum()

    gp = jax.grad(lp)((x, wqkv, bqkv, wproj, bproj))
    gr = jax.grad(lr)((x, wqkv, bqkv, wproj, bproj))
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3, atol=1e-4)
