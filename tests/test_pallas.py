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


# ----------------------------------------------------------- fused merger


def _merger_fixture(rng):
    chans = [(9, 9), (9, 9), (9, 9), (9, 9), (36, 9), (9, 1)]
    kernels, biases, bn = [], [], []
    for ci, co in chans:
        kernels.append(
            (rng.standard_normal((3, 3, 3, ci, co)) * 0.2).astype(np.float32)
        )
        biases.append((rng.standard_normal(co) * 0.1).astype(np.float32))
        bn.append(
            (
                (1 + 0.1 * rng.standard_normal(co)).astype(np.float32),
                (0.1 * rng.standard_normal(co)).astype(np.float32),
                (0.1 * rng.standard_normal(co)).astype(np.float32),
                (0.5 + np.abs(rng.standard_normal(co))).astype(np.float32),
            )
        )
    return kernels, biases, bn


def _merger_conv_reference(x, kernels, biases, bn):
    def leaky(y):
        return jnp.where(y >= 0, y, 0.2 * y)

    def bn_inf(y, p):
        s, b, m, v = p
        return (y - m) / jnp.sqrt(v + 1e-5) * s + b

    def conv(y, k, b):
        out = jax.lax.conv_general_dilated(
            y, k, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return out + b

    inter = []
    y = x
    for i in range(4):
        y = leaky(bn_inf(conv(y, kernels[i], biases[i]), bn[i]))
        inter.append(y)
    y = jnp.concatenate(inter, -1)
    y = leaky(bn_inf(conv(y, kernels[4], biases[4]), bn[4]))
    y = leaky(bn_inf(conv(y, kernels[5], biases[5]), bn[5]))
    return y[..., 0]


def test_merger_kernel_interpret_parity(rng):
    """The fused merger conv stack == six XLA Conv3D+BN+LeakyReLU layers."""
    from swinvox_tpu.ops.pallas_merger import merger_view_weights

    kernels, biases, bn = _merger_fixture(rng)
    x = jnp.asarray(
        (rng.standard_normal((2, 32, 32, 32, 9)) * 0.5).astype(np.float32)
    )
    expected = np.asarray(_merger_conv_reference(x, kernels, biases, bn))
    got = np.asarray(
        merger_view_weights(x, kernels, biases, bn, interpret=True)
    )
    # f32 accumulation order differs (banded matmuls vs direct conv)
    np.testing.assert_allclose(got, expected, rtol=3e-3, atol=5e-4)


def test_merger_module_fused_branch_parity(rng):
    """Merger(use_pallas) == Merger() at inference, identical param trees."""
    import jax.tree_util as tu

    from swinvox_tpu.models.merger import Merger

    raw = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32, 9)).astype(np.float32)
    )
    coarse = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32)).astype(np.float32)
    )
    m_xla = Merger(dtype=jnp.float32)
    v = m_xla.init(jax.random.PRNGKey(0), raw, coarse, False)
    # shift the running stats so the BN folding is non-trivial
    v = {
        "params": v["params"],
        "batch_stats": jax.tree.map(lambda x: x + 0.1, v["batch_stats"]),
    }
    out_xla = m_xla.apply(v, raw, coarse, False)

    m_fused = Merger(dtype=jnp.float32, use_pallas=True, pallas_interpret=True)
    v2 = m_fused.init(jax.random.PRNGKey(0), raw, coarse, False)
    assert tu.tree_structure(v2["params"]) == tu.tree_structure(v["params"])
    assert tu.tree_structure(v2["batch_stats"]) == tu.tree_structure(
        v["batch_stats"]
    )
    out_fused = m_fused.apply(v, raw, coarse, False)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_xla), rtol=1e-4, atol=1e-4
    )


def test_merger_fused_training_falls_back_to_xla(rng):
    """train=True must use batch-statistics BN (the XLA path), even with
    use_pallas set — outputs and mutated stats match the plain module."""
    from swinvox_tpu.models.merger import Merger

    raw = jnp.asarray(
        rng.standard_normal((1, 2, 32, 32, 32, 9)).astype(np.float32)
    )
    coarse = jnp.asarray(
        rng.standard_normal((1, 2, 32, 32, 32)).astype(np.float32)
    )
    m_ref = Merger(dtype=jnp.float32)
    m_fused = Merger(dtype=jnp.float32, use_pallas=True, pallas_interpret=True)
    v = m_ref.init(jax.random.PRNGKey(0), raw, coarse, False)
    out_ref, mut_ref = m_ref.apply(
        v, raw, coarse, True, mutable=["batch_stats"]
    )
    out_fused, mut_fused = m_fused.apply(
        v, raw, coarse, True, mutable=["batch_stats"]
    )
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=1e-5, atol=1e-6
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        ),
        mut_fused["batch_stats"],
        mut_ref["batch_stats"],
    )


# ------------------------------------------------------ fused swin block


@pytest.mark.parametrize(
    "shift,dim,heads,hw", [(0, 96, 3, 14), (3, 96, 3, 14), (3, 192, 6, 28)]
)
def test_swin_block_megakernel_parity(rng, shift, dim, heads, hw):
    """The whole-block kernel (LN1+W-MSA+res+LN2+MLP+res) == the XLA
    SwinBlock at inference, with identical parameter trees."""
    import jax.tree_util as tu

    from swinvox_tpu.models.swin import SwinBlock

    x = jnp.asarray(
        (rng.standard_normal((2, hw, hw, dim)) * 0.5).astype(np.float32)
    )
    ref_blk = SwinBlock(
        dim=dim, num_heads=heads, shift=shift, drop_path_rate=0.0,
        dtype=jnp.float32,
    )
    v = ref_blk.init(jax.random.PRNGKey(1), x, True)
    # jitter every param so LN affines and biases are non-trivial
    leaves, treedef = tu.tree_flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = treedef.unflatten(
        [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    )
    out_ref = ref_blk.apply({"params": params}, x, True)

    fused_blk = SwinBlock(
        dim=dim, num_heads=heads, shift=shift, drop_path_rate=0.0,
        dtype=jnp.float32, use_pallas_block=True, pallas_interpret=True,
    )
    v2 = fused_blk.init(jax.random.PRNGKey(1), x, True)
    assert tu.tree_structure(v2["params"]) == tu.tree_structure(v["params"])
    out_fused = fused_blk.apply({"params": params}, x, True)
    np.testing.assert_allclose(
        np.asarray(out_fused), np.asarray(out_ref), rtol=2e-4, atol=2e-4
    )


def test_swin_block_megakernel_training_uses_xla(rng):
    """deterministic=False must take the XLA path (DropPath active, fused
    kernel has no VJP) — outputs match the plain block exactly."""
    from swinvox_tpu.models.swin import SwinBlock

    x = jnp.asarray(
        (rng.standard_normal((1, 14, 14, 96)) * 0.5).astype(np.float32)
    )
    ref_blk = SwinBlock(
        dim=96, num_heads=3, shift=3, drop_path_rate=0.1, dtype=jnp.float32
    )
    fused_blk = SwinBlock(
        dim=96, num_heads=3, shift=3, drop_path_rate=0.1,
        dtype=jnp.float32, use_pallas_block=True, pallas_interpret=True,
    )
    v = ref_blk.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        x, False,
    )
    out_ref = ref_blk.apply(
        v, x, False, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    out_fused = fused_blk.apply(
        v, x, False, rngs={"dropout": jax.random.PRNGKey(3)}
    )
    np.testing.assert_array_equal(np.asarray(out_fused), np.asarray(out_ref))


def test_erf_polynomial_accuracy():
    from swinvox_tpu.ops.pallas_swin_block import _erf

    x = jnp.linspace(-5.0, 5.0, 2001)
    import scipy.special

    # A&S bound is 1.5e-7 in exact arithmetic; f32 rounding adds a bit
    np.testing.assert_allclose(
        np.asarray(_erf(x)), scipy.special.erf(np.asarray(x)), atol=5e-7
    )


@pytest.mark.parametrize(
    "shift,dim,heads,hw,rate",
    [(0, 96, 3, 14, 0.0), (3, 96, 3, 14, 0.0), (3, 192, 6, 28, 0.0),
     (3, 96, 3, 14, 0.5)],
)
def test_swin_block_train_kernel_grad_parity(rng, shift, dim, heads, hw, rate):
    """The differentiable fused block (in-kernel backward) matches the XLA
    SwinBlock in loss, input grad, and EVERY parameter grad — including
    stochastic-depth runs, where both paths draw the same DropPath masks."""
    import jax.tree_util as tu

    from swinvox_tpu.models.swin import SwinBlock

    x = jnp.asarray(
        (rng.standard_normal((2, hw, hw, dim)) * 0.5).astype(np.float32)
    )
    tgt = jnp.asarray(rng.standard_normal((2, hw, hw, dim)).astype(np.float32))

    def make(fused):
        return SwinBlock(
            dim=dim, num_heads=heads, shift=shift, drop_path_rate=rate,
            dtype=jnp.float32, use_pallas_block_train=fused,
            pallas_interpret=fused,
        )

    ref, fus = make(False), make(True)
    v = ref.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(9)},
        x, False,
    )
    leaves, treedef = tu.tree_flatten(v["params"])
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    params = treedef.unflatten(
        [l + 0.05 * jax.random.normal(k, l.shape) for l, k in zip(leaves, keys)]
    )

    def loss(mod):
        def f(p, xx):
            out = mod.apply(
                {"params": p}, xx, False, rngs={"dropout": jax.random.PRNGKey(3)}
            )
            return jnp.sum((out - tgt) ** 2)
        return f

    l_ref, (gp_ref, gx_ref) = jax.value_and_grad(
        loss(ref), argnums=(0, 1)
    )(params, x)
    l_fus, (gp_fus, gx_fus) = jax.value_and_grad(
        loss(fus), argnums=(0, 1)
    )(params, x)

    np.testing.assert_allclose(float(l_fus), float(l_ref), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(gx_fus), np.asarray(gx_ref), rtol=2e-3, atol=2e-3
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(gp_ref)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(gp_fus)[0], key=key_of),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-3, atol=2e-3,
            err_msg=tu.keystr(pth),
        )


# ------------------------------------------------------ banded conv3d


@pytest.mark.parametrize("ci,co", [(9, 9), (36, 9), (9, 1)])
def test_band_conv3d_grad_parity(rng, ci, co):
    """band_conv3d == SAME-padded lax conv in value, input grad, and
    kernel grad (interpret mode)."""
    from swinvox_tpu.ops.pallas_band_conv import band_conv3d

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, ci)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)) * 0.1, jnp.float32
    )
    t = jnp.asarray(rng.standard_normal((2, 32, 32, 32, co)), jnp.float32)

    def ref_conv(x, k):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), "SAME", dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)

    def loss(fn):
        return lambda x, k: jnp.sum((fn(x, k) - t) ** 2)

    l0, (gx0, gk0) = jax.value_and_grad(loss(ref_conv), (0, 1))(x, k)
    l1, (gx1, gk1) = jax.value_and_grad(
        loss(lambda x, k: band_conv3d(x, k, interpret=True)), (0, 1)
    )(x, k)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(gx1), np.asarray(gx0), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gk1), np.asarray(gk0), rtol=1e-4, atol=1e-3
    )


def test_merger_band_train_parity(rng):
    """Merger with the banded training convs == the XLA merger: output,
    BN batch-stats updates, and gradients (conv biases excluded — their
    gradient is cancellation-dominated in BOTH paths: BN directly after
    each conv makes it mathematically ~0; verified against f64 truth the
    band path deviates no more than XLA f32)."""
    import jax.tree_util as tu

    from swinvox_tpu.models.merger import Merger

    raw = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32, 9)), jnp.float32
    )
    coarse = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32)), jnp.float32
    )
    ref = Merger(dtype=jnp.float32)
    band = Merger(
        dtype=jnp.float32, use_pallas_train=True, pallas_interpret=True
    )
    v = ref.init(jax.random.PRNGKey(0), raw, coarse, True)
    assert tu.tree_structure(
        band.init(jax.random.PRNGKey(0), raw, coarse, True)
    ) == tu.tree_structure(v)

    def loss(mod):
        def f(p, raw):
            out, mut = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                raw, coarse, True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2), (out, mut)
        return f

    (l0, (out0, mut0)), g0 = jax.value_and_grad(
        loss(ref), has_aux=True
    )(v["params"], raw)
    (l1, (out1, mut1)), g1 = jax.value_and_grad(
        loss(band), has_aux=True
    )(v["params"], raw)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), rtol=1e-4, atol=1e-5
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(mut0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(mut1)[0], key=key_of),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=tu.keystr(pth),
        )
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(g0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(g1)[0], key=key_of),
    ):
        name = tu.keystr(pth)
        if "Conv_0']['bias" in name:
            continue
        scale = np.abs(np.asarray(a)).max() + 1e-6
        diff = np.abs(np.asarray(b) - np.asarray(a)).max()
        assert diff <= 5e-3 * scale, f"{name}: {diff} vs scale {scale}"


def test_merger_band2d_parity(rng):
    """Merger with the dense-lane 2D band convs (ops/band2d_merger.py,
    pure XLA) == the direct XLA merger: outputs, BN batch-stat updates,
    and gradients, in BOTH train and eval modes."""
    import jax.tree_util as tu

    from swinvox_tpu.models.merger import Merger

    raw = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32, 9)), jnp.float32
    )
    coarse = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32)), jnp.float32
    )
    ref = Merger(dtype=jnp.float32)
    band = Merger(dtype=jnp.float32, use_band2d=True)
    v = ref.init(jax.random.PRNGKey(0), raw, coarse, True)
    assert tu.tree_structure(
        band.init(jax.random.PRNGKey(0), raw, coarse, True)
    ) == tu.tree_structure(v)

    # eval mode (running stats)
    e0 = ref.apply(v, raw, coarse, False)
    e1 = band.apply(v, raw, coarse, False)
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e0), rtol=1e-4, atol=1e-5
    )

    def loss(mod):
        def f(p, raw):
            out, mut = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                raw, coarse, True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2), (out, mut)
        return f

    (l0, (out0, mut0)), g0 = jax.value_and_grad(
        loss(ref), has_aux=True
    )(v["params"], raw)
    (l1, (out1, mut1)), g1 = jax.value_and_grad(
        loss(band), has_aux=True
    )(v["params"], raw)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), rtol=1e-4, atol=1e-5
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(mut0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(mut1)[0], key=key_of),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=tu.keystr(pth),
        )
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(g0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(g1)[0], key=key_of),
    ):
        name = tu.keystr(pth)
        if "Conv_0']['bias" in name:
            # BN right after each conv makes the bias grad ~0 by
            # cancellation; both paths are noise there (see the band
            # train-parity test above)
            continue
        scale = np.abs(np.asarray(a)).max() + 1e-6
        diff = np.abs(np.asarray(b) - np.asarray(a)).max()
        assert diff <= 5e-3 * scale, f"{name}: {diff} vs scale {scale}"


def test_unrolled_conv1ch_grad_parity(rng):
    """conv3d_1ch (tap-unrolled custom backward for the refiner's first
    conv) == plain lax conv in value and both gradients."""
    from swinvox_tpu.ops.unrolled_conv import conv3d_1ch

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, 1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((4, 4, 4, 1, 32)) * 0.1, jnp.float32)
    t = jnp.asarray(rng.standard_normal((2, 33, 33, 33, 32)), jnp.float32)

    def ref(x, k):
        dn = jax.lax.conv_dimension_numbers(
            x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        return jax.lax.conv_general_dilated(
            x, k, (1, 1, 1), [(2, 2)] * 3, dimension_numbers=dn
        )

    def loss(fn):
        return lambda x, k: jnp.sum((fn(x, k) - t) ** 2)

    l0, (gx0, gk0) = jax.value_and_grad(loss(ref), (0, 1))(x, k)
    l1, (gx1, gk1) = jax.value_and_grad(loss(conv3d_1ch), (0, 1))(x, k)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gx1), np.asarray(gx0), rtol=1e-4, atol=1e-4
    )
    # the single [B*33^3]-deep f32 contraction rounds differently from
    # XLA's conv wgrad; bound the error relative to the grad's scale
    gk_scale = float(np.abs(np.asarray(gk0)).max())
    np.testing.assert_allclose(
        np.asarray(gk1), np.asarray(gk0), rtol=1e-4,
        atol=1e-4 * gk_scale,
    )


def test_refiner_unrolled_conv_parity(rng):
    """Refiner with/without the unrolled first conv: identical forward,
    matching gradients, identical param trees."""
    import jax.tree_util as tu

    from swinvox_tpu.models.refiner import Refiner

    vol = jnp.asarray(rng.standard_normal((2, 32, 32, 32)), jnp.float32)
    a = Refiner(dtype=jnp.float32, unrolled_first_conv=False)
    b = Refiner(dtype=jnp.float32, unrolled_first_conv=True)
    v = a.init(jax.random.PRNGKey(0), vol, True)
    assert tu.tree_structure(b.init(jax.random.PRNGKey(0), vol, True)) == (
        tu.tree_structure(v)
    )

    def loss(mod):
        def f(p, vol):
            out, _ = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, vol, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)
        return f

    l0, (gp0, gv0) = jax.value_and_grad(loss(a), (0, 1))(v["params"], vol)
    l1, (gp1, gv1) = jax.value_and_grad(loss(b), (0, 1))(v["params"], vol)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gv1), np.asarray(gv0), rtol=1e-4, atol=1e-4
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, x), (_, y) in zip(
        sorted(tu.tree_flatten_with_path(gp0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(gp1)[0], key=key_of),
    ):
        scale = np.abs(np.asarray(x)).max() + 1e-6
        assert np.abs(np.asarray(y) - np.asarray(x)).max() <= 1e-3 * scale, (
            tu.keystr(pth)
        )


@pytest.mark.parametrize("ci,co", [(9, 9), (36, 9), (9, 1)])
def test_slab_band_conv_parity(rng, ci, co):
    """ops/pallas_slab_conv.py (interpret): forward + input/kernel grads
    of each merger Conv3d shape vs the XLA conv (padding 1, NDHWC)."""
    from swinvox_tpu.ops.pallas_slab_conv import slab_conv3d

    x = jnp.asarray(rng.standard_normal((2, 32, 32, 32, ci)), jnp.float32)
    k = jnp.asarray(
        rng.standard_normal((3, 3, 3, ci, co)) * 0.1, jnp.float32
    )
    ct = jnp.asarray(rng.standard_normal((2, 32, 32, 32, co)), jnp.float32)

    def f_slab(x5, kk):
        return slab_conv3d(x5, kk, interpret=True)

    def f_xla(x5, kk):
        dn = jax.lax.conv_dimension_numbers(
            x5.shape, kk.shape, ("NDHWC", "DHWIO", "NDHWC")
        )
        return jax.lax.conv_general_dilated(
            x5, kk, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=dn,
        )

    y1, y0 = f_slab(x, k), f_xla(x, k)
    np.testing.assert_allclose(
        np.asarray(y1), np.asarray(y0), rtol=1e-4, atol=1e-4
    )
    g1 = jax.grad(
        lambda x5, kk: jnp.sum(f_slab(x5, kk) * ct), argnums=(0, 1)
    )(x, k)
    g0 = jax.grad(
        lambda x5, kk: jnp.sum(f_xla(x5, kk) * ct), argnums=(0, 1)
    )(x, k)
    np.testing.assert_allclose(
        np.asarray(g1[0]), np.asarray(g0[0]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(g1[1]), np.asarray(g0[1]), rtol=1e-4, atol=2e-3
    )


def test_merger_slab_parity(rng):
    """Merger with use_slab (Pallas slab band-convs, interpret) == the
    direct XLA merger: outputs, BN batch-stat updates, and gradients."""
    import jax.tree_util as tu

    from swinvox_tpu.models.merger import Merger

    raw = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32, 9)), jnp.float32
    )
    coarse = jnp.asarray(
        rng.standard_normal((2, 3, 32, 32, 32)), jnp.float32
    )
    ref = Merger(dtype=jnp.float32)
    slab = Merger(dtype=jnp.float32, use_slab=True, pallas_interpret=True)
    v = ref.init(jax.random.PRNGKey(0), raw, coarse, True)
    assert tu.tree_structure(
        slab.init(jax.random.PRNGKey(0), raw, coarse, True)
    ) == tu.tree_structure(v)

    e0 = ref.apply(v, raw, coarse, False)
    e1 = slab.apply(v, raw, coarse, False)
    np.testing.assert_allclose(
        np.asarray(e1), np.asarray(e0), rtol=1e-4, atol=1e-5
    )

    def loss(mod):
        def f(p, raw):
            out, mut = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                raw, coarse, True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2), (out, mut)
        return f

    (l0, (out0, mut0)), g0 = jax.value_and_grad(
        loss(ref), has_aux=True
    )(v["params"], raw)
    (l1, (out1, mut1)), g1 = jax.value_and_grad(
        loss(slab), has_aux=True
    )(v["params"], raw)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), rtol=1e-4, atol=1e-5
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(mut0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(mut1)[0], key=key_of),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-6,
            err_msg=tu.keystr(pth),
        )
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(g0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(g1)[0], key=key_of),
    ):
        name = tu.keystr(pth)
        if "Conv_0']['bias" in name:
            # BN right after each conv makes the bias grad ~0 by
            # cancellation; both paths are noise there
            continue
        scale = np.abs(np.asarray(a)).max() + 1e-6
        diff = np.abs(np.asarray(b) - np.asarray(a)).max()
        assert diff <= 5e-3 * scale, f"{name}: {diff} vs scale {scale}"


def _l2(a):
    a = np.asarray(a, np.float64).ravel()
    return float(np.sqrt((a * a).sum()))


def test_merger_stack_op_parity(rng):
    """ops/pallas_merger_stack.py (interpret): the whole six-layer stack
    in one fwd + one bwd pallas_call vs the XLA reference chain.

    Gradients are compared in L2: LeakyReLU branch flips at |bn| ~ 1e-5
    (from f32 stats-rounding differences between the two pipelines)
    perturb a handful of elements out of millions, which breaks max-norm
    comparison but not a 1% L2 bound (measured: 62 flipped elements of
    4.7M, all with |bn| < 1e-4)."""
    import jax.tree_util as tu

    from swinvox_tpu.ops.pallas_merger_stack import (
        merger_stack,
        merger_stack_reference,
    )

    n = 16
    x = jnp.asarray(rng.standard_normal((n, 32, 32, 32, 9)), jnp.float32)
    ks = tuple(
        jnp.asarray(
            rng.standard_normal((3, 3, 3, ci, co)) * (0.5 / np.sqrt(27 * ci)),
            jnp.float32,
        )
        for ci, co in [(9, 9)] * 4 + [(36, 9), (9, 1)]
    )
    bs = tuple(
        jnp.asarray(rng.standard_normal((co,)) * 0.1, jnp.float32)
        for co in [9] * 5 + [1]
    )
    gs = tuple(
        jnp.asarray(1 + 0.1 * rng.standard_normal((9,)), jnp.float32)
        for _ in range(5)
    )
    bts = tuple(
        jnp.asarray(0.1 * rng.standard_normal((9,)), jnp.float32)
        for _ in range(5)
    )
    ct = jnp.asarray(rng.standard_normal((n, 32, 32, 32, 1)), jnp.float32)

    f_k = lambda *a: merger_stack(*a, interpret=True)  # noqa: E731
    f_r = merger_stack_reference
    rk = jax.jit(f_k)(x, ks, bs, gs, bts)
    rr = jax.jit(f_r)(x, ks, bs, gs, bts)
    np.testing.assert_allclose(
        np.asarray(rk[0]), np.asarray(rr[0]), rtol=1e-4, atol=1e-4
    )
    for l in range(6):
        np.testing.assert_allclose(
            np.asarray(rk[1][l]), np.asarray(rr[1][l]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(rk[2][l]), np.asarray(rr[2][l]), atol=1e-4
        )

    def loss(f):
        def g(*a):
            raw5, _, _ = f(*a)
            return jnp.sum(raw5 * ct)

        return g

    gk = jax.jit(jax.grad(loss(f_k), argnums=(0, 1, 2, 3, 4)))(
        x, ks, bs, gs, bts
    )
    gr = jax.jit(jax.grad(loss(f_r), argnums=(0, 1, 2, 3, 4)))(
        x, ks, bs, gs, bts
    )
    names = ("dx", "dk", "db", "dgamma", "dbeta")
    for name, a, b in zip(names, gk, gr):
        for i, (la, lb) in enumerate(
            zip(tu.tree_leaves(a), tu.tree_leaves(b))
        ):
            if name == "db" and i < 5:
                # BN right after each conv makes the bias grad ~0 by
                # cancellation; both paths are noise there
                continue
            ref = _l2(lb) + 1e-6
            assert _l2(np.asarray(la) - np.asarray(lb)) <= 1e-2 * ref, (
                f"{name}[{i}]"
            )


def test_merger_stack_module_parity(rng):
    """Merger with use_stack (whole-stack megakernel, interpret) == the
    XLA merger: outputs, BN running-stat updates, and gradients (L2,
    see test_merger_stack_op_parity for why not max-norm)."""
    import jax.tree_util as tu

    from swinvox_tpu.models.merger import Merger

    raw = jnp.asarray(
        rng.standard_normal((8, 2, 32, 32, 32, 9)), jnp.float32
    )
    coarse = jnp.asarray(
        rng.standard_normal((8, 2, 32, 32, 32)), jnp.float32
    )
    ref = Merger(dtype=jnp.float32)
    stk = Merger(dtype=jnp.float32, use_stack=True, pallas_interpret=True)
    v = ref.init(jax.random.PRNGKey(0), raw, coarse, True)
    assert tu.tree_structure(
        stk.init(jax.random.PRNGKey(0), raw, coarse, True)
    ) == tu.tree_structure(v)

    def loss(mod):
        def f(p, raw):
            out, mut = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]},
                raw, coarse, True, mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2), (out, mut)

        return f

    (l0, (out0, mut0)), g0 = jax.value_and_grad(
        loss(ref), has_aux=True
    )(v["params"], raw)
    (l1, (out1, mut1)), g1 = jax.value_and_grad(
        loss(stk), has_aux=True
    )(v["params"], raw)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out1), np.asarray(out0), rtol=1e-3, atol=1e-4
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(mut0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(mut1)[0], key=key_of),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-4, atol=1e-5,
            err_msg=tu.keystr(pth),
        )
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(g0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(g1)[0], key=key_of),
    ):
        name = tu.keystr(pth)
        if "Conv_0']['bias" in name:
            continue  # ~0 by BN cancellation on both paths
        ref_n = _l2(b) + 1e-6
        assert _l2(np.asarray(b) - np.asarray(a)) <= 1.5e-2 * ref_n, name


# ------------------------------------------------------ rewindow


@pytest.mark.parametrize("h,w,c", [(56, 56, 96), (14, 14, 40)])
def test_rewindow_parity(rng, h, w, c):
    """ops/rewindow.py (interpret): the one-pass window relayout equals
    window_partition(roll(window_unpartition(x))) in both directions, its
    VJP is the inverse permutation, and it is bit-exact (a permutation)."""
    from swinvox_tpu.models.swin import window_partition, window_unpartition
    from swinvox_tpu.ops.rewindow import rewindow

    win, s = 7, 3
    nwh, nww = h // win, w // win
    x = jnp.asarray(rng.standard_normal((2, h, w, c)).astype(np.float32))
    xw = window_partition(x, win)

    shifted = rewindow(xw, nwh, nww, win, s, -1, interpret=True)
    ref = window_partition(jnp.roll(x, (-s, -s), (1, 2)), win)
    np.testing.assert_array_equal(np.asarray(shifted), np.asarray(ref))

    back = rewindow(shifted, nwh, nww, win, s, +1, interpret=True)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(xw))

    # adjoint of the permutation == its inverse: d/dx sum(P x * y) = P^T y
    g = jax.grad(
        lambda z: jnp.sum(
            rewindow(z, nwh, nww, win, s, -1, interpret=True) * shifted
        )
    )(xw)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(xw))

    # bf16 stays exact (pure selection matmul)
    xb = xw.astype(jnp.bfloat16)
    sb = rewindow(xb, nwh, nww, win, s, -1, interpret=True)
    assert bool(jnp.all(sb == ref.astype(jnp.bfloat16)))


def test_swin_chained_stage_parity(rng):
    """Window-major stage chaining (fused blocks + rewindow between them,
    interpret) == the XLA SwinTiny: stage outputs at inference and every
    parameter gradient in training (same DropPath draws)."""
    import jax.tree_util as tu

    from swinvox_tpu.models.swin import SwinTiny

    x = jnp.asarray(rng.standard_normal((2, 56, 56, 3)).astype(np.float32))

    def make(**kw):
        return SwinTiny(
            embed_dim=16, depths=(2, 2), num_heads=(2, 2), img_size=56,
            dtype=jnp.float32, drop_path_rate=0.1, **kw
        )

    ref = make()
    fus = make(
        use_pallas_block=True, use_pallas_block_train=True,
        pallas_interpret=True,
    )
    rngs = {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)}
    v = ref.init(rngs, x, True)
    assert tu.tree_structure(fus.init(rngs, x, True)["params"]) == \
        tu.tree_structure(v["params"])

    for a, b in zip(ref.apply(v, x, False), fus.apply(v, x, False)):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=2e-4, atol=2e-4
        )

    def loss(mod):
        def f(p, xx):
            outs = mod.apply(
                {"params": p}, xx, True,
                rngs={"dropout": jax.random.PRNGKey(3)},
            )
            return sum(jnp.sum(o ** 2) for o in outs)
        return f

    l_r, g_r = jax.value_and_grad(loss(ref))(v["params"], x)
    l_f, g_f = jax.value_and_grad(loss(fus))(v["params"], x)
    np.testing.assert_allclose(float(l_f), float(l_r), rtol=1e-4)
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, a), (_, b) in zip(
        sorted(tu.tree_flatten_with_path(g_r)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(g_f)[0], key=key_of),
    ):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=3e-3, atol=3e-3,
            err_msg=tu.keystr(pth),
        )


def test_rewindow_under_mesh(rng):
    """rewindow composes with GSPMD: batch-sharded window-major tokens
    through the pallas_call match the unsharded result bit-for-bit."""
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from swinvox_tpu.models.swin import window_partition
    from swinvox_tpu.ops.rewindow import rewindow

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    b, h, w, c, win, s = 8, 56, 56, 96, 7, 3
    x = jnp.asarray(rng.standard_normal((b, h, w, c)).astype(np.float32))
    xw = window_partition(x, win)
    ref = np.asarray(rewindow(xw, 8, 8, win, s, -1, interpret=True))

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    xs = jax.device_put(xw, NamedSharding(mesh, P("data")))
    with mesh:
        got = jax.jit(
            lambda z: rewindow(z, 8, 8, win, s, -1, interpret=True)
        )(xs)
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_down1_fused_backward_grad_parity(rng):
    """conv3d_down1 (ops/pallas_down1.py, interpret): stock-conv forward
    plus the fused one-pass Pallas backward == plain lax conv in value
    and both gradients, including the non-multiple-of-16 batch pad path
    (5 volumes) and an uneven cotangent."""
    from swinvox_tpu.ops.pallas_down1 import conv3d_down1

    for n in (16, 5):
        x = jnp.asarray(
            rng.standard_normal((n, 32, 32, 32, 1)), jnp.float32
        )
        k = jnp.asarray(
            rng.standard_normal((4, 4, 4, 1, 32)) * 0.1, jnp.float32
        )
        t = jnp.asarray(
            rng.standard_normal((n, 33, 33, 33, 32)), jnp.float32
        )

        def ref(x, k):
            dn = jax.lax.conv_dimension_numbers(
                x.shape, k.shape, ("NDHWC", "DHWIO", "NDHWC")
            )
            return jax.lax.conv_general_dilated(
                x, k, (1, 1, 1), [(2, 2)] * 3, dimension_numbers=dn
            )

        def fused(x, k):
            return conv3d_down1(x, k, interpret=True)

        def loss(fn):
            return lambda x, k: jnp.sum((fn(x, k) - t) ** 2)

        l0, (gx0, gk0) = jax.value_and_grad(loss(ref), (0, 1))(x, k)
        l1, (gx1, gk1) = jax.value_and_grad(loss(fused), (0, 1))(x, k)
        # forward IS the stock conv -> loss identical
        np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(gx1), np.asarray(gx0), rtol=1e-4, atol=1e-4
        )
        gk_scale = float(np.abs(np.asarray(gk0)).max())
        np.testing.assert_allclose(
            np.asarray(gk1), np.asarray(gk0), rtol=1e-4,
            atol=1e-4 * gk_scale,
        )


def test_refiner_down1_pallas_parity(rng):
    """Refiner with/without the fused down1 backward (interpret):
    identical forward, matching gradients, identical param trees."""
    import jax.tree_util as tu

    from swinvox_tpu.models.refiner import Refiner

    vol = jnp.asarray(rng.standard_normal((2, 32, 32, 32)), jnp.float32)
    a = Refiner(dtype=jnp.float32, down1_pallas=False)
    b = Refiner(dtype=jnp.float32, down1_pallas=True, pallas_interpret=True)
    v = a.init(jax.random.PRNGKey(0), vol, True)
    assert tu.tree_structure(b.init(jax.random.PRNGKey(0), vol, True)) == (
        tu.tree_structure(v)
    )

    def loss(mod):
        def f(p, vol):
            out, _ = mod.apply(
                {"params": p, "batch_stats": v["batch_stats"]}, vol, True,
                mutable=["batch_stats"],
            )
            return jnp.sum(out ** 2)
        return f

    l0, (gp0, gv0) = jax.value_and_grad(loss(a), (0, 1))(v["params"], vol)
    l1, (gp1, gv1) = jax.value_and_grad(loss(b), (0, 1))(v["params"], vol)
    np.testing.assert_allclose(float(l1), float(l0), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(gv1), np.asarray(gv0), rtol=1e-4, atol=1e-4
    )
    key_of = lambda kv: tu.keystr(kv[0])  # noqa: E731
    for (pth, x), (_, y) in zip(
        sorted(tu.tree_flatten_with_path(gp0)[0], key=key_of),
        sorted(tu.tree_flatten_with_path(gp1)[0], key=key_of),
    ):
        scale = np.abs(np.asarray(x)).max() + 1e-6
        assert np.abs(np.asarray(y) - np.asarray(x)).max() <= 1e-3 * scale, (
            tu.keystr(pth)
        )
