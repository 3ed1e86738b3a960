"""Layer-level parity tests: geometry and semantics vs torch ground truth.

The reference model is pure PyTorch; torch (CPU) is used here only as an
oracle for operator semantics (transposed-conv geometry, adaptive pooling
bins, pooling edge behavior) — the implementations are independent.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from swinvox_tpu.models import layers


def test_conv_transpose_matches_torch_geometry_and_values(rng):
    """ConvTranspose must equal torch's ConvTranspose3d bit-for-bit
    (given the same kernel, accounting for layout + kernel flip)."""
    x = rng.standard_normal((2, 2, 2, 2, 5), dtype=np.float32)  # NDHWC
    for kernel, pad in [((6, 4, 4), (2, 1, 1)), ((4, 4, 4), (1, 1, 1))]:
        mod = layers.ConvTranspose(
            3, kernel, strides=2, padding=pad, use_bias=False,
            dtype=jnp.float32,
        )
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
        w = np.asarray(variables["params"]["kernel"])  # (*k, in, out)
        y = np.asarray(mod.apply(variables, jnp.asarray(x)))

        # torch: weight [in, out, *k]; torch tconv correlates with the
        # flipped kernel relative to conv_general_dilated, so flip spatials.
        wt = torch.from_numpy(
            np.ascontiguousarray(
                w[::-1, ::-1, ::-1].transpose(3, 4, 0, 1, 2)
            )
        )
        xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))  # NCDHW
        yt = F.conv_transpose3d(xt, wt, stride=2, padding=pad)
        yt = yt.numpy().transpose(0, 2, 3, 4, 1)
        assert y.shape == yt.shape
        np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_adaptive_pool_7_to_2_matches_torch(rng):
    x = rng.standard_normal((3, 7, 7, 4), dtype=np.float32)
    y = np.asarray(layers.adaptive_avg_pool_7_to_2(jnp.asarray(x)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.adaptive_avg_pool2d(xt, (2, 2)).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt, rtol=1e-5, atol=1e-6)


def test_max_pool_floors_odd_input(rng):
    """Refiner path: 33 -> 16 via k2 s2 VALID (torch MaxPool3d default)."""
    x = rng.standard_normal((1, 33, 33, 33, 2), dtype=np.float32)
    y = layers.max_pool(jnp.asarray(x), 2)
    assert y.shape == (1, 16, 16, 16, 2)
    xt = torch.from_numpy(x.transpose(0, 4, 1, 2, 3))
    yt = torch.nn.functional.max_pool3d(xt, 2).numpy().transpose(0, 2, 3, 4, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-6, atol=1e-6)


def test_resize_bilinear_matches_torch(rng):
    x = rng.standard_normal((2, 3, 3, 4), dtype=np.float32)
    y = np.asarray(layers.resize_bilinear(jnp.asarray(x), (7, 7)))
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = F.interpolate(xt, size=(7, 7), mode="bilinear", align_corners=False)
    yt = yt.numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, yt, rtol=1e-4, atol=1e-5)


def test_reference_conv_init_statistics():
    """kaiming_normal(fan_out, leaky 0.02) * 0.1."""
    init = layers.reference_conv_init()
    w = init(jax.random.PRNGKey(0), (3, 3, 64, 128))
    fan_out = 128 * 9
    expected_std = np.sqrt(2.0 / (1 + 0.02**2) / fan_out) * 0.1
    assert abs(float(w.std()) - expected_std) / expected_std < 0.05


def test_norm_matches_torch_batchnorm(rng):
    x = rng.standard_normal((8, 5, 5, 3), dtype=np.float32)
    mod = layers.Norm(dtype=jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
    y, mutated = mod.apply(
        variables, jnp.asarray(x), True, mutable=["batch_stats"]
    )
    bn = torch.nn.BatchNorm2d(3)
    xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
    yt = bn(xt).detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(y), yt, rtol=1e-4, atol=1e-5)
    # running stats after one step: torch momentum 0.1 == flax 0.9
    rm = np.asarray(mutated["batch_stats"]["bn"]["mean"])
    np.testing.assert_allclose(rm, bn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
