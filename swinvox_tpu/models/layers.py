"""Shared building blocks: inits, norm/conv wrappers, transposed conv.

Everything is channels-last (NHWC / NDHWC) — the TPU-native layout — and
takes an explicit compute ``dtype`` (bfloat16 by default) with float32
parameters.  Normalization statistics are always computed in float32.

Initialization replicates the reference's ``init_weights``
(/root/reference/utils/helpers.py:20-44), which is applied over ALL modules
at train start (reference core/train.py:91-94) and therefore clobbers even
the pretrained backbones:
  * Conv/ConvTranspose: kaiming-normal(mode=fan_out, a=0.02) * 0.1, bias 0
  * Linear: normal(0, 0.01) * 0.1, bias 0
  * BatchNorm: scale 1, bias 0
LayerNorm and attention relative-position tables are NOT touched by the
reference's init_weights, so they keep their native inits (ones/zeros and
trunc-normal(0.02) respectively).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

# gain for kaiming-normal with leaky_relu nonlinearity, a=0.02
_LEAKY_GAIN = math.sqrt(2.0 / (1.0 + 0.02**2))

# Initialization scheme:
#   "reference" — replicate the reference's init_weights exactly, including
#       its x0.1 down-scaling of every conv and the near-dead normal(0,
#       0.001) linears (helpers.py:20-44).  This is the as-coded behavior
#       (applied even over pretrained backbones, core/train.py:91-94).
#   "standard" — conventional kaiming/lecun inits; usually trains faster
#       from scratch.  Set via set_init_scheme() / cfg.NETWORK.INIT_SCHEME
#       BEFORE model.init.
_INIT_SCHEME = "reference"


def set_init_scheme(scheme: str) -> None:
    global _INIT_SCHEME
    if scheme not in ("reference", "standard"):
        raise ValueError(f"unknown init scheme {scheme!r}")
    _INIT_SCHEME = scheme


def get_init_scheme() -> str:
    return _INIT_SCHEME


def reference_conv_init(scale: float = 0.1) -> Callable:
    """kaiming_normal(fan_out, leaky_relu a=0.02) * scale for conv kernels.

    Kernel layout is (*spatial, in, out); fan_out = out * prod(spatial),
    matching torch's convention for Conv weights.  Under the "standard"
    scheme the x0.1 scale is dropped.
    """

    def init(key, shape, dtype=jnp.float32):
        s = scale if _INIT_SCHEME == "reference" else 1.0
        fan_out = shape[-1] * int(np.prod(shape[:-2]))
        std = _LEAKY_GAIN / math.sqrt(fan_out) * s
        return jax.random.normal(key, shape, dtype) * jnp.asarray(std, dtype)

    return init


def reference_dense_init(scale: float = 0.1) -> Callable:
    """normal(0, 0.01) * scale for Linear kernels (reference helpers.py:36-41).

    Under the "standard" scheme: lecun-normal instead."""

    def init(key, shape, dtype=jnp.float32):
        if _INIT_SCHEME == "standard":
            return nn.initializers.lecun_normal()(key, shape, dtype)
        return jax.random.normal(key, shape, dtype) * jnp.asarray(
            0.01 * scale, dtype
        )

    return init


def trunc_normal_init(stddev: float = 0.02) -> Callable:
    """Truncated normal — the native init for attention tables / swin linears."""
    return nn.initializers.truncated_normal(stddev=stddev)


class Norm(nn.Module):
    """BatchNorm with torch semantics (momentum 0.1, eps 1e-5), float32 stats.

    flax momentum is the decay of the running average, so torch's 0.1
    corresponds to 0.9 here.  Stats live in the 'batch_stats' collection.
    """

    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool, external_stats=None
    ) -> jax.Array:
        x32 = x.astype(jnp.float32)
        if external_stats is None:
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=jnp.float32,
                name="bn",
            )(x32)
            return y.astype(self.dtype)
        # External-stats mode (the whole-stack merger kernel computes the
        # batch statistics itself): materialize the identical variable
        # tree via an eval-mode dummy trace (dead code XLA eliminates),
        # apply flax's running-average update manually, and normalize
        # with the PROVIDED batch stats.  Semantics match nn.BatchNorm
        # train mode exactly (biased variance, momentum 0.9, eps 1e-5).
        mean, var = external_stats
        bn = nn.BatchNorm(
            use_running_average=True,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            name="bn",
        )
        bn(jnp.zeros((1,) * (x.ndim - 1) + (x.shape[-1],), jnp.float32))
        v = bn.variables
        scale = v["params"]["scale"].astype(jnp.float32)
        bias = v["params"]["bias"].astype(jnp.float32)
        if train and bn.is_mutable_collection("batch_stats"):
            sg = jax.lax.stop_gradient
            bn.put_variable(
                "batch_stats", "mean",
                0.9 * v["batch_stats"]["mean"] + 0.1 * sg(mean),
            )
            bn.put_variable(
                "batch_stats", "var",
                0.9 * v["batch_stats"]["var"] + 0.1 * sg(var),
            )
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5) * scale + bias
        return y.astype(self.dtype)


class LayerNorm(nn.Module):
    """LayerNorm over the trailing ``num_axes`` axes, float32 compute.

    With num_axes=1 this is the standard transformer LayerNorm.  The
    reference's Swin wrapper uses nn.LayerNorm([C, H, W]) — per-element
    affine over the whole feature map (reference swin_transformer.py:64-67);
    that corresponds to num_axes=3 here (our layout is [..., H, W, C]).
    """

    dtype: Dtype = jnp.bfloat16
    num_axes: int = 1
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        axes = tuple(range(-self.num_axes, 0))
        y = nn.LayerNorm(
            epsilon=self.epsilon,
            dtype=jnp.float32,
            reduction_axes=axes,
            feature_axes=axes,
        )(x.astype(jnp.float32))
        return y.astype(self.dtype)


class Conv(nn.Module):
    """Channels-last conv (2D or 3D by kernel rank) with reference init."""

    features: int
    kernel_size: Tuple[int, ...]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[str, int, Sequence[Tuple[int, int]]] = 0
    use_bias: bool = True
    feature_group_count: int = 1
    dtype: Dtype = jnp.bfloat16
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rank = len(self.kernel_size)
        strides = (
            (self.strides,) * rank
            if isinstance(self.strides, int)
            else tuple(self.strides)
        )
        if isinstance(self.padding, int):
            padding = [(self.padding, self.padding)] * rank
        else:
            padding = self.padding
        return nn.Conv(
            features=self.features,
            kernel_size=self.kernel_size,
            strides=strides,
            padding=padding,
            use_bias=self.use_bias,
            feature_group_count=self.feature_group_count,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init or reference_conv_init(),
            bias_init=nn.initializers.zeros,
        )(x)


class ConvTranspose(nn.Module):
    """Transposed conv with torch output geometry: out = (in-1)*s - 2p + k.

    Implemented directly as ``lax.conv_general_dilated`` with input dilation
    = stride and per-side padding k-1-p, which reproduces the reference
    decoder/refiner upsampling shapes exactly (reference models/decoder.py:
    24-46, models/refiner.py:58-70).  We do not spatially flip the kernel
    (a pure reparameterization for freshly trained weights).
    """

    features: int
    kernel_size: Tuple[int, ...]
    strides: Union[int, Tuple[int, ...]] = 1
    padding: Union[int, Tuple[int, ...]] = 0
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        rank = len(self.kernel_size)
        strides = (
            (self.strides,) * rank
            if isinstance(self.strides, int)
            else tuple(self.strides)
        )
        pads = (
            (self.padding,) * rank
            if isinstance(self.padding, int)
            else tuple(self.padding)
        )
        in_features = x.shape[-1]
        kernel_shape = (*self.kernel_size, in_features, self.features)
        init = self.kernel_init or reference_conv_init()
        kernel = self.param("kernel", init, kernel_shape, jnp.float32)

        lax_padding = [
            (k - 1 - p, k - 1 - p) for k, p in zip(self.kernel_size, pads)
        ]
        spatial = "".join("DHW"[3 - rank + i] for i in range(rank))
        dn = jax.lax.conv_dimension_numbers(
            x.shape,
            kernel_shape,
            (f"N{spatial}C", f"{spatial}IO", f"N{spatial}C"),
        )
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            kernel.astype(self.dtype),
            window_strides=(1,) * rank,
            padding=lax_padding,
            lhs_dilation=strides,
            rhs_dilation=(1,) * rank,
            dimension_numbers=dn,
        )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class Dense(nn.Module):
    """Linear layer with the reference init (normal(0, 0.001))."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.bfloat16
    kernel_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return nn.Dense(
            features=self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            kernel_init=self.kernel_init or reference_dense_init(),
            bias_init=nn.initializers.zeros,
        )(x)


def max_pool(x: jax.Array, window: int, stride: Optional[int] = None) -> jax.Array:
    """Max pool over all spatial dims of NHWC/NDHWC input.

    Init values must be Python scalars: array-valued reduce_window inits
    break reverse-mode autodiff under jit (JAX 0.9 linearization).
    """
    stride = stride or window
    rank = x.ndim - 2
    dims = (1, *(window,) * rank, 1)
    strides = (1, *(stride,) * rank, 1)
    init = (
        -float("inf")
        if jnp.issubdtype(x.dtype, jnp.floating)
        else int(jnp.iinfo(x.dtype).min)
    )
    return jax.lax.reduce_window(x, init, jax.lax.max, dims, strides, "VALID")


def avg_pool(x: jax.Array, window: int, stride: Optional[int] = None) -> jax.Array:
    """Average pool over all spatial dims of NHWC/NDHWC input."""
    stride = stride or window
    rank = x.ndim - 2
    dims = (1, *(window,) * rank, 1)
    strides = (1, *(stride,) * rank, 1)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, strides, "VALID"
    )
    return summed / np.prod(dims)


def adaptive_avg_pool_7_to_2(x: jax.Array) -> jax.Array:
    """AdaptiveAvgPool2d((2,2)) on 7x7 input, exactly torch's binning.

    torch bins for out=2 over in=7 are [0:4) and [3:7) — window 4, stride 3
    (reference models/decoder.py:17,59).
    """
    dims = (1, 4, 4, 1)
    strides = (1, 3, 3, 1)
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, dims, strides, "VALID"
    )
    return summed / 16.0


def resize_bilinear(x: jax.Array, size: Tuple[int, int]) -> jax.Array:
    """Bilinear spatial resize of NHWC input, half-pixel-aligned.

    Matches torch F.interpolate(mode='bilinear', align_corners=False)
    (reference cross_view_attention.py:110-113, swin_transformer.py:74-75).
    """
    n, _, _, c = x.shape
    return jax.image.resize(
        x, (n, size[0], size[1], c), method="bilinear"
    ).astype(x.dtype)


class DropPath(nn.Module):
    """Stochastic depth — drop the whole residual branch per sample."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if deterministic or self.rate == 0.0:
            return x
        keep = 1.0 - self.rate
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))
