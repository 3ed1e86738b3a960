"""Neural network modules (flax.linen, NHWC / NDHWC channels-last)."""

from swinvox_tpu.models.swinvox import SwinVoxModel  # noqa: F401
