"""swinvox_tpu — TPU-native multi-view 3D voxel reconstruction framework.

A brand-new JAX/XLA/Pallas/pjit implementation of the capabilities of the
SwinVox reference (multi-view RGB(A) images -> 32^3 occupancy grid): hybrid
ResNet-50 + Swin-Tiny encoder, cross-view attention fusion, per-view 3D
transposed-conv decoder, context-aware merger, and 3D U-Net refiner — plus the
data pipelines, training loop, evaluation, checkpointing, and tooling around
them.

Layout conventions (TPU-first, not a port):
  * images are NHWC:   [batch, n_views, H, W, C]
  * volumes are DHWC:  [batch, D, H, W] (occupancy), features [.., D, H, W, C]
  * compute dtype is bfloat16 by default, params float32
  * the whole pipeline is one jitted function, sharded over a jax.sharding.Mesh
"""

__version__ = "0.1.0"

from swinvox_tpu.config import Config, default_config  # noqa: F401
