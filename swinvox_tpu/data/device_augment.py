"""On-device training augmentation: the TPU-first data path.

The reference augments per sample in DataLoader worker processes
(utils/data_transforms.py — the O(n^2) np.append pipeline, SURVEY §3.1);
the host-side port (data/transforms.py) vectorizes it but still spends
~30 ms/sample of host CPU. For ShapeNet-style fixed-size sources the
whole post-decode pipeline is data-independent enough to run INSIDE a
jitted function on the accelerator:

  * the train crop is a deterministic center crop (no bbox on ShapeNet),
    so crop + the fixed 128->224 bilinear resize become two SEPARABLE
    matmuls that ride the MXU;
  * background compositing is one elementwise select against the
    per-sample color;
  * color jitter + PCA noise + normalize + channel permutation compose
    into ONE per-sample affine map  y = A x + B x_bar + v  (fold done on
    the host in transforms.fold_color_affine — pure 3x3 parameter math);
  * the per-view flip is one select.

The host keeps only decode (native C) + parameter draws, cutting the
host cost per view from ~11 ms to the ~2 ms decode, and the raw 137x137
RGBA transfer is ~2x smaller than shipping augmented 224x224x3.

Parameter distributions are drawn with the SAME rng stream the host
pipeline uses (transforms.draw_train_params), so host and device paths
produce identical augmentations for a given seed — pinned in
tests/test_data.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] half-pixel bilinear interpolation matrix (2 taps/row),
    identical taps/weights to transforms.resize_bilinear_np."""
    m = np.zeros((out_size, in_size), np.float32)
    xs = (np.arange(out_size, dtype=np.float32) + 0.5) * (
        in_size / out_size
    ) - 0.5
    xs = np.clip(xs, 0.0, in_size - 1.0)
    x0 = np.floor(xs).astype(np.int64)
    x1 = np.minimum(x0 + 1, in_size - 1)
    wx = xs - x0
    m[np.arange(out_size), x0] += 1.0 - wx
    m[np.arange(out_size), x1] += wx
    return m


def device_train_augment(
    raw: jax.Array,
    bg_color: jax.Array,
    color_A: jax.Array,
    color_B: jax.Array,
    color_v: jax.Array,
    flips: jax.Array,
    img_size: int = 224,
    crop_size: int = 128,
) -> jax.Array:
    """raw [B, N, H, W, 3|4] f32 BGR(A) in [0,1] -> [B, N, S, S, 3] f32.

    Per-sample params (stacked on the batch axis by the loader):
    bg_color [B, 3], color_A/B [B, 3, 3], color_v [B, 3], flips [B, N].
    Jit-friendly: static shapes, no data-dependent control flow.
    """
    b, n, h, w, c = raw.shape
    x = raw.astype(jnp.float32)
    if raw.dtype == jnp.uint8:
        # loader ships uint8 (4x smaller transfer); the decoder's [0,1]
        # floats are recovered exactly (8-bit sources)
        x = x * (1.0 / 255.0)

    # center crop (the reference crops only when strictly larger)
    if h > crop_size and w > crop_size:
        t = (h - crop_size) // 2
        left = (w - crop_size) // 2
        x = jax.lax.slice(
            x, (0, 0, t, left, 0), (b, n, t + crop_size, left + crop_size, c)
        )
    ch, cw = x.shape[2], x.shape[3]

    # separable bilinear resize as two matmuls (exact same taps as the
    # host resize; HIGHEST keeps f32 math on the TPU MXU)
    if (ch, cw) != (img_size, img_size):
        wy = jnp.asarray(_resize_matrix(ch, img_size))
        wx = jnp.asarray(_resize_matrix(cw, img_size))
        x = jnp.einsum(
            "oh,bnhwc->bnowc", wy, x, precision=jax.lax.Precision.HIGHEST
        )
        x = jnp.einsum(
            "pw,bnowc->bnopc", wx, x, precision=jax.lax.Precision.HIGHEST
        )

    # background composite where alpha == 0.  The host pipeline also
    # composites AFTER crop+resize (train_transform order), so the == 0
    # test runs on the RESIZED alpha in both paths — a resized alpha is
    # exactly 0 only where all contributing taps were 0.
    if c == 4:
        alpha0 = (x[..., 3:4] == 0.0).astype(jnp.float32)
        x = alpha0 * bg_color[:, None, None, None, :] + (1.0 - alpha0) * x[..., :3]

    # folded color affine: y = A x + B x_bar + v
    xbar = jnp.mean(x, axis=(2, 3))  # [B, N, 3]
    y = jnp.einsum("bnhwc,bdc->bnhwd", x, color_A,
                   precision=jax.lax.Precision.HIGHEST)
    y = y + jnp.einsum("bnc,bdc->bnd", xbar, color_B,
                       precision=jax.lax.Precision.HIGHEST)[:, :, None, None, :]
    y = y + color_v[:, None, None, None, :]

    # per-view left-right flip
    flip = (flips > 0)[:, :, None, None, None]
    return jnp.where(flip, y[:, :, :, ::-1, :], y)


# shared jitted entry (trainer + evaluator); inputs already sharded over
# the mesh's data axis stay sharded through GSPMD
device_train_augment_jit = jax.jit(
    device_train_augment, static_argnums=(6, 7)
)


def apply_device_augment(batch: dict, cfg) -> jax.Array:
    """Return the model-ready images for a (possibly device-augment)
    batch dict: applies the jitted on-device augmentation when the
    aug_* parameter arrays are present, else passes images through.

    The ONE place that knows the parameter order — every train_step
    feeder (trainer, evaluator, LR finder, tuner, dry runs) goes
    through here so the call sites cannot drift apart.
    """
    if "aug_bg_color" not in batch:
        return batch["images"]
    return device_train_augment_jit(
        batch["images"],
        batch["aug_bg_color"],
        batch["aug_color_A"],
        batch["aug_color_B"],
        batch["aug_color_v"],
        batch["aug_flips"],
        cfg.CONST.IMG_H,
        cfg.CONST.CROP_IMG_H,
    )


def batch_to_host_dict(b, cfg) -> dict:
    """Flatten a pipeline Batch into the host dict every feeder ships to
    the device: images + volumes, plus aug_* arrays when the loader is
    in device-augment mode (Batch.aug is None when a source fell back
    to host augmentation — bbox datasets — even under
    TRAIN.DEVICE_AUGMENT)."""
    # binary occupancy rides the host->device link as uint8 — 4x fewer
    # bytes than f32 (16.8 -> 4.2 MB at batch 128); decode_volume yields
    # exact {0.0, 1.0} so the cast is lossless, and the jitted steps cast
    # back to f32 on device before any loss math
    vol = b.volumes
    if vol.dtype != np.uint8:
        vol = vol.astype(np.uint8)
    host = {"images": b.images, "volumes": vol}
    if b.aug is not None:
        for k, v in b.aug.items():
            host[f"aug_{k}"] = v
    return host
