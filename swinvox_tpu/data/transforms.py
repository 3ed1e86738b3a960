"""Host-side image transforms — functional, vectorized, explicitly seeded.

Replicates the distributions and math of reference utils/data_transforms.py
(bbox-guided square crops with jitter and edge padding, alpha-keyed random
background compositing, shared-parameter color jitter with BGR gray weights,
PCA-style RGB noise, per-view flips, shared channel permutation, (x-m)/s
normalization), with three deliberate engineering differences:

  * every random draw comes from an explicit numpy Generator (no global
    RNG) so the pipeline is reproducible and thread-safe;
  * images stay float32 end-to-end (the reference silently upcasts to
    float64 via np.append into float64 buffers, data_transforms.py:89,151);
  * per-view loops and O(n^2) np.append accumulation are replaced by
    vectorized whole-stack ops.

Channel order is BGR(A) like the reference's cv2.imread (the color-jitter
gray weights 0.114/0.587/0.299 assume BGR, data_transforms.py:345; the
noise op converts BGR->RGB and back, :396-400).  The image loader produces
BGR to match.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np

from swinvox_tpu.config import Config


# ---------------------------------------------------------------- resize


def resize_bilinear_np(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Half-pixel-aligned bilinear resize (cv2.resize INTER_LINEAR semantics)
    for HWC float arrays: native C when available (GIL released — the
    single largest host-pipeline cost, tools/data_bench.py), else a
    vectorized numpy gather."""
    in_h, in_w = img.shape[:2]
    if (in_h, in_w) == (out_h, out_w):
        return img.astype(np.float32, copy=False)
    from swinvox_tpu.native.runtime import resize_bilinear_native

    native = resize_bilinear_native(img, out_h, out_w)
    if native is not None:
        return native
    ys = (np.arange(out_h, dtype=np.float32) + 0.5) * (in_h / out_h) - 0.5
    xs = (np.arange(out_w, dtype=np.float32) + 0.5) * (in_w / out_w) - 0.5
    ys = np.clip(ys, 0.0, in_h - 1.0)
    xs = np.clip(xs, 0.0, in_w - 1.0)
    y0 = np.floor(ys).astype(np.int64)
    x0 = np.floor(xs).astype(np.int64)
    y1 = np.minimum(y0 + 1, in_h - 1)
    x1 = np.minimum(x0 + 1, in_w - 1)
    wy = (ys - y0).astype(np.float32)[:, None, None]
    wx = (xs - x0).astype(np.float32)[None, :, None]
    img = img.astype(np.float32, copy=False)
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


# ---------------------------------------------------------------- crops


def _square_crop_bounds(
    bbox: Sequence[float],
    img_h: int,
    img_w: int,
    rng: Optional[np.random.Generator],
) -> Tuple[int, int, int, int]:
    """Square crop around a normalized bbox; jittered when rng is given
    (reference data_transforms.py:93-112 / 187-208)."""
    x0, y0, x1, y1 = (
        bbox[0] * img_w,
        bbox[1] * img_h,
        bbox[2] * img_w,
        bbox[3] * img_h,
    )
    bw, bh = x1 - x0, y1 - y0
    cx, cy = (x0 + x1) * 0.5, (y0 + y1) * 0.5
    size = max(bw, bh)
    if rng is not None:
        size = size * rng.uniform(0.8, 1.2)
        left = int(cx - size * rng.uniform(0.4, 0.6))
        right = int(cx + size * rng.uniform(0.4, 0.6))
        top = int(cy - size * rng.uniform(0.4, 0.6))
        bottom = int(cy + size * rng.uniform(0.4, 0.6))
    else:
        left = int(cx - size * 0.5)
        right = int(cx + size * 0.5)
        top = int(cy - size * 0.5)
        bottom = int(cy + size * 0.5)
    return left, right, top, bottom


def _crop_with_edge_pad(
    img: np.ndarray, left: int, right: int, top: int, bottom: int
) -> np.ndarray:
    """Crop [top:bottom+1, left:right+1] with edge padding where the window
    leaves the image (reference data_transforms.py:114-135)."""
    img_h, img_w = img.shape[:2]
    pad_l = -left if left < 0 else 0
    left = max(left, 0)
    pad_r = right - img_w + 1 if right >= img_w else 0
    right = min(right, img_w - 1)
    pad_t = -top if top < 0 else 0
    top = max(top, 0)
    pad_b = bottom - img_h + 1 if bottom >= img_h else 0
    bottom = min(bottom, img_h - 1)
    out = img[top : bottom + 1, left : right + 1]
    if pad_l or pad_r or pad_t or pad_b:
        out = np.pad(out, ((pad_t, pad_b), (pad_l, pad_r), (0, 0)), mode="edge")
    return out


def crop_images(
    images: np.ndarray,
    img_size: Tuple[int, int],
    crop_size: Tuple[int, int],
    bounding_box: Optional[Sequence[float]] = None,
    rng: Optional[np.random.Generator] = None,
) -> np.ndarray:
    """CenterCrop (rng=None) / RandomCrop (rng given) for a stack [N,H,W,C].

    Without a bbox: take the center crop_size window (or the whole image if
    smaller) and resize to img_size.  With a bbox: square crop around it
    (jittered for RandomCrop) with edge padding, then resize.
    """
    out_h, out_w = img_size
    crop_h, crop_w = crop_size
    outs = []
    for img in images:
        ih, iw = img.shape[:2]
        if bounding_box is not None:
            l, r, t, b = _square_crop_bounds(bounding_box, ih, iw, rng)
            window = _crop_with_edge_pad(img, l, r, t, b)
        else:
            if ih > crop_h and iw > crop_w:
                t = (ih - crop_h) // 2
                l = (iw - crop_w) // 2
                window = img[t : t + crop_h, l : l + crop_w]
            else:
                window = img
        outs.append(resize_bilinear_np(window, out_h, out_w))
    return np.stack(outs).astype(np.float32)


# ---------------------------------------------------------- background


def random_background(
    images: np.ndarray,
    color_range: Sequence[Sequence[int]],
    rng: np.random.Generator,
    bg_image: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Composite a random background where alpha == 0; 4ch -> 3ch.

    No-op for 3-channel input (reference data_transforms.py:429-430).
    The solid color is drawn once and shared across views (:433-435).
    When a background image is supplied (the reference's SUN-images path,
    DIR.RANDOM_BG_PATH, :438-447), each view flips a coin between the image
    and the color; the image is resized to the view size.
    """
    if images.shape[-1] != 4:
        return images
    color = np.array(
        [rng.integers(lo, hi + 1) for lo, hi in color_range], np.float32
    ) / 255.0
    if bg_image is not None:
        h, w = images.shape[1:3]
        bg = resize_bilinear_np(bg_image[..., :3], h, w)
    alpha = (images[..., 3:4] == 0).astype(np.float32)
    rgb = images[..., :3]
    out = np.empty(images.shape[:-1] + (3,), np.float32)
    for i in range(images.shape[0]):
        use_img = bg_image is not None and rng.integers(0, 2)
        background = bg if use_img else color
        out[i] = alpha[i] * background + (1.0 - alpha[i]) * rgb[i]
    return out


# ---------------------------------------------------------- color jitter


def _bgr_to_gray(images: np.ndarray) -> np.ndarray:
    """Luma with BGR weights, per reference data_transforms.py:330-347."""
    return (
        0.114 * images[..., 0] + 0.587 * images[..., 1] + 0.299 * images[..., 2]
    )


def color_jitter(
    images: np.ndarray,
    brightness: float,
    contrast: float,
    saturation: float,
    rng: np.random.Generator,
) -> np.ndarray:
    """Shared-parameter brightness/contrast/saturation in random order.

    Matches the reference's blend math (data_transforms.py:277-328):
      brightness: alpha*img ; saturation: alpha*img + (1-alpha)*gray ;
      contrast: alpha*img + (1-alpha)*mean(gray_ch0_of_that_stage).
    Parameters and order are drawn once for all views.
    """
    values = {
        "brightness": 1.0 + rng.uniform(-brightness, brightness),
        "contrast": 1.0 + rng.uniform(-contrast, contrast),
        "saturation": 1.0 + rng.uniform(-saturation, saturation),
    }
    order = np.arange(3)
    rng.shuffle(order)
    names = ["brightness", "contrast", "saturation"]
    out = images.astype(np.float32, copy=True)
    for idx in order:
        name = names[idx]
        a = values[name]
        if name == "brightness":
            out = a * out
        elif name == "saturation":
            gs = _bgr_to_gray(out)[..., None]
            out = a * out + (1.0 - a) * gs
        else:  # contrast: blend toward the per-view mean gray level
            gs_mean = _bgr_to_gray(out).mean(axis=(1, 2))  # [N]
            out = a * out + (1.0 - a) * gs_mean[:, None, None, None]
    return out.astype(np.float32)


# ------------------------------------------------------------- noise


_NOISE_EIGVALS = np.array([0.2175, 0.0188, 0.0045], np.float32)
_NOISE_EIGVECS = np.array(
    [
        [-0.5675, 0.7192, 0.4009],
        [-0.5808, -0.0045, -0.8140],
        [-0.5836, -0.6948, 0.4203],
    ],
    np.float32,
)


def random_noise(
    images: np.ndarray, noise_std: float, rng: np.random.Generator
) -> np.ndarray:
    """PCA-style RGB noise, shared across views (reference :376-401).

    The reference computes the noise vector in RGB space and adds it after a
    BGR->RGB flip, then flips back — equivalent to adding the reversed
    vector in BGR space.
    """
    alpha = rng.normal(0.0, noise_std, size=3).astype(np.float32)
    noise_rgb = np.sum(_NOISE_EIGVECS * alpha[None, :] * _NOISE_EIGVALS[None, :], axis=1)
    return (images + noise_rgb[::-1][None, None, None, :]).astype(np.float32)


# ------------------------------------------------------------ the rest


def normalize(
    images: np.ndarray, mean: Sequence[float], std: Sequence[float]
) -> np.ndarray:
    return (
        (images - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    ).astype(np.float32)


def random_flip(images: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    """Independent left-right flip per view (reference :252-260)."""
    out = images.copy()
    for i in range(out.shape[0]):
        if rng.integers(0, 2):
            out[i] = out[i, :, ::-1]
    return out


def random_permute_channels(
    images: np.ndarray, rng: np.random.Generator
) -> np.ndarray:
    """One shared random permutation of the 3 channels (reference :65-73)."""
    perm = rng.permutation(3)
    return images[..., perm]


# ----------------------------------------------------------- pipelines


def train_transform(
    images: np.ndarray,
    cfg: Config,
    rng: np.random.Generator,
    bounding_box: Optional[Sequence[float]] = None,
    bg_image: Optional[np.ndarray] = None,
) -> np.ndarray:
    """The reference's 8-stage train pipeline (core/train.py:44-53)."""
    img_size = (cfg.CONST.IMG_H, cfg.CONST.IMG_W)
    crop_size = (cfg.CONST.CROP_IMG_H, cfg.CONST.CROP_IMG_W)
    x = crop_images(images, img_size, crop_size, bounding_box, rng)
    # RandomBackground must see the alpha channel; crop preserves channels
    if images.shape[-1] == 4:
        x = random_background(
            x, cfg.TRAIN.RANDOM_BG_COLOR_RANGE, rng, bg_image=bg_image
        )
    x = color_jitter(
        x, cfg.TRAIN.BRIGHTNESS, cfg.TRAIN.CONTRAST, cfg.TRAIN.SATURATION, rng
    )
    x = random_noise(x, cfg.TRAIN.NOISE_STD, rng)
    x = normalize(x, cfg.DATASET.MEAN, cfg.DATASET.STD)
    x = random_flip(x, rng)
    x = random_permute_channels(x, rng)
    return np.ascontiguousarray(x, np.float32)


def eval_transform(
    images: np.ndarray,
    cfg: Config,
    rng: Optional[np.random.Generator] = None,
    bounding_box: Optional[Sequence[float]] = None,
) -> np.ndarray:
    """The reference's 4-stage val/test pipeline (core/train.py:54-59).

    The eval RandomBackground color range is degenerate ((240,240) each) in
    the reference config, so rng may be omitted; it is only used when the
    range is non-degenerate.
    """
    img_size = (cfg.CONST.IMG_H, cfg.CONST.IMG_W)
    crop_size = (cfg.CONST.CROP_IMG_H, cfg.CONST.CROP_IMG_W)
    x = crop_images(images, img_size, crop_size, bounding_box, rng=None)
    if images.shape[-1] == 4:
        x = random_background(
            x,
            cfg.TEST.RANDOM_BG_COLOR_RANGE,
            rng if rng is not None else np.random.default_rng(0),
        )
    x = normalize(x, cfg.DATASET.MEAN, cfg.DATASET.STD)
    return np.ascontiguousarray(x, np.float32)


# ---------------------------------------------- device-augment parameters

_GRAY_W = np.array([0.114, 0.587, 0.299], np.float32)  # BGR luma weights


def draw_train_params(
    cfg: Config, rng: np.random.Generator, n_views: int, has_alpha: bool
) -> dict:
    """Draw every random parameter of the train pipeline, in the exact
    rng-call order train_transform uses, WITHOUT touching pixels.

    Host decode stays cheap; the pixel work runs on-device
    (data/device_augment.py). Draw order must mirror train_transform:
    background color ints (4-channel input only), jitter uniforms +
    order shuffle, noise normals, per-view flip ints, channel
    permutation — so a given (seed, epoch, idx) stream produces the SAME
    augmentation as the host path (parity pinned in tests/test_data.py).
    """
    params: dict = {}
    if has_alpha:
        params["bg_color"] = (
            np.array(
                [
                    rng.integers(lo, hi + 1)
                    for lo, hi in cfg.TRAIN.RANDOM_BG_COLOR_RANGE
                ],
                np.float32,
            )
            / 255.0
        )
    else:
        params["bg_color"] = np.zeros((3,), np.float32)
    jitter_vals = np.array(
        [
            1.0 + rng.uniform(-cfg.TRAIN.BRIGHTNESS, cfg.TRAIN.BRIGHTNESS),
            1.0 + rng.uniform(-cfg.TRAIN.CONTRAST, cfg.TRAIN.CONTRAST),
            1.0 + rng.uniform(-cfg.TRAIN.SATURATION, cfg.TRAIN.SATURATION),
        ],
        np.float32,
    )
    order = np.arange(3)
    rng.shuffle(order)
    alpha = rng.normal(0.0, cfg.TRAIN.NOISE_STD, size=3).astype(np.float32)
    noise_rgb = np.sum(
        _NOISE_EIGVECS * alpha[None, :] * _NOISE_EIGVALS[None, :], axis=1
    )
    flips = np.array(
        [rng.integers(0, 2) for _ in range(n_views)], np.int32
    )
    perm = rng.permutation(3)
    A, B, v = fold_color_affine(
        jitter_vals, order, noise_rgb[::-1].copy(),
        np.asarray(cfg.DATASET.MEAN, np.float32),
        np.asarray(cfg.DATASET.STD, np.float32),
        perm,
    )
    params.update({"color_A": A, "color_B": B, "color_v": v, "flips": flips})
    return params


def fold_color_affine(
    jitter_vals: np.ndarray,
    order: np.ndarray,
    noise_bgr: np.ndarray,
    mean: np.ndarray,
    std: np.ndarray,
    perm: np.ndarray,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Compose jitter (in `order`) + noise + normalize + channel permute
    into ONE per-sample affine color map:

        y = A x + B x_bar + v

    with x the post-background pixel (BGR 3-vector) and x_bar the
    per-view pixel mean of x.  Every stage is linear in (x, x_bar):
    brightness scales all terms; saturation applies M = aI + (1-a)1w^T to
    all terms; contrast blends toward the CURRENT stage's mean gray
    w^T(A x_bar + B x_bar + v) which stays a linear functional of x_bar;
    noise/normalize are affine; the channel permutation row-permutes.
    jitter_vals = (brightness, contrast, saturation) factors.
    """
    w = _GRAY_W
    ones = np.ones(3, np.float32)
    A = np.eye(3, dtype=np.float32)
    B = np.zeros((3, 3), np.float32)
    v = np.zeros(3, np.float32)
    names = ["brightness", "contrast", "saturation"]
    for idx in order:
        a = float(jitter_vals[idx])
        name = names[idx]
        if name == "brightness":
            A, B, v = a * A, a * B, a * v
        elif name == "saturation":
            M = a * np.eye(3, dtype=np.float32) + (1.0 - a) * np.outer(ones, w)
            A, B, v = M @ A, M @ B, M @ v
        else:  # contrast
            g_coeff = (A + B).T @ w  # mean-gray as a functional of x_bar
            B = a * B + (1.0 - a) * np.outer(ones, g_coeff)
            v = a * v + (1.0 - a) * float(w @ v) * ones
            A = a * A
    v = v + noise_bgr.astype(np.float32)
    D = (1.0 / std).astype(np.float32)
    A = D[:, None] * A
    B = D[:, None] * B
    v = D * (v - mean.astype(np.float32))
    return A[perm], B[perm], v[perm]


def draw_eval_params(
    cfg: Config, rng: np.random.Generator, n_views: int, has_alpha: bool
) -> dict:
    """Device-augment parameters for the eval pipeline (crop -> background
    -> normalize): background color ints in eval_transform's rng order,
    normalize folded into the affine map, no jitter/noise/flip/permute."""
    if has_alpha:
        bg = (
            np.array(
                [
                    rng.integers(lo, hi + 1)
                    for lo, hi in cfg.TEST.RANDOM_BG_COLOR_RANGE
                ],
                np.float32,
            )
            / 255.0
        )
    else:
        bg = np.zeros((3,), np.float32)
    std = np.asarray(cfg.DATASET.STD, np.float32)
    mean = np.asarray(cfg.DATASET.MEAN, np.float32)
    return {
        "bg_color": bg,
        "color_A": np.diag(1.0 / std).astype(np.float32),
        "color_B": np.zeros((3, 3), np.float32),
        "color_v": (-mean / std).astype(np.float32),
        "flips": np.zeros((n_views,), np.int32),
    }
