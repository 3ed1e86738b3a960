"""Direct confrontation of the data pipeline with the REFERENCE's own code.

The reference's utils/data_transforms.py is importable here (cv2 5.x,
torch, numpy all installed), so instead of re-deriving the jitter/noise/
crop math from a reading of the source, these tests RUN the reference
transforms and assert:

  (a) exact blend parity of ColorJitter / RandomNoise / RandomBackground /
      crop geometry given identical drawn parameters (the reference draws
      from the np.random / random module globals; we harvest the same
      draws by replaying the call sequence after the same seed and feed
      them to our functions through a replaying rng stub);
  (b) full 7-stage train pipeline parity (reference core/train.py:44-53,
      minus ToTensor's NCHW transpose) and 3-stage val pipeline parity
      with every random draw replayed;
  (c) decoder parity: data/pipeline.load_image_bgr (native C codec or the
      PIL fallback) vs the reference's cv2.imread(IMREAD_UNCHANGED)/255.
      (utils/data_loaders.py:71) on PNG (RGB / RGBA / grayscale /
      palette / palette+transparency) and JPEG fixtures.

Documented intentional divergences from the reference (not bugs here):
  * multi-view RandomCrop/CenterCrop with a bounding box: the reference
    re-scales the already-scaled bbox on every view after the first
    (data_transforms.py:89-94 reassigns `bounding_box` inside the image
    loop) — never hit in practice because its bbox datasets (Pascal3D,
    Pix3D) are single-view.  Our crop uses the normalized bbox for every
    view; the single-view case below is asserted to match exactly.
  * RandomBackground consumes one random.randint(0,1) per view even when
    no background-image folder is configured (data_transforms.py:446);
    ours only draws when a background image exists.  RNG stream
    consumption differs, blend math is asserted identical.
"""

import importlib.util
import os
import random
import sys

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

sys.dont_write_bytecode = True

from swinvox_tpu.config import default_config  # noqa: E402
from swinvox_tpu.data.transforms import (  # noqa: E402
    color_jitter,
    crop_images,
    eval_transform,
    normalize,
    random_background,
    random_flip,
    random_noise,
    random_permute_channels,
    train_transform,
)

REF_ROOT = "/root/reference"


@pytest.fixture(scope="module")
def ref():
    """Load the reference's utils/data_transforms.py as a module."""
    path = os.path.join(REF_ROOT, "utils", "data_transforms.py")
    spec = importlib.util.spec_from_file_location("ref_data_transforms", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class ReplayRng:
    """np.random.Generator stand-in that replays harvested draws.

    Each supported method pops from its own FIFO, so our transform code
    consumes exactly the values the reference's global-RNG calls produced.
    """

    def __init__(self, uniforms=(), normals=(), integers=(), shuffles=(),
                 permutations=()):
        self._u = list(uniforms)
        self._n = list(normals)
        self._i = list(integers)
        self._s = [np.asarray(s) for s in shuffles]
        self._p = [np.asarray(p) for p in permutations]

    def uniform(self, lo, hi):
        return self._u.pop(0)

    def normal(self, loc, scale, size=None):
        return np.asarray(self._n.pop(0))

    def integers(self, lo, hi):
        return self._i.pop(0)

    def shuffle(self, arr):
        arr[:] = self._s.pop(0)

    def permutation(self, n):
        return self._p.pop(0)


def _bgr_images(rng, n=2, h=24, w=20, c=3):
    return rng.random((n, h, w, c)).astype(np.float32)


# ------------------------------------------------------------ (a) blends


def test_color_jitter_blend_parity(ref):
    b, c, s = 0.4, 0.3, 0.25
    imgs = _bgr_images(np.random.default_rng(0))

    np.random.seed(123)
    ref_out = ref.ColorJitter(b, c, s)(imgs.astype(np.float64).copy())

    # harvest the same draws the reference just consumed
    np.random.seed(123)
    ub = np.random.uniform(low=-b, high=b)
    uc = np.random.uniform(low=-c, high=c)
    us = np.random.uniform(low=-s, high=s)
    idx = np.arange(3)
    np.random.shuffle(idx)

    ours = color_jitter(
        imgs, b, c, s, ReplayRng(uniforms=[ub, uc, us], shuffles=[idx])
    )
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=1e-5)


def test_random_noise_parity(ref):
    std = 0.085
    imgs = _bgr_images(np.random.default_rng(1))

    np.random.seed(7)
    ref_out = ref.RandomNoise(std)(imgs.astype(np.float64).copy())

    np.random.seed(7)
    alpha = np.random.normal(loc=0, scale=std, size=3)

    ours = random_noise(imgs, std, ReplayRng(normals=[alpha]))
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=1e-5)


def test_random_background_solid_color_parity(ref):
    color_range = ((225, 255), (225, 255), (225, 255))
    rng = np.random.default_rng(2)
    rgba = rng.random((2, 16, 16, 4)).astype(np.float32)
    rgba[..., 3] = (rgba[..., 3] > 0.5).astype(np.float32)  # binary alpha

    np.random.seed(11)
    random.seed(11)
    ref_out = ref.RandomBackground(color_range)(rgba.astype(np.float64).copy())

    np.random.seed(11)
    draws = [np.random.randint(lo, hi + 1) for lo, hi in color_range]

    ours = random_background(rgba, color_range, ReplayRng(integers=draws))
    assert ours.shape[-1] == 3
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=1e-6)


def test_random_background_image_parity(ref, tmp_path):
    """The SUN-background-image branch (reference data_transforms.py:438-447):
    per-view coin flip between the folder image and the solid color."""
    color_range = ((225, 255), (225, 255), (225, 255))
    h = w = 16
    bg_u8 = (np.random.default_rng(3).random((h, w, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(tmp_path / "bg.png"), bg_u8)

    rng = np.random.default_rng(4)
    rgba = rng.random((3, h, w, 4)).astype(np.float32)
    rgba[..., 3] = (rgba[..., 3] > 0.5).astype(np.float32)

    np.random.seed(13)
    random.seed(13)
    ref_out = ref.RandomBackground(color_range, str(tmp_path))(
        rgba.astype(np.float64).copy()
    )

    # harvest: np randint x3 for the color, then per-view random.randint(0,1)
    # (random.choice picks the only file; replay it for the coin sequence)
    np.random.seed(13)
    color_draws = [np.random.randint(lo, hi + 1) for lo, hi in color_range]
    random.seed(13)
    random.choice([0])  # consume the file pick
    coins = [random.randint(0, 1) for _ in range(3)]

    bg_image = cv2.imread(str(tmp_path / "bg.png")).astype(np.float32) / 255.0
    ours = random_background(
        rgba, color_range, ReplayRng(integers=color_draws + coins),
        bg_image=bg_image,
    )
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=1e-6)


# ------------------------------------------------------ (a) crop geometry


def test_center_crop_no_bbox_parity(ref):
    """ShapeNet path: 137x137 render, 128 center crop, resize to 224."""
    img = np.random.default_rng(5).random((1, 137, 137, 4)).astype(np.float32)
    ref_out = ref.CenterCrop((224, 224), (128, 128))(img.astype(np.float64))
    ours = crop_images(img, (224, 224), (128, 128))
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=2e-4)


def test_center_crop_bbox_parity(ref):
    """Pascal3D/Pix3D path: square crop around the bbox with edge padding."""
    img = np.random.default_rng(6).random((1, 90, 120, 3)).astype(np.float32)
    bbox = [0.05, 0.1, 0.7, 0.95]  # tall box -> square window pads rows
    ref_out = ref.CenterCrop((224, 224), (128, 128))(
        img.astype(np.float64), list(bbox)
    )
    ours = crop_images(img, (224, 224), (128, 128), bounding_box=bbox)
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=2e-4)


def test_random_crop_bbox_parity(ref):
    """Jittered square crop: same random.uniform draw order as the
    reference (size, x_left, x_right, y_top, y_bottom —
    data_transforms.py:205-212)."""
    img = np.random.default_rng(7).random((1, 100, 80, 3)).astype(np.float32)
    bbox = [0.2, 0.15, 0.9, 0.8]

    random.seed(21)
    ref_out = ref.RandomCrop((224, 224), (128, 128))(
        img.astype(np.float64), list(bbox)
    )

    random.seed(21)
    draws = [random.uniform(0.8, 1.2)] + [random.uniform(0.4, 0.6)
                                          for _ in range(4)]
    ours = crop_images(
        img, (224, 224), (128, 128), bounding_box=bbox,
        rng=ReplayRng(uniforms=draws),
    )
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=2e-4)


def test_random_flip_and_permute_parity(ref):
    imgs = _bgr_images(np.random.default_rng(8), n=4)

    random.seed(31)
    ref_flip = ref.RandomFlip()(imgs.astype(np.float64).copy())
    random.seed(31)
    coins = [random.randint(0, 1) for _ in range(4)]
    ours_flip = random_flip(imgs, ReplayRng(integers=coins))
    np.testing.assert_allclose(ours_flip, ref_flip.astype(np.float32))

    np.random.seed(41)
    ref_perm = ref.RandomPermuteRGB()(imgs.astype(np.float64).copy())
    np.random.seed(41)
    perm = np.random.permutation(3)
    ours_perm = random_permute_channels(imgs, ReplayRng(permutations=[perm]))
    np.testing.assert_allclose(ours_perm, ref_perm.astype(np.float32))


# --------------------------------------------- (b) full pipeline replay


def _harvest_train_draws(cfg, n_views, seed):
    """Replay the reference train Compose's global-RNG call sequence
    (ShapeNet: no bbox, so the crop consumes nothing) and return the draws
    in OUR train_transform consumption order."""
    np.random.seed(seed)
    random.seed(seed)
    # RandomBackground: np.randint x3 (+ random.randint per view, unused)
    color = [
        np.random.randint(lo, hi + 1)
        for lo, hi in cfg.TRAIN.RANDOM_BG_COLOR_RANGE
    ]
    [random.randint(0, 1) for _ in range(n_views)]
    # ColorJitter: uniform x3 + shuffle
    ub = np.random.uniform(low=-cfg.TRAIN.BRIGHTNESS, high=cfg.TRAIN.BRIGHTNESS)
    uc = np.random.uniform(low=-cfg.TRAIN.CONTRAST, high=cfg.TRAIN.CONTRAST)
    us = np.random.uniform(low=-cfg.TRAIN.SATURATION, high=cfg.TRAIN.SATURATION)
    idx = np.arange(3)
    np.random.shuffle(idx)
    # RandomNoise: normal(3)
    alpha = np.random.normal(loc=0, scale=cfg.TRAIN.NOISE_STD, size=3)
    # RandomFlip: random.randint per view;  RandomPermuteRGB: permutation
    coins = [random.randint(0, 1) for _ in range(n_views)]
    perm = np.random.permutation(3)
    return ReplayRng(
        uniforms=[ub, uc, us],
        normals=[alpha],
        integers=color + coins,
        shuffles=[idx],
        permutations=[perm],
    )


def test_full_train_pipeline_parity(ref):
    """The reference's 7-stage train Compose (core/train.py:44-52, ToTensor's
    NCHW transpose excluded) vs our train_transform, every draw replayed."""
    cfg = default_config()
    n_views = 3
    rgba = np.random.default_rng(9).random((n_views, 137, 137, 4))
    rgba[..., 3] = (rgba[..., 3] > 0.4).astype(np.float64)

    stages = [
        ref.RandomCrop((cfg.CONST.IMG_H, cfg.CONST.IMG_W),
                       (cfg.CONST.CROP_IMG_H, cfg.CONST.CROP_IMG_W)),
        ref.RandomBackground(cfg.TRAIN.RANDOM_BG_COLOR_RANGE),
        ref.ColorJitter(cfg.TRAIN.BRIGHTNESS, cfg.TRAIN.CONTRAST,
                        cfg.TRAIN.SATURATION),
        ref.RandomNoise(cfg.TRAIN.NOISE_STD),
        ref.Normalize(mean=cfg.DATASET.MEAN, std=cfg.DATASET.STD),
        ref.RandomFlip(),
        ref.RandomPermuteRGB(),
    ]
    np.random.seed(77)
    random.seed(77)
    x = rgba.copy()
    for t in stages:
        x = t(x) if not isinstance(t, (ref.RandomCrop,)) else t(x, None)
    ref_out = x

    rng = _harvest_train_draws(cfg, n_views, 77)
    ours = train_transform(rgba.astype(np.float32), cfg, rng)
    assert ours.shape == ref_out.shape
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=3e-4)


def test_full_val_pipeline_parity(ref):
    """The reference's val Compose (core/train.py:54-59, minus ToTensor):
    CenterCrop + RandomBackground (degenerate (240,240) range) + Normalize."""
    cfg = default_config()
    rgba = np.random.default_rng(10).random((2, 137, 137, 4))
    rgba[..., 3] = (rgba[..., 3] > 0.4).astype(np.float64)

    stages = [
        ref.CenterCrop((cfg.CONST.IMG_H, cfg.CONST.IMG_W),
                       (cfg.CONST.CROP_IMG_H, cfg.CONST.CROP_IMG_W)),
        ref.RandomBackground(cfg.TEST.RANDOM_BG_COLOR_RANGE),
        ref.Normalize(mean=cfg.DATASET.MEAN, std=cfg.DATASET.STD),
    ]
    np.random.seed(5)
    random.seed(5)
    x = rgba.copy()
    for t in stages:
        x = t(x, None) if isinstance(t, ref.CenterCrop) else t(x)
    ref_out = x

    ours = eval_transform(rgba.astype(np.float32), cfg)
    np.testing.assert_allclose(ours, ref_out.astype(np.float32), atol=3e-4)


# --------------------------------------------- (b) draw distributions


def test_draw_distribution_equality(ref):
    """The reference's drawn parameters and ours come from the same
    distributions: compare moments / supports over a seeded sample."""
    cfg = default_config()
    n = 4000

    # reference draws (global RNGs)
    np.random.seed(99)
    random.seed(99)
    ref_jit = np.array([
        1 + np.random.uniform(low=-cfg.TRAIN.BRIGHTNESS,
                              high=cfg.TRAIN.BRIGHTNESS)
        for _ in range(n)
    ])
    ref_size = np.array([random.uniform(0.8, 1.2) for _ in range(n)])
    ref_color = np.array([np.random.randint(225, 256) for _ in range(n)])
    ref_orders = []
    for _ in range(n):
        idx = np.arange(3)
        np.random.shuffle(idx)
        ref_orders.append(tuple(idx))

    # our draws (explicit Generator, data/transforms.py semantics)
    g = np.random.default_rng(1234)
    our_jit = np.array([
        1 + g.uniform(-cfg.TRAIN.BRIGHTNESS, cfg.TRAIN.BRIGHTNESS)
        for _ in range(n)
    ])
    our_size = np.array([g.uniform(0.8, 1.2) for _ in range(n)])
    our_color = np.array([g.integers(225, 256) for _ in range(n)])
    our_orders = [tuple(g.permutation(3)) for _ in range(n)]

    for a, b, tol in (
        (ref_jit, our_jit, 0.01),
        (ref_size, our_size, 0.01),
        (ref_color / 255.0, our_color / 255.0, 0.01),
    ):
        assert abs(a.mean() - b.mean()) < tol, (a.mean(), b.mean())
        assert abs(a.std() - b.std()) < tol, (a.std(), b.std())
        assert a.min() >= b.min() - 3 * tol and a.max() <= b.max() + 3 * tol

    # integer color endpoints are inclusive on both sides, both stacks
    assert ref_color.min() == our_color.min() == 225
    assert ref_color.max() == our_color.max() == 255
    # all 6 jitter orders occur roughly uniformly in both
    import collections

    for orders in (ref_orders, our_orders):
        counts = collections.Counter(orders)
        assert len(counts) == 6
        assert min(counts.values()) > n / 6 * 0.8


# ----------------------------------------------------- (c) decoder parity


def _ref_decode(path):
    """The reference's decode: cv2.imread(IMREAD_UNCHANGED)/255 with the
    grayscale stack-to-3 it applies in data_loaders.py:194-196."""
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
    if img.ndim < 3:
        img = np.stack((img,) * 3, -1)
    return img


@pytest.mark.parametrize(
    "mode,fmt",
    [
        ("RGB", "png"),
        ("RGBA", "png"),
        ("L", "png"),
        ("P", "png"),
        ("P+tRNS", "png"),
        ("RGB", "jpeg"),
        ("L", "jpeg"),
    ],
)
def test_decoder_vs_cv2(tmp_path, mode, fmt):
    from PIL import Image

    from swinvox_tpu.data.pipeline import load_image_bgr

    rng = np.random.default_rng(hash((mode, fmt)) % 2**31)
    h, w = 37, 29
    if mode == "RGBA":
        arr = (rng.random((h, w, 4)) * 255).astype(np.uint8)
        im = Image.fromarray(arr, "RGBA")
    elif mode == "L":
        arr = (rng.random((h, w)) * 255).astype(np.uint8)
        im = Image.fromarray(arr, "L")
    elif mode.startswith("P"):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        im = Image.fromarray(arr, "RGB").quantize(64)
        if mode == "P+tRNS":
            im.info["transparency"] = 0
    else:
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        im = Image.fromarray(arr, "RGB")

    path = str(tmp_path / f"img.{fmt}")
    save_kwargs = {}
    if mode == "P+tRNS":
        save_kwargs["transparency"] = 0
    im.save(path, **save_kwargs)

    ours = load_image_bgr(path)
    theirs = _ref_decode(path)

    assert ours.shape == theirs.shape, (ours.shape, theirs.shape)
    assert ours.dtype == np.float32
    if fmt == "png":
        np.testing.assert_allclose(ours, theirs, atol=1e-6)
    else:
        # JPEG decoders may differ by a few IDCT rounding ULPs
        assert np.abs(ours - theirs).max() <= 3.0 / 255.0 + 1e-6
        assert np.abs(ours - theirs).mean() <= 0.5 / 255.0
