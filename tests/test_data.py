"""Data pipeline tests: synthetic fixture -> index -> loader -> batches,
plus transform semantics checks against the reference's math."""

import numpy as np
import pytest

from swinvox_tpu.data import transforms
from swinvox_tpu.data.pipeline import BatchLoader, VoxelDataset, build_loader
from swinvox_tpu.data.synthetic import generate_dataset
from swinvox_tpu.data.taxonomy import DatasetType, ShapeNetIndex


@pytest.fixture(scope="module")
def fixture_cfg(tmp_path_factory):
    root = tmp_path_factory.mktemp("shapenet_fixture")
    return generate_dataset(str(root), n_samples_per_split=(6, 2, 2), n_views=4)


def test_index_collects_all_samples(fixture_cfg):
    index = ShapeNetIndex(fixture_cfg)
    assert len(index.samples(DatasetType.TRAIN)) == 6
    assert len(index.samples(DatasetType.VAL)) == 2
    assert len(index.samples(DatasetType.TEST)) == 2
    info = index.taxonomy_info()
    assert "02691156" in info
    assert info["02691156"].baselines["1-view"] == 0.513


def test_index_skips_missing_volume(fixture_cfg, tmp_path):
    import os

    index = ShapeNetIndex(fixture_cfg)
    rec = index.samples(DatasetType.VAL)[0]
    os.rename(rec.volume_path, rec.volume_path + ".bak")
    try:
        remaining = ShapeNetIndex(fixture_cfg).samples(DatasetType.VAL)
        assert len(remaining) == 1
    finally:
        os.rename(rec.volume_path + ".bak", rec.volume_path)


def test_train_loader_batches(fixture_cfg):
    cfg = fixture_cfg
    cfg.CONST.NUM_WORKER = 2
    loader = build_loader(cfg, DatasetType.TRAIN, n_views=3, batch_size=2)
    batches = list(loader)
    assert len(batches) == 3  # 6 samples / bs 2, drop_last
    b = batches[0]
    assert b.images.shape == (2, 3, 224, 224, 3)
    assert b.images.dtype == np.float32
    assert b.volumes.shape == (2, 32, 32, 32)
    assert set(np.unique(b.volumes)) <= {0.0, 1.0}
    # normalized to ~[-1, 1]
    assert b.images.min() >= -1.5 and b.images.max() <= 1.5


def test_loader_shuffle_is_seeded_and_epoch_varies(fixture_cfg):
    cfg = fixture_cfg
    cfg.CONST.NUM_WORKER = 2
    mk = lambda: build_loader(cfg, DatasetType.TRAIN, n_views=1, batch_size=2, seed=7)
    l1, l2 = mk(), mk()
    names1 = [n for b in l1 for n in b.sample_names]
    names2 = [n for b in l2 for n in b.sample_names]
    assert names1 == names2  # deterministic given seed+epoch
    l2.set_epoch(1)
    names3 = [n for b in l2 for n in b.sample_names]
    assert names1 != names3  # reshuffled across epochs


def test_eval_loader_deterministic_views(fixture_cfg):
    cfg = fixture_cfg
    cfg.CONST.NUM_WORKER = 2
    loader = build_loader(cfg, DatasetType.VAL, n_views=2, batch_size=1)
    b1 = [b.images for b in loader]
    b2 = [b.images for b in loader]
    for a, b in zip(b1, b2):
        np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------ transforms


def test_center_crop_128_then_resize(rng):
    imgs = rng.random((2, 137, 137, 4), dtype=np.float32)
    out = transforms.crop_images(imgs, (224, 224), (128, 128))
    assert out.shape == (2, 224, 224, 4)
    # small image: passthrough + resize
    small = rng.random((1, 100, 90, 3), dtype=np.float32)
    out2 = transforms.crop_images(small, (224, 224), (128, 128))
    assert out2.shape == (1, 224, 224, 3)


def test_bbox_crop_edge_padding(rng):
    imgs = rng.random((1, 100, 100, 3), dtype=np.float32)
    # bbox near the corner forces out-of-image padding
    bbox = [0.0, 0.0, 0.3, 0.9]
    out = transforms.crop_images(imgs, (64, 64), (128, 128), bbox)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(out).all()


def test_random_background_composites_only_alpha0(rng):
    imgs = np.zeros((2, 8, 8, 4), np.float32)
    imgs[..., :3] = 0.25
    imgs[0, :4, :, 3] = 1.0  # top half of view 0 is foreground
    out = transforms.random_background(
        imgs, [[225, 255], [225, 255], [225, 255]], rng
    )
    assert out.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(out[0, :4], 0.25)  # foreground untouched
    assert out[0, 4:].min() >= 225 / 255.0  # background recolored
    # 3-channel input is a no-op
    rgb = rng.random((2, 8, 8, 3), dtype=np.float32)
    np.testing.assert_array_equal(
        transforms.random_background(rgb, [[0, 255]] * 3, rng), rgb
    )


def test_color_jitter_matches_reference_math(rng):
    """Brightness-only jitter == alpha * img (reference blend with 0)."""
    imgs = rng.random((2, 6, 6, 3), dtype=np.float32)
    r1 = np.random.default_rng(3)
    out = transforms.color_jitter(imgs, 0.5, 0.0, 0.0, r1)
    # reproduce the draws with the same generator sequence
    r2 = np.random.default_rng(3)
    b = 1.0 + r2.uniform(-0.5, 0.5)
    _c = 1.0 + r2.uniform(0.0, 0.0)
    _s = 1.0 + r2.uniform(0.0, 0.0)
    np.testing.assert_allclose(out, b * imgs, rtol=1e-5)


def test_random_noise_shared_across_views(rng):
    imgs = np.zeros((3, 4, 4, 3), np.float32)
    out = transforms.random_noise(imgs, 0.1, rng)
    # same offset everywhere per channel, shared across views
    for c in range(3):
        assert np.unique(out[..., c]).size == 1
    assert not np.allclose(out, 0)


def test_random_flip_per_view(rng):
    imgs = np.arange(2 * 4 * 4 * 3, dtype=np.float32).reshape(2, 4, 4, 3)
    flipped_any = False
    for seed in range(10):
        out = transforms.random_flip(imgs, np.random.default_rng(seed))
        for i in range(2):
            same = np.array_equal(out[i], imgs[i])
            rev = np.array_equal(out[i], imgs[i, :, ::-1])
            assert same or rev
            flipped_any |= rev
    assert flipped_any


def test_random_permute_shared(rng):
    imgs = rng.random((2, 4, 4, 3), dtype=np.float32)
    out = transforms.random_permute_channels(imgs, np.random.default_rng(1))
    # some permutation of channels, identical across views
    matched = 0
    for perm in [(0, 1, 2), (0, 2, 1), (1, 0, 2), (1, 2, 0), (2, 0, 1), (2, 1, 0)]:
        if np.array_equal(out, imgs[..., list(perm)]):
            matched += 1
    assert matched == 1


def test_resize_matches_torch_bilinear(rng):
    import torch
    import torch.nn.functional as F

    img = rng.random((137, 137, 3), dtype=np.float32)
    out = transforms.resize_bilinear_np(img, 224, 224)
    t = torch.from_numpy(img.transpose(2, 0, 1))[None]
    expected = (
        F.interpolate(t, size=(224, 224), mode="bilinear", align_corners=False)
        .numpy()[0]
        .transpose(1, 2, 0)
    )
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


def test_multihost_sharded_batches(fixture_cfg):
    """Two simulated hosts' batches partition the global batch exactly."""
    from swinvox_tpu.data.pipeline import BatchLoader, VoxelDataset
    from swinvox_tpu.data.taxonomy import DatasetType, ShapeNetIndex

    cfg = fixture_cfg
    index = ShapeNetIndex(cfg)
    records = index.samples(DatasetType.TRAIN)
    mk = lambda shard: BatchLoader(
        VoxelDataset(records, DatasetType.TRAIN, 1, cfg, train_augment=False),
        batch_size=4, shuffle=True, drop_last=True, num_workers=2, seed=3,
        shard_index=shard, shard_count=2,
    )
    full = BatchLoader(
        VoxelDataset(records, DatasetType.TRAIN, 1, cfg, train_augment=False),
        batch_size=4, shuffle=True, drop_last=True, num_workers=2, seed=3,
    )
    names0 = [b.sample_names for b in mk(0)]
    names1 = [b.sample_names for b in mk(1)]
    names_full = [b.sample_names for b in full]
    assert len(names0) == len(names1) == len(names_full)
    for a, b, f in zip(names0, names1, names_full):
        assert a + b == f  # host slices concatenate to the global batch
        assert len(a) == len(b) == 2

    import pytest

    with pytest.raises(ValueError):
        BatchLoader(
            VoxelDataset(records, DatasetType.TRAIN, 1, cfg, train_augment=False),
            batch_size=5, shuffle=False, drop_last=True, shard_count=2,
        )


def test_random_background_with_image(rng):
    imgs = np.zeros((4, 8, 8, 4), np.float32)
    imgs[..., 3] = 0.0  # all background
    bg = np.full((16, 16, 3), 0.5, np.float32)
    out = transforms.random_background(
        imgs, [[0, 0], [0, 0], [0, 0]], np.random.default_rng(0), bg_image=bg
    )
    assert out.shape == (4, 8, 8, 3)
    # across several views, some must use the image (0.5) and some the
    # solid color (0.0)
    means = out.mean(axis=(1, 2, 3))
    assert (np.isclose(means, 0.5)).any() and (np.isclose(means, 0.0)).any()


def test_loader_with_bg_path(fixture_cfg, tmp_path):
    import copy

    from PIL import Image

    cfg = copy.deepcopy(fixture_cfg)
    bg_dir = tmp_path / "bg"
    bg_dir.mkdir()
    Image.fromarray((np.random.rand(32, 32, 3) * 255).astype(np.uint8)).save(
        bg_dir / "bg0.png"
    )
    cfg.DIR.RANDOM_BG_PATH = str(bg_dir)
    cfg.CONST.NUM_WORKER = 2
    loader = build_loader(cfg, DatasetType.TRAIN, n_views=1, batch_size=2)
    b = next(iter(loader))
    assert b.images.shape == (2, 1, 224, 224, 3)
    assert np.isfinite(b.images).all()


# ------------------------------------------------------ device augment


def test_device_augment_matches_host_transform(rng):
    """data/device_augment.py == transforms.train_transform for the same
    rng stream: the folded affine color map, MXU resize, background
    composite and flips reproduce the host pipeline to f32 rounding."""
    import jax.numpy as jnp

    from swinvox_tpu.config import default_config
    from swinvox_tpu.data import transforms as tr
    from swinvox_tpu.data.device_augment import device_train_augment

    cfg = default_config()
    for seed in range(4):
        imgs = rng.random((3, 137, 137, 4)).astype(np.float32)
        imgs[..., 3] = (imgs[..., 3] > 0.4) * rng.random((3, 137, 137))
        host = tr.train_transform(
            imgs.copy(), cfg, np.random.default_rng(seed)
        )
        p = tr.draw_train_params(
            cfg, np.random.default_rng(seed), 3, has_alpha=True
        )
        dev = device_train_augment(
            jnp.asarray(imgs)[None],
            jnp.asarray(p["bg_color"])[None],
            jnp.asarray(p["color_A"])[None],
            jnp.asarray(p["color_B"])[None],
            jnp.asarray(p["color_v"])[None],
            jnp.asarray(p["flips"])[None],
        )
        np.testing.assert_allclose(
            np.asarray(dev[0]), host, atol=3e-4, rtol=1e-4
        )


def test_device_augment_loader_end_to_end(fixture_cfg):
    """TRAIN.DEVICE_AUGMENT loader ships raw pixels + params whose
    on-device application equals the host-augmented loader batch
    (same seed/epoch -> same per-sample rng streams)."""
    import copy

    import jax.numpy as jnp

    from swinvox_tpu.data.device_augment import device_train_augment

    cfg = copy.deepcopy(fixture_cfg)
    cfg.CONST.NUM_WORKER = 2
    host_loader = build_loader(cfg, DatasetType.TRAIN, n_views=2, batch_size=2)
    cfg.TRAIN.DEVICE_AUGMENT = True
    raw_loader = build_loader(cfg, DatasetType.TRAIN, n_views=2, batch_size=2)

    hb = next(iter(host_loader))
    rb = next(iter(raw_loader))
    assert rb.aug is not None
    assert rb.images.shape[2:] == (137, 137, 4)  # raw RGBA renders
    assert rb.images.dtype == np.uint8  # 4x-smaller device transfer
    assert rb.sample_names == hb.sample_names
    out = device_train_augment(
        jnp.asarray(rb.images),
        jnp.asarray(rb.aug["bg_color"]),
        jnp.asarray(rb.aug["color_A"]),
        jnp.asarray(rb.aug["color_B"]),
        jnp.asarray(rb.aug["color_v"]),
        jnp.asarray(rb.aug["flips"]),
        cfg.CONST.IMG_H,
        cfg.CONST.CROP_IMG_H,
    )
    np.testing.assert_allclose(
        np.asarray(out), hb.images, atol=3e-4, rtol=1e-4
    )


def test_device_augment_eval_matches_host(rng):
    """Eval pipeline on-device (crop/background/normalize via eval
    params) == transforms.eval_transform for the same rng stream."""
    import jax.numpy as jnp

    from swinvox_tpu.config import default_config
    from swinvox_tpu.data import transforms as tr
    from swinvox_tpu.data.device_augment import device_train_augment

    cfg = default_config()
    imgs = rng.random((2, 137, 137, 4)).astype(np.float32)
    imgs[..., 3] = (imgs[..., 3] > 0.4) * rng.random((2, 137, 137))
    host = tr.eval_transform(imgs.copy(), cfg, np.random.default_rng(7))
    p = tr.draw_eval_params(
        cfg, np.random.default_rng(7), 2, has_alpha=True
    )
    dev = device_train_augment(
        jnp.asarray(imgs)[None],
        jnp.asarray(p["bg_color"])[None],
        jnp.asarray(p["color_A"])[None],
        jnp.asarray(p["color_B"])[None],
        jnp.asarray(p["color_v"])[None],
        jnp.asarray(p["flips"])[None],
    )
    np.testing.assert_allclose(
        np.asarray(dev[0]), host, atol=3e-4, rtol=1e-4
    )


def test_device_augment_under_mesh(rng):
    """device_train_augment composes with GSPMD: a batch sharded over the
    data axis produces the single-device result."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding
    from jax.sharding import PartitionSpec as P

    from swinvox_tpu.config import default_config
    from swinvox_tpu.data import transforms as tr
    from swinvox_tpu.data.device_augment import device_train_augment_jit

    if len(jax.devices()) < 8:
        import pytest

        pytest.skip("needs 8 virtual devices")
    cfg = default_config()
    imgs = np.round(
        rng.random((8, 2, 137, 137, 4)) * 255
    ).astype(np.uint8)
    params = [
        tr.draw_train_params(cfg, np.random.default_rng(i), 2, True)
        for i in range(8)
    ]
    stacked = {
        k: np.stack([p[k] for p in params]) for k in params[0]
    }
    args = (
        jnp.asarray(imgs),
        jnp.asarray(stacked["bg_color"]),
        jnp.asarray(stacked["color_A"]),
        jnp.asarray(stacked["color_B"]),
        jnp.asarray(stacked["color_v"]),
        jnp.asarray(stacked["flips"]),
    )
    ref = np.asarray(device_train_augment_jit(*args))
    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("data", "model"))
    sharded = tuple(
        jax.device_put(a, NamedSharding(mesh, P("data")))
        for a in args
    )
    with mesh:
        got = np.asarray(device_train_augment_jit(*sharded))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_device_augment_bg_path_falls_back_to_host(fixture_cfg, tmp_path):
    """TRAIN.DEVICE_AUGMENT + DIR.RANDOM_BG_PATH (a host-only feature)
    must fall back to host augmentation, not crash (review round 3)."""
    import copy

    from PIL import Image

    cfg = copy.deepcopy(fixture_cfg)
    bg_dir = tmp_path / "bgs"
    bg_dir.mkdir()
    Image.fromarray(
        (np.random.default_rng(0).random((32, 32, 3)) * 255).astype(np.uint8)
    ).save(str(bg_dir / "bg.png"))
    cfg.DIR.RANDOM_BG_PATH = str(bg_dir)
    cfg.TRAIN.DEVICE_AUGMENT = True
    cfg.CONST.NUM_WORKER = 2
    loader = build_loader(cfg, DatasetType.TRAIN, n_views=2, batch_size=2)
    b = next(iter(loader))
    assert b.aug is None  # host path
    assert b.images.shape[2:] == (224, 224, 3)
    assert b.images.dtype == np.float32
