"""Offline tooling tests: taxonomy builder, dataset analyzer, converter,
visualization."""

import json
import os

import numpy as np
import pytest


def test_make_taxonomy_deterministic_split(tmp_path):
    from swinvox_tpu.data.make_taxonomy import build_taxonomy, main

    root = tmp_path / "ShapeNetVox32"
    for cat in ("02691156", "03001627"):
        for i in range(30):
            os.makedirs(root / cat / f"model_{i:04d}")

    tax1 = build_taxonomy(str(root))
    tax2 = build_taxonomy(str(root))
    assert tax1 == tax2  # hash split is deterministic
    assert {t["taxonomy_name"] for t in tax1} == {"aeroplane", "chair"}
    for t in tax1:
        total = len(t["train"]) + len(t["val"]) + len(t["test"])
        assert total == 30
        assert len(t["train"]) > len(t["test"]) > 0
        assert t["baseline"]["1-view"] > 0
    # CLI writes a loadable file
    out = tmp_path / "tax.json"
    assert main([str(root), "--out", str(out)]) == 0
    with open(out) as f:
        assert len(json.load(f)) == 2


def test_dataset_analyzer(tmp_path, rng):
    from PIL import Image

    from swinvox_tpu.utils.dataset_analyzer import compute_mean_std

    for i in range(4):
        arr = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(tmp_path / f"img_{i}.png")
    mean, std = compute_mean_std(str(tmp_path))
    assert mean.shape == (3,) and std.shape == (3,)
    assert 0.2 < mean.mean() < 0.8  # uniform pixels -> mean ~0.5


def test_off_voxelizer(tmp_path):
    """Pure-Python fallback voxelizer: a unit cube fills the grid center."""
    from swinvox_tpu.data import binvox
    from swinvox_tpu.utils.binvox_converter import convert

    off = tmp_path / "cube.off"
    off.write_text(
        "OFF\n8 12 0\n"
        "0 0 0\n1 0 0\n1 1 0\n0 1 0\n0 0 1\n1 0 1\n1 1 1\n0 1 1\n"
        "3 0 1 2\n3 0 2 3\n3 4 6 5\n3 4 7 6\n"
        "3 0 4 5\n3 0 5 1\n3 1 5 6\n3 1 6 2\n"
        "3 2 6 7\n3 2 7 3\n3 3 7 4\n3 3 4 0\n"
    )
    out = tmp_path / "cube.binvox"
    convert(str(off), str(out), d=16, binvox_binary="/nonexistent")
    with open(out, "rb") as f:
        vol = binvox.read_as_3d_array(f).data
    frac = vol.mean()
    assert 0.5 < frac <= 1.0  # solid cube fills most of the padded grid
    assert vol[8, 8, 8]  # center occupied


def test_volume_views_render(tmp_path, rng):
    from swinvox_tpu.utils.visualization import get_volume_views

    vol = (rng.random((16, 16, 16)) < 0.1).astype(np.float32)
    img = get_volume_views(vol, str(tmp_path), "GV", 0, 1)
    assert img.ndim == 3 and img.shape[0] == 3  # CHW
    assert os.path.exists(tmp_path / "GV-e001-s00.png")
