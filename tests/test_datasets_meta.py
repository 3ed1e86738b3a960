"""The vendored official split metadata (datasets/*.json).

Reference ships these at /root/reference/datasets/ and consumes them at
utils/data_loaders.py:102; the published baselines are defined on exactly
these sample-ID lists, so the counts are pinned here.
"""

import json
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, "datasets", name)
    if not os.path.exists(path):
        pytest.fail(f"missing vendored split file {name}")
    with open(path) as f:
        return json.load(f)


def test_shapenet_official_split_counts():
    tax = _load("ShapeNet.json")
    assert len(tax) == 13
    assert sum(len(t.get("train", [])) for t in tax) == 30643
    assert sum(len(t.get("val", [])) for t in tax) == 4371
    assert sum(len(t.get("test", [])) for t in tax) == 8770
    aero = next(t for t in tax if t["taxonomy_id"] == "02691156")
    assert aero["taxonomy_name"] == "aeroplane"
    assert aero["baseline"]["1-view"] == pytest.approx(0.513)
    assert aero["baseline"]["5-view"] == pytest.approx(0.561)


def test_other_split_files_parse():
    assert len(_load("ShapeNet_aeroplane_category.json")) == 1
    pascal = _load("Pascal3D.json")
    assert len(pascal) == 12
    pix = _load("Pix3D.json")
    assert all("test" in t for t in pix)


def test_default_config_taxonomy_path_resolves():
    from swinvox_tpu import default_config
    from swinvox_tpu.data.taxonomy import DATASET_INDEX_MAPPING

    cfg = default_config()
    # the default ./datasets/ShapeNet.json must resolve from the repo root
    path = cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH
    assert os.path.exists(os.path.join(REPO, path)), path
    cwd = os.getcwd()
    os.chdir(REPO)
    try:
        info = DATASET_INDEX_MAPPING["ShapeNet"](cfg).taxonomy_info()
    finally:
        os.chdir(cwd)
    assert len(info) == 13
    assert info["02691156"].baselines["3-view"] == pytest.approx(0.549)


def test_taxonomy_resolves_from_any_cwd(tmp_path):
    """resolve_data_path falls back to swinvox_tpu.datasets package data
    when the cwd-relative ./datasets/*.json does not exist (installed
    console scripts run outside a repo checkout — ADVICE r2)."""
    from swinvox_tpu import default_config
    from swinvox_tpu.config import resolve_data_path
    from swinvox_tpu.data.taxonomy import DATASET_INDEX_MAPPING

    cfg = default_config()
    cwd = os.getcwd()
    os.chdir(tmp_path)  # no ./datasets here
    try:
        resolved = resolve_data_path(cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH)
        assert os.path.isabs(resolved) and os.path.exists(resolved)
        info = DATASET_INDEX_MAPPING["ShapeNet"](cfg).taxonomy_info()
    finally:
        os.chdir(cwd)
    assert len(info) == 13
    # an existing custom path passes through untouched
    custom = tmp_path / "my.json"
    custom.write_text("[]")
    assert resolve_data_path(str(custom)) == str(custom)
