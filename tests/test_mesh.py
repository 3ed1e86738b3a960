"""Light mesh-utility tests (no model compiles): device selection,
mesh shapes, sharding guards."""

import jax
import numpy as np
import pytest

from swinvox_tpu.config import default_config
from swinvox_tpu.parallel.mesh import (
    build_mesh,
    select_devices,
    shard_batch_views,
)


def test_select_devices_parses_spec():
    devs = jax.devices()
    assert select_devices("") == devs
    assert select_devices(None) == devs
    assert select_devices("0") == [devs[0]]
    assert select_devices("0,2") == [devs[0], devs[2]]
    with pytest.raises(ValueError, match="out of range"):
        select_devices("99")
    with pytest.raises(ValueError, match="comma-separated"):
        select_devices("a,b")


def test_build_mesh_respects_device_select():
    """--gpu N restricts the mesh like CUDA_VISIBLE_DEVICES does for the
    reference (runner.py:74-75)."""
    cfg = default_config()
    cfg.CONST.DEVICE_SELECT = "0,1"
    mesh = build_mesh(cfg)
    assert mesh.devices.size == 2
    cfg.CONST.DEVICE_SELECT = ""
    assert build_mesh(cfg).devices.size == len(jax.devices())
    # explicit devices= wins over the config selector
    cfg.CONST.DEVICE_SELECT = "0"
    assert build_mesh(cfg, devices=jax.devices()[:4]).devices.size == 4


def test_shard_batch_views_divisibility_enforced():
    """n_views % model != 0 must be a loud error, not silent padding."""
    cfg = default_config()
    cfg.PARALLEL.MODEL_PARALLEL = 2
    mesh = build_mesh(cfg, devices=jax.devices()[:4])
    assert mesh.shape["model"] == 2
    batch_bad = {
        "images": np.zeros((2, 3, 8, 8, 3), np.float32),  # 3 views % 2 != 0
        "volumes": np.zeros((2, 4, 4, 4), np.float32),
    }
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch_views(batch_bad, mesh)
    batch_ok = {
        "images": np.zeros((2, 4, 8, 8, 3), np.float32),
        "volumes": np.zeros((2, 4, 4, 4), np.float32),
    }
    out = shard_batch_views(batch_ok, mesh)
    assert out["images"].shape == (2, 4, 8, 8, 3)
