"""Cross-dataset loaders (Pix3D / Pascal3D): index building, bbox-guided
crops, and the eval path — driver BASELINE.json config 5."""

import numpy as np
import pytest

from swinvox_tpu.data.pipeline import build_loader
from swinvox_tpu.data.synthetic import (
    generate_pascal3d_dataset,
    generate_pix3d_dataset,
)
from swinvox_tpu.data.taxonomy import (
    DatasetType,
    Pascal3DIndex,
    Pix3DIndex,
)


@pytest.fixture(scope="module")
def pix3d_cfg(tmp_path_factory):
    return generate_pix3d_dataset(str(tmp_path_factory.mktemp("pix3d")), 4)


@pytest.fixture(scope="module")
def pascal_cfg(tmp_path_factory):
    return generate_pascal3d_dataset(str(tmp_path_factory.mktemp("p3d")), 4)


def test_pix3d_index(pix3d_cfg):
    index = Pix3DIndex(pix3d_cfg)
    recs = index.samples(DatasetType.TEST)
    assert len(recs) == 4
    r = recs[0]
    assert r.bounding_box is not None
    assert 0 <= r.bounding_box[0] < r.bounding_box[2] <= 1
    assert r.volume_path.endswith("model.binvox")
    # test-only dataset: VAL split maps to test (reference :379)
    assert len(index.samples(DatasetType.VAL)) == 4


def test_pix3d_loader_applies_bbox_crop(pix3d_cfg):
    cfg = pix3d_cfg
    cfg.CONST.NUM_WORKER = 2
    loader = build_loader(cfg, DatasetType.TEST, n_views=1, batch_size=2,
                          dataset_name="Pix3D")
    batches = list(loader)
    assert sum(b.images.shape[0] for b in batches) == 4
    b = batches[0]
    assert b.images.shape[1:] == (1, 224, 224, 3)
    assert b.volumes.shape[1:] == (32, 32, 32)
    assert np.isfinite(b.images).all()


def test_pascal3d_index_largest_bbox(pascal_cfg):
    index = Pascal3DIndex(pascal_cfg)
    recs = index.samples(DatasetType.TEST)
    assert len(recs) == 4
    r = recs[0]
    np.testing.assert_allclose(
        r.bounding_box, [30 / 240, 20 / 180, 210 / 240, 160 / 180]
    )
    assert r.volume_path.endswith(".binvox")


def test_pascal3d_loader(pascal_cfg):
    cfg = pascal_cfg
    cfg.CONST.NUM_WORKER = 2
    loader = build_loader(cfg, DatasetType.TEST, n_views=1, batch_size=1,
                          dataset_name="Pascal3D")
    batches = list(loader)
    assert len(batches) == 4
    assert batches[0].images.shape == (1, 1, 224, 224, 3)


def test_cross_dataset_eval_path(pix3d_cfg):
    """Full test_net on Pix3D with a Nano model: the reference's
    cross-dataset generalization eval (config 5)."""
    import copy

    from swinvox_tpu.train.trainer import test_net

    cfg = copy.deepcopy(pix3d_cfg)
    cfg.NETWORK.COMPUTE_DTYPE = "float32"
    cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
    cfg.NETWORK.USE_SWIN_T_MULTI_STAGE = False
    cfg.NETWORK.SWIN_T_STAGES = (3,)
    cfg.NETWORK.USE_CROSS_VIEW_ATTENTION = False
    cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
    cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)
    cfg.CONST.N_VIEWS_RENDERING = 1
    cfg.CONST.NUM_WORKER = 2
    iou = test_net(cfg)
    assert 0.0 <= iou <= 1.0
