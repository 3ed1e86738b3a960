"""Synthetic ShapeNet-format fixture generation.

Generates a dataset tree (taxonomy JSON + RGBA PNG renderings + 32^3 binvox
volumes) in the reference's on-disk layout, modeled on the role of
datasets/ShapeNet_aeroplane_category.json (the reference's smoke-test
subset).  Shapes are procedural solids and the renderings are shaded
orthographic projections of the ACTUAL volume from rotated viewpoints, so a
model trained on the fixture has real signal to learn — this powers unit
tests, the quickstart demo, and overfit smoke tests without the 30 GB
ShapeNet download.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional, Tuple

import numpy as np

from swinvox_tpu.config import Config
from swinvox_tpu.data import binvox


def _solid(rng: np.random.Generator, d: int = 32) -> np.ndarray:
    """A random procedural solid: union of 1-3 boxes/ellipsoids."""
    idx = np.arange(d)
    x, y, z = np.meshgrid(idx, idx, idx, indexing="ij")
    vol = np.zeros((d, d, d), bool)
    for _ in range(rng.integers(1, 4)):
        kind = rng.integers(0, 2)
        c = rng.uniform(d * 0.3, d * 0.7, size=3)
        r = rng.uniform(d * 0.12, d * 0.3, size=3)
        if kind == 0:  # ellipsoid
            vol |= (
                ((x - c[0]) / r[0]) ** 2
                + ((y - c[1]) / r[1]) ** 2
                + ((z - c[2]) / r[2]) ** 2
            ) < 1.0
        else:  # box
            vol |= (
                (np.abs(x - c[0]) < r[0])
                & (np.abs(y - c[1]) < r[1])
                & (np.abs(z - c[2]) < r[2])
            )
    return vol


def _rotate_z(vol: np.ndarray, angle: float) -> np.ndarray:
    """Nearest-neighbor rotation of the volume about the z axis."""
    d = vol.shape[0]
    c = (d - 1) / 2
    idx = np.arange(d) - c
    x, y = np.meshgrid(idx, idx, indexing="ij")
    cos, sin = np.cos(angle), np.sin(angle)
    xs = np.clip(np.round(cos * x - sin * y + c), 0, d - 1).astype(int)
    ys = np.clip(np.round(sin * x + cos * y + c), 0, d - 1).astype(int)
    return vol[xs, ys]  # advanced indexing over the first two axes


def render_view(vol: np.ndarray, angle: float, size: int = 137) -> np.ndarray:
    """Shaded orthographic projection -> RGBA uint8 [size, size, 4].

    Depth along the viewing axis gives shading; empty pixels get alpha 0
    (like ShapeNet renderings, consumed by RandomBackground's alpha key).
    """
    rotated = _rotate_z(vol, angle)
    d = vol.shape[0]
    depth_idx = np.arange(d)[None, None, :]
    hit = rotated.any(axis=2)
    first = np.where(
        hit, np.argmax(rotated, axis=2), d
    )  # first occupied depth
    shade = 1.0 - first / d  # nearer -> brighter
    img_small = np.zeros((d, d, 4), np.float32)
    img_small[..., 0] = shade * 0.9  # R
    img_small[..., 1] = shade * 0.7  # G
    img_small[..., 2] = shade * 0.5  # B
    img_small[..., 3] = hit.astype(np.float32)
    # upscale to render size (nearest is fine for a fixture)
    reps = size // d + 1
    big = np.kron(img_small, np.ones((reps, reps, 1), np.float32))
    off = (big.shape[0] - size) // 2
    big = big[off : off + size, off : off + size]
    return (np.clip(big, 0, 1) * 255).astype(np.uint8)


def generate_pix3d_dataset(
    root: str, n_samples: int = 4, seed: int = 0
) -> "Config":
    """Write a Pix3D-format fixture: img/<cat>/<name>.png, pix3d.json
    annotations with bboxes, model/<cat>/<model>/model.binvox."""
    from PIL import Image

    from swinvox_tpu.config import default_config

    rng = np.random.default_rng(seed)
    annotations = []
    taxonomy = [{"taxonomy_name": "chair", "train": [], "test": []}]
    for i in range(n_samples):
        name = f"{i:04d}"
        vol = _solid(rng)
        model_name = f"IKEA_{i:04d}"
        vpath = os.path.join(root, f"model/chair/{model_name}/model.binvox")
        os.makedirs(os.path.dirname(vpath), exist_ok=True)
        with open(vpath, "wb") as f:
            binvox.write(
                binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xyz"), f
            )
        img = render_view(vol, rng.uniform(0, 2 * np.pi), size=240)[..., :3]
        ipath = os.path.join(root, f"img/chair/{name}.png")
        os.makedirs(os.path.dirname(ipath), exist_ok=True)
        Image.fromarray(img, "RGB").save(ipath)
        annotations.append(
            {
                "img": f"img/chair/{name}.png",
                "img_size": [240, 240],
                "bbox": [40, 40, 200, 200],
                "voxel": f"model/chair/{model_name}/voxel.mat",
            }
        )
        taxonomy[0]["test"].append(name)
    with open(os.path.join(root, "pix3d.json"), "w") as f:
        json.dump(annotations, f)
    tax_path = os.path.join(root, "Pix3D.json")
    with open(tax_path, "w") as f:
        json.dump(taxonomy, f)

    cfg = default_config()
    cfg.DATASET.TEST_DATASET = "Pix3D"
    cfg.DATASETS.PIX3D.TAXONOMY_FILE_PATH = tax_path
    cfg.DATASETS.PIX3D.ANNOTATION_PATH = os.path.join(root, "pix3d.json")
    cfg.DATASETS.PIX3D.RENDERING_PATH = os.path.join(root, "img/%s/%s.%s")
    cfg.DATASETS.PIX3D.VOXEL_PATH = os.path.join(
        root, "model/%s/%s/%s.binvox"
    )
    return cfg


def generate_pascal3d_dataset(
    root: str, n_samples: int = 4, seed: int = 0
) -> "Config":
    """Write a Pascal3D-format fixture: JPEG images, .mat annotations with
    bbox + cad_index, CAD binvox volumes."""
    import scipy.io
    from PIL import Image

    from swinvox_tpu.config import default_config

    rng = np.random.default_rng(seed)
    taxonomy = [{"taxonomy_name": "aeroplane", "train": [], "test": []}]
    # two CAD models shared by the samples
    for cad in (1, 2):
        vol = _solid(rng)
        vpath = os.path.join(root, f"CAD/aeroplane/{cad:02d}.binvox")
        os.makedirs(os.path.dirname(vpath), exist_ok=True)
        with open(vpath, "wb") as f:
            binvox.write(
                binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xyz"), f
            )
    for i in range(n_samples):
        name = f"n{i:08d}"
        vol_idx = 1 + (i % 2)
        img = (rng.random((180, 240, 3)) * 255).astype(np.uint8)
        ipath = os.path.join(root, f"Images/aeroplane_imagenet/{name}.JPEG")
        os.makedirs(os.path.dirname(ipath), exist_ok=True)
        Image.fromarray(img, "RGB").save(ipath)
        apath = os.path.join(root, f"Annotations/aeroplane_imagenet/{name}.mat")
        os.makedirs(os.path.dirname(apath), exist_ok=True)
        record = {
            "imgsize": np.array([240, 180, 3]),
            "objects": {
                "cad_index": vol_idx,
                "bbox": np.array([30.0, 20.0, 210.0, 160.0]),
            },
        }
        scipy.io.savemat(apath, {"record": record})
        taxonomy[0]["test"].append(name)
    tax_path = os.path.join(root, "Pascal3D.json")
    with open(tax_path, "w") as f:
        json.dump(taxonomy, f)

    cfg = default_config()
    cfg.DATASET.TEST_DATASET = "Pascal3D"
    cfg.DATASETS.PASCAL3D.TAXONOMY_FILE_PATH = tax_path
    cfg.DATASETS.PASCAL3D.ANNOTATION_PATH = os.path.join(
        root, "Annotations/%s_imagenet/%s.mat"
    )
    cfg.DATASETS.PASCAL3D.RENDERING_PATH = os.path.join(
        root, "Images/%s_imagenet/%s.JPEG"
    )
    cfg.DATASETS.PASCAL3D.VOXEL_PATH = os.path.join(root, "CAD/%s/%02d.binvox")
    return cfg


def generate_dataset(
    root: str,
    n_samples_per_split: Tuple[int, int, int] = (8, 2, 2),
    n_views: int = 6,
    categories: Optional[List[Tuple[str, str]]] = None,
    seed: int = 0,
) -> Config:
    """Write a ShapeNet-format tree under `root`; returns a Config whose
    ShapeNet paths point at it."""
    from PIL import Image

    categories = categories or [("02691156", "aeroplane")]
    rng = np.random.default_rng(seed)
    taxonomy = []
    rendering_tpl = os.path.join(root, "ShapeNetRendering/%s/%s/rendering/%02d.png")
    volume_tpl = os.path.join(root, "ShapeNetVox32/%s/%s/model.binvox")

    for tid, tname in categories:
        splits = {"train": [], "val": [], "test": []}
        for split, count in zip(("train", "val", "test"), n_samples_per_split):
            for i in range(count):
                sample = f"{split}_{i:04d}"
                splits[split].append(sample)
                vol = _solid(rng)
                vpath = volume_tpl % (tid, sample)
                os.makedirs(os.path.dirname(vpath), exist_ok=True)
                with open(vpath, "wb") as f:
                    binvox.write(
                        binvox.Voxels(vol, [32, 32, 32], [0.0, 0.0, 0.0], 1.0, "xyz"),
                        f,
                    )
                for v in range(n_views):
                    angle = 2 * np.pi * v / n_views
                    img = render_view(vol, angle)
                    ipath = rendering_tpl % (tid, sample, v)
                    os.makedirs(os.path.dirname(ipath), exist_ok=True)
                    Image.fromarray(img, "RGBA").save(ipath)
        taxonomy.append(
            {
                "taxonomy_id": tid,
                "taxonomy_name": tname,
                "baseline": {"1-view": 0.513, "2-view": 0.536, "3-view": 0.549,
                             "4-view": 0.556, "5-view": 0.561},
                **splits,
            }
        )

    tax_path = os.path.join(root, "taxonomy.json")
    with open(tax_path, "w") as f:
        json.dump(taxonomy, f)

    from swinvox_tpu.config import default_config

    cfg = default_config()
    cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH = tax_path
    cfg.DATASETS.SHAPENET.RENDERING_PATH = rendering_tpl
    cfg.DATASETS.SHAPENET.VOXEL_PATH = volume_tpl
    return cfg
