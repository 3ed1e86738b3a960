"""Dataset indexes: scan taxonomy JSONs + filesystem into sample records.

Replicates the index-building semantics of reference utils/data_loaders.py:
  * ShapeNet (reference :95-161): per-taxonomy sample lists from the JSON,
    %-template paths, skip samples whose volume or all of whose renderings
    are missing, count views by listing the rendering folder.
  * Pascal3D (reference :209-296): .mat annotations, largest-area bbox
    object selected, bbox normalized to fractions, CAD-index volume path.
  * Pix3D (reference :344-426): pix3d.json annotations keyed by image path,
    bbox normalized, voxel path derived from the annotation's model path.

Records are plain dataclasses; decoding/augmentation happen elsewhere.
"""

from __future__ import annotations

import json
import logging
import os
from dataclasses import dataclass, field
from enum import Enum, unique
from typing import Dict, List, Optional, Sequence, Tuple

from swinvox_tpu.config import Config, resolve_data_path

log = logging.getLogger(__name__)


@unique
class DatasetType(Enum):
    TRAIN = 0
    TEST = 1
    VAL = 2


@dataclass
class SampleRecord:
    taxonomy_id: str
    taxonomy_name: str
    sample_name: str
    image_paths: List[str]
    volume_path: str
    bounding_box: Optional[List[float]] = None  # normalized [x0,y0,x1,y1]


@dataclass
class TaxonomyInfo:
    taxonomy_id: str
    taxonomy_name: str
    baselines: Dict[str, float] = field(default_factory=dict)


class ShapeNetIndex:
    """Index over a ShapeNet-format tree (taxonomy JSON + path templates)."""

    def __init__(self, cfg: Config):
        self.rendering_tpl = cfg.DATASETS.SHAPENET.RENDERING_PATH
        self.volume_tpl = cfg.DATASETS.SHAPENET.VOXEL_PATH
        with open(
            resolve_data_path(cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH),
            encoding="utf-8",
        ) as f:
            self.taxonomies = json.load(f)

    def taxonomy_info(self) -> Dict[str, TaxonomyInfo]:
        return {
            t["taxonomy_id"]: TaxonomyInfo(
                t["taxonomy_id"], t["taxonomy_name"], t.get("baseline", {})
            )
            for t in self.taxonomies
        }

    def samples(self, split: DatasetType) -> List[SampleRecord]:
        key = {
            DatasetType.TRAIN: "train",
            DatasetType.TEST: "test",
            DatasetType.VAL: "val",
        }[split]
        records: List[SampleRecord] = []
        for taxonomy in self.taxonomies:
            tid = taxonomy["taxonomy_id"]
            for sample_name in taxonomy.get(key, []):
                volume_path = self.volume_tpl % (tid, sample_name)
                if not os.path.exists(volume_path):
                    log.warning(
                        "Ignore sample %s/%s: volume file missing", tid, sample_name
                    )
                    continue
                folder = os.path.dirname(self.rendering_tpl % (tid, sample_name, 0))
                try:
                    total_views = len(os.listdir(folder))
                except FileNotFoundError:
                    total_views = 0
                image_paths = []
                for i in range(total_views):
                    p = self.rendering_tpl % (tid, sample_name, i)
                    if os.path.exists(p):
                        image_paths.append(p)
                if not image_paths:
                    log.warning(
                        "Ignore sample %s/%s: no rendering images", tid, sample_name
                    )
                    continue
                records.append(
                    SampleRecord(
                        taxonomy_id=tid,
                        taxonomy_name=taxonomy["taxonomy_name"],
                        sample_name=sample_name,
                        image_paths=image_paths,
                        volume_path=volume_path,
                    )
                )
        log.info("Collected %d samples for split %s", len(records), key)
        return records


class Pascal3DIndex:
    """Index over PASCAL3D: one image per sample, bbox-guided crops."""

    def __init__(self, cfg: Config):
        self.volume_tpl = cfg.DATASETS.PASCAL3D.VOXEL_PATH
        self.annotation_tpl = cfg.DATASETS.PASCAL3D.ANNOTATION_PATH
        self.rendering_tpl = cfg.DATASETS.PASCAL3D.RENDERING_PATH
        with open(
            resolve_data_path(cfg.DATASETS.PASCAL3D.TAXONOMY_FILE_PATH),
            encoding="utf-8",
        ) as f:
            self.taxonomies = json.load(f)

    def taxonomy_info(self) -> Dict[str, TaxonomyInfo]:
        return {
            t["taxonomy_name"]: TaxonomyInfo(
                t["taxonomy_name"], t["taxonomy_name"], t.get("baseline", {})
            )
            for t in self.taxonomies
        }

    def samples(self, split: DatasetType) -> List[SampleRecord]:
        import scipy.io

        key = "train" if split == DatasetType.TRAIN else "test"
        records: List[SampleRecord] = []
        for taxonomy in self.taxonomies:
            tname = taxonomy["taxonomy_name"]
            for sample_name in taxonomy.get(key, []):
                image_path = self.rendering_tpl % (tname, sample_name)
                anno_path = self.annotation_tpl % (tname, sample_name)
                try:
                    mat = scipy.io.loadmat(
                        anno_path, squeeze_me=True, struct_as_record=False
                    )
                except FileNotFoundError:
                    log.warning("Ignore %s/%s: annotation missing", tname, sample_name)
                    continue
                record = mat["record"]
                img_w, img_h = record.imgsize[0], record.imgsize[1]
                objects = record.objects
                # pick the largest-area bbox object (reference :258-277)
                import numpy as np

                if isinstance(objects, np.ndarray):
                    best_area, bbox, cad_index = -1.0, None, -1
                    for obj in objects:
                        bb = obj.__dict__["bbox"]
                        area = (bb[2] - bb[0]) * (bb[3] - bb[1])
                        if area > best_area:
                            best_area, bbox, cad_index = area, bb, obj.cad_index
                else:
                    bbox, cad_index = objects.bbox, objects.cad_index
                bbox = [
                    bbox[0] / img_w,
                    bbox[1] / img_h,
                    bbox[2] / img_w,
                    bbox[3] / img_h,
                ]
                volume_path = self.volume_tpl % (tname, cad_index)
                if not os.path.exists(volume_path):
                    log.warning("Ignore %s/%s: volume missing", tname, sample_name)
                    continue
                records.append(
                    SampleRecord(
                        taxonomy_id=tname,
                        taxonomy_name=tname,
                        sample_name=sample_name,
                        image_paths=[image_path],
                        volume_path=volume_path,
                        bounding_box=bbox,
                    )
                )
        log.info("Collected %d samples for split %s", len(records), key)
        return records


class Pix3DIndex:
    """Index over Pix3D (test-only in the reference)."""

    def __init__(self, cfg: Config):
        self.volume_tpl = cfg.DATASETS.PIX3D.VOXEL_PATH
        self.rendering_tpl = cfg.DATASETS.PIX3D.RENDERING_PATH
        with open(
            resolve_data_path(cfg.DATASETS.PIX3D.TAXONOMY_FILE_PATH),
            encoding="utf-8",
        ) as f:
            self.taxonomies = json.load(f)
        with open(cfg.DATASETS.PIX3D.ANNOTATION_PATH, encoding="utf-8") as f:
            annotations = json.load(f)
        self.annotations = {}
        for anno in annotations:
            filename, _ = os.path.splitext(anno["img"])
            self.annotations[filename[4:]] = anno  # strip 'img/' prefix

    def taxonomy_info(self) -> Dict[str, TaxonomyInfo]:
        return {
            t["taxonomy_name"]: TaxonomyInfo(
                t["taxonomy_name"], t["taxonomy_name"], t.get("baseline", {})
            )
            for t in self.taxonomies
        }

    def samples(self, split: DatasetType) -> List[SampleRecord]:
        key = "train" if split == DatasetType.TRAIN else "test"
        records: List[SampleRecord] = []
        for taxonomy in self.taxonomies:
            tname = taxonomy["taxonomy_name"]
            for sample_name in taxonomy.get(key, []):
                anno = self.annotations.get(f"{tname}/{sample_name}")
                if anno is None:
                    continue
                _, suffix = os.path.splitext(anno["img"])
                image_path = self.rendering_tpl % (tname, sample_name, suffix[1:])
                img_w, img_h = anno["img_size"]
                bbox = [
                    anno["bbox"][0] / img_w,
                    anno["bbox"][1] / img_h,
                    anno["bbox"][2] / img_w,
                    anno["bbox"][3] / img_h,
                ]
                parts = anno["voxel"].split("/")
                model_name = parts[2]
                volume_file = parts[3][:-4].replace("voxel", "model")
                volume_path = self.volume_tpl % (tname, model_name, volume_file)
                if not os.path.exists(volume_path):
                    log.warning("Ignore %s/%s: volume missing", tname, sample_name)
                    continue
                records.append(
                    SampleRecord(
                        taxonomy_id=tname,
                        taxonomy_name=tname,
                        sample_name=sample_name,
                        image_paths=[image_path],
                        volume_path=volume_path,
                        bounding_box=bbox,
                    )
                )
        log.info("Collected %d samples for split %s", len(records), key)
        return records


DATASET_INDEX_MAPPING = {
    "ShapeNet": ShapeNetIndex,
    "Pascal3D": Pascal3DIndex,
    "Pix3D": Pix3DIndex,
}
