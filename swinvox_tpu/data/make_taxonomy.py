"""Taxonomy JSON builder — dataset metadata tooling.

The reference ships taxonomy JSONs (datasets/ShapeNet.json etc.) listing
category ids/names, train/val/test sample ids, and published per-category
baseline IoUs printed next to eval results (reference core/test.py:220-227).
This tool reconstructs such files for a user's local dataset copy:

  python -m swinvox_tpu.data.make_taxonomy /data/ShapeNetVox32 \
      --out taxonomy.json --splits 0.7 0.1 0.2

Samples are split deterministically by hashing sample ids, so the same tree
always yields the same split.  Category names and the published
Pix2Vox-class baseline IoU tables (per view count, public numbers) are
attached for the 13 standard ShapeNet categories.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
from typing import Dict, List, Sequence

# The 13 standard ShapeNet categories with published Pix2Vox-class baseline
# IoU@32^3 for 1..5 views (public comparison numbers, also printed by the
# reference's eval table).
SHAPENET_CATEGORIES: Dict[str, Dict] = {
    "02691156": {"name": "aeroplane", "baseline": [0.513, 0.536, 0.549, 0.556, 0.561]},
    "02828884": {"name": "bench", "baseline": [0.421, 0.484, 0.502, 0.516, 0.527]},
    "02933112": {"name": "cabinet", "baseline": [0.716, 0.746, 0.763, 0.767, 0.772]},
    "02958343": {"name": "car", "baseline": [0.798, 0.821, 0.829, 0.833, 0.836]},
    "03001627": {"name": "chair", "baseline": [0.466, 0.515, 0.533, 0.541, 0.550]},
    "03211117": {"name": "display", "baseline": [0.468, 0.527, 0.545, 0.558, 0.565]},
    "03636649": {"name": "lamp", "baseline": [0.381, 0.406, 0.415, 0.416, 0.421]},
    "03691459": {"name": "speaker", "baseline": [0.662, 0.696, 0.708, 0.714, 0.717]},
    "04090263": {"name": "rifle", "baseline": [0.544, 0.582, 0.593, 0.595, 0.600]},
    "04256520": {"name": "sofa", "baseline": [0.628, 0.677, 0.690, 0.698, 0.706]},
    "04379243": {"name": "table", "baseline": [0.513, 0.550, 0.564, 0.573, 0.580]},
    "04401088": {"name": "telephone", "baseline": [0.661, 0.717, 0.732, 0.738, 0.754]},
    "04530566": {"name": "watercraft", "baseline": [0.513, 0.576, 0.596, 0.604, 0.610]},
}


def _split_of(sample_id: str, ratios: Sequence[float]) -> str:
    h = int(hashlib.sha1(sample_id.encode()).hexdigest()[:8], 16) / 0xFFFFFFFF
    if h < ratios[0]:
        return "train"
    if h < ratios[0] + ratios[1]:
        return "val"
    return "test"


def build_taxonomy(
    voxel_root: str,
    ratios: Sequence[float] = (0.7, 0.1, 0.2),
    categories: Dict[str, Dict] | None = None,
) -> List[Dict]:
    """Scan <voxel_root>/<category>/<sample>/ and produce taxonomy entries."""
    categories = categories or SHAPENET_CATEGORIES
    taxonomy = []
    for cat_id in sorted(os.listdir(voxel_root)):
        cat_dir = os.path.join(voxel_root, cat_id)
        if not os.path.isdir(cat_dir):
            continue
        info = categories.get(cat_id, {"name": cat_id, "baseline": None})
        entry: Dict = {
            "taxonomy_id": cat_id,
            "taxonomy_name": info["name"],
            "train": [],
            "val": [],
            "test": [],
        }
        if info.get("baseline"):
            entry["baseline"] = {
                f"{i + 1}-view": v for i, v in enumerate(info["baseline"])
            }
        for sample in sorted(os.listdir(cat_dir)):
            if os.path.isdir(os.path.join(cat_dir, sample)):
                entry[_split_of(sample, ratios)].append(sample)
        taxonomy.append(entry)
    return taxonomy


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("voxel_root", help="e.g. /data/ShapeNetVox32")
    parser.add_argument("--out", default="taxonomy.json")
    parser.add_argument("--splits", nargs=3, type=float, default=(0.7, 0.1, 0.2),
                        metavar=("TRAIN", "VAL", "TEST"))
    args = parser.parse_args(argv)
    taxonomy = build_taxonomy(args.voxel_root, args.splits)
    with open(args.out, "w") as f:
        json.dump(taxonomy, f, indent=1)
    counts = {
        k: sum(len(t[k]) for t in taxonomy) for k in ("train", "val", "test")
    }
    print(f"Wrote {args.out}: {len(taxonomy)} categories, splits {counts}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
