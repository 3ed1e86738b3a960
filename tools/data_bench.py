"""Host data-pipeline throughput bench (CPU-only, no device needed).

The training step is only as fast as the host can decode + augment +
batch images (reference hot-loop analysis: SURVEY.md §3.1 — the
reference's per-sample O(n^2) np.append transforms were a known sink).
This tool measures the swinvox_tpu BatchLoader end to end on a synthetic
ShapeNet-format tree and reports images/second per worker count, so the
pipeline can be sized against the device step rate (e.g. a 700 img/s
train target needs >= 700 host img/s with prefetch overlap).

Usage:
  python tools/data_bench.py [--samples 256] [--views 6] [--n-views 3]
      [--batch 64] [--epochs 3] [--workers 4,8,16] [--root /tmp/voxbench]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--n-views", type=int, default=3)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--workers", type=str, default="4,8,16")
    ap.add_argument("--root", type=str, default="/tmp/voxbench")
    ap.add_argument(
        "--raw", action="store_true",
        help="device-augment mode: decode-only host path (ships raw "
        "pixels + params; augmentation runs on-device)",
    )
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from swinvox_tpu.data.pipeline import BatchLoader, VoxelDataset
    from swinvox_tpu.data.synthetic import generate_dataset
    from swinvox_tpu.data.taxonomy import DATASET_INDEX_MAPPING, DatasetType

    tax = os.path.join(args.root, "taxonomy.json")
    if not os.path.exists(tax):
        print(f"generating {args.samples}-sample tree under {args.root} ...",
              file=sys.stderr)
        cfg = generate_dataset(
            args.root, (args.samples, 8, 8), n_views=args.views
        )
    else:
        from swinvox_tpu.config import default_config

        cfg = default_config()
        cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH = tax
        cfg.DATASETS.SHAPENET.RENDERING_PATH = os.path.join(
            args.root, "ShapeNetRendering/%s/%s/rendering/%02d.png"
        )
        cfg.DATASETS.SHAPENET.VOXEL_PATH = os.path.join(
            args.root, "ShapeNetVox32/%s/%s/model.binvox"
        )

    index = DATASET_INDEX_MAPPING["ShapeNet"](cfg)
    records = index.samples(DatasetType.TRAIN)

    for nw in [int(w) for w in args.workers.split(",")]:
        dataset = VoxelDataset(
            records, DatasetType.TRAIN, args.n_views, cfg,
            train_augment=True, seed=0, device_augment=args.raw,
        )
        loader = BatchLoader(
            dataset, batch_size=args.batch, shuffle=True, drop_last=True,
            num_workers=nw, seed=0,
        )
        # warm epoch (page cache, thread pool spin-up), then timed epochs
        n_img = 0
        for _ in loader:
            pass
        t0 = time.perf_counter()
        for _ in range(args.epochs):
            for batch in loader:
                n_img += batch.images.shape[0]
        dt = time.perf_counter() - t0
        print(json.dumps({
            "mode": "raw" if args.raw else "host-augment",
            "workers": nw,
            "images_per_sec": round(n_img / dt, 1),
            "views_per_sec": round(n_img * args.n_views / dt, 1),
            "batch": args.batch,
            "n_views": args.n_views,
            "epochs": args.epochs,
            "images": n_img,
        }))


if __name__ == "__main__":
    main()
