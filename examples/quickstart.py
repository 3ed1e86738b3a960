"""Quickstart — the role of the reference's Colab notebook harness
(reference Notebooks/SwinVox.ipynb): set up data, train, evaluate, inspect.

Runs end-to-end on a generated synthetic dataset (no ShapeNet download):

    python examples/quickstart.py --root /tmp/voxdemo --epochs 3

For real ShapeNet, download ShapeNetRendering + ShapeNetVox32, place the
taxonomy JSON next to them, and pass --root at that directory (see
swinvox_tpu/data/taxonomy.py for the expected layout).
"""

from __future__ import annotations

import argparse
import logging
import os


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/voxdemo")
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--n-views", type=int, default=3)
    parser.add_argument("--train-samples", type=int, default=48,
                        help="synthetic train-split size (val/test = 1/6)")
    parser.add_argument("--views", type=int, default=6,
                        help="rendered views per synthetic sample")
    parser.add_argument("--nano", action="store_true",
                        help="tiny backbone for CPU smoke runs")
    parser.add_argument("--init", choices=("reference", "standard"),
                        default="reference",
                        help="init scheme: reference-faithful or standard")
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO,
                        format="[%(levelname)s] %(asctime)s %(message)s")

    data_dir = os.path.join(args.root, "data")
    if not os.path.exists(os.path.join(data_dir, "taxonomy.json")):
        from swinvox_tpu.data.synthetic import generate_dataset

        logging.info("Generating synthetic dataset under %s ...", data_dir)
        holdout = max(4, args.train_samples // 6)
        cfg = generate_dataset(
            data_dir,
            n_samples_per_split=(args.train_samples, holdout, holdout),
            n_views=args.views,
        )
    else:
        from swinvox_tpu.config import default_config

        cfg = default_config()
        cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH = os.path.join(
            data_dir, "taxonomy.json"
        )
        cfg.DATASETS.SHAPENET.RENDERING_PATH = os.path.join(
            data_dir, "ShapeNetRendering/%s/%s/rendering/%02d.png"
        )
        cfg.DATASETS.SHAPENET.VOXEL_PATH = os.path.join(
            data_dir, "ShapeNetVox32/%s/%s/model.binvox"
        )

    cfg.DIR.OUT_PATH = os.path.join(args.root, "output")
    cfg.CONST.BATCH_SIZE = args.batch_size
    cfg.CONST.N_VIEWS_RENDERING = args.n_views
    cfg.TRAIN.NUM_EPOCHS = args.epochs
    cfg.TRAIN.SAVE_FREQ = max(1, args.epochs // 2)
    cfg.CONST.NUM_WORKER = 8
    # higher LRs than the reference's tuned values: the synthetic task is
    # easy and short
    for m in ("ENCODER", "DECODER", "REFINER"):
        setattr(cfg.TRAIN, f"{m}_LEARNING_RATE", 1e-4)
    cfg.TRAIN.MERGER_LEARNING_RATE = 3e-4
    cfg.NETWORK.INIT_SCHEME = args.init
    if args.nano:
        cfg.NETWORK.COMPUTE_DTYPE = "float32"
        cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
        cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
        cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)

    from swinvox_tpu.train.trainer import train_net

    best_iou = train_net(cfg)
    logging.info("Done. Best val IoU: %.4f (output in %s)", best_iou,
                 cfg.DIR.OUT_PATH)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
