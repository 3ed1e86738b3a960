"""CLI entry point — same surface as the reference runner
(/root/reference/runner.py:25-51):

  python -m swinvox_tpu.cli.runner [--test] [--weights W] [--batch-size B]
      [--epoch E] [--gpu ID] [--out DIR] [--rand] [--lr_find] [--tune]

plus TPU-native extras: --set KEY=VALUE config overrides, --config JSON,
--dataset-root for pointing the ShapeNet templates at a directory.
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
from argparse import ArgumentParser


def get_args_from_command_line(argv=None):
    parser = ArgumentParser(description="SwinVox TPU runner")
    parser.add_argument(
        "--gpu", dest="gpu_id",
        help="restrict to these device indices (comma separated, e.g. "
        "'0' or '0,2') — the TPU analogue of the reference's "
        "CUDA_VISIBLE_DEVICES; default: all visible devices",
        default=None, type=str,
    )
    parser.add_argument("--rand", dest="randomize", help="randomize seed",
                        action="store_true")
    parser.add_argument("--test", dest="test", help="test neural networks",
                        action="store_true")
    parser.add_argument("--batch-size", dest="batch_size", default=None, type=int)
    parser.add_argument("--epoch", dest="epoch", help="number of epochs",
                        default=None, type=int)
    parser.add_argument("--weights", dest="weights",
                        help="initialize network from a checkpoint", default=None)
    parser.add_argument("--out", dest="out_path", help="output path", default=None)
    parser.add_argument("--lr_find", dest="lr_find",
                        help="run the learning-rate finder", action="store_true")
    parser.add_argument("--optuna_tune", "--tune", dest="tune",
                        help="run hyperparameter tuning", action="store_true")
    parser.add_argument("--n-views", dest="n_views", default=None, type=int,
                        help="number of rendering views")
    parser.add_argument("--config", dest="config_json", default=None,
                        help="JSON file of config overrides")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="KEY=VALUE",
                        help="dotted config override, e.g. NETWORK.USE_MERGER=false")
    parser.add_argument("--profile", dest="profile", action="store_true",
                        help="capture a jax.profiler trace of a few train steps")
    parser.add_argument("--dataset-root", dest="dataset_root", default=None,
                        help="root containing ShapeNetRendering/ ShapeNetVox32/ "
                        "and a taxonomy .json")
    parser.add_argument("--platform", dest="platform", default=None,
                        help="force the JAX backend (e.g. 'cpu'); the site "
                        "configuration pins the TPU platform regardless of "
                        "JAX_PLATFORMS, so use --platform cpu for host-only "
                        "dry runs")
    return parser.parse_args(argv)


def build_config(args):
    import json

    from swinvox_tpu.config import Config, default_config

    cfg = default_config()
    if args.config_json:
        with open(args.config_json) as f:
            cfg.update(json.load(f))

    if args.dataset_root:
        root = args.dataset_root
        tax = None
        for cand in ("taxonomy.json", "ShapeNet.json"):
            p = os.path.join(root, cand)
            if os.path.exists(p):
                tax = p
                break
        if tax is None:
            raise SystemExit(f"No taxonomy json found under {root}")
        cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH = tax
        cfg.DATASETS.SHAPENET.RENDERING_PATH = os.path.join(
            root, "ShapeNetRendering/%s/%s/rendering/%02d.png"
        )
        cfg.DATASETS.SHAPENET.VOXEL_PATH = os.path.join(
            root, "ShapeNetVox32/%s/%s/model.binvox"
        )

    # reference-style arg -> cfg mutations (runner.py:58-71)
    if args.gpu_id is not None:
        cfg.CONST.DEVICE = args.gpu_id
        # restrict the mesh to the named device indices — the TPU
        # analogue of the reference's CUDA_VISIBLE_DEVICES export
        cfg.CONST.DEVICE_SELECT = args.gpu_id
    if args.batch_size is not None:
        cfg.CONST.BATCH_SIZE = args.batch_size
    if args.epoch is not None:
        cfg.TRAIN.NUM_EPOCHS = args.epoch
    if args.n_views is not None:
        cfg.CONST.N_VIEWS_RENDERING = args.n_views
    if args.out_path is not None:
        cfg.DIR.OUT_PATH = args.out_path
    if args.weights is not None:
        cfg.CONST.WEIGHTS = args.weights
        if not args.test and not args.lr_find and not args.tune:
            cfg.TRAIN.RESUME_TRAIN = True
    if args.profile:
        cfg.DIR.PROFILE_DIR = os.path.join(cfg.DIR.OUT_PATH, "profile")
    if args.randomize:
        import time as _time

        cfg.CONST.RNG_SEED = int(_time.time()) % (2**31)

    for ov in args.overrides:
        if "=" not in ov:
            raise SystemExit(f"--set expects KEY=VALUE, got {ov!r}")
        key, value = ov.split("=", 1)
        lowered = value.lower()
        if lowered in ("true", "false"):
            parsed = lowered == "true"
        else:
            import json as _json

            try:
                parsed = _json.loads(value)  # ints, floats, [1,1,1,1] lists
            except ValueError:
                parsed = value
        cfg.set(key, parsed)
    return cfg


def main(argv=None) -> int:
    logging.basicConfig(
        format="[%(levelname)s] %(asctime)s %(message)s", level=logging.INFO
    )
    args = get_args_from_command_line(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    cfg = build_config(args)
    cfg.validate()

    from swinvox_tpu.parallel.distributed import maybe_initialize

    maybe_initialize(cfg)  # multi-host bootstrap before any device use

    if args.lr_find:
        from swinvox_tpu.train.lr_finder import find_lr

        find_lr(cfg)
        return 0
    if args.tune:
        from swinvox_tpu.train.tune import tune

        tune(cfg)
        return 0
    if args.test:
        if not cfg.CONST.WEIGHTS:
            logging.error("Please specify the file path of checkpoint!")
            return 2
        from swinvox_tpu.train.trainer import test_net

        test_net(cfg)
        return 0

    from swinvox_tpu.train.trainer import train_net

    train_net(cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
