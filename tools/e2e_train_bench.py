"""End-to-end SUSTAINED training throughput from an on-disk dataset tree.

bench.py measures the device-side train step with pre-staged synthetic
batches; tools/data_bench.py measures the host loader in isolation.  This
tool closes the gap between them: it trains real steps THROUGH the full
production input path — BatchLoader (threaded decode) -> device_prefetch
(double-buffered HBM feed) -> on-device augmentation -> jitted train
step — over a synthetic ShapeNet-format tree on disk, and reports the
sustained images/s next to a pre-staged device-only measurement of the
same step, so the host-pipeline overhead is a measured number instead of
an inference from two separate benchmarks.

Reference point: the reference's steady-state data time is ~0.001 s/batch
(Notebooks/SwinVox.ipynb cell 47, DataLoader with 16 worker processes,
core/train.py:67) — i.e. its loader also kept up; parity requires ours to
keep up at 8x the reference's step rate.

Usage (real TPU, ~3-4 min after the first compile):
  python tools/e2e_train_bench.py [--batch-size 128] [--steps 24]
      [--warm 6] [--samples 1536] [--host-augment] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _force(metrics) -> float:
    """Fetch a scalar to force completion of everything dispatched (the
    axon tunnel's block_until_ready returns early)."""
    v = float(np.asarray(metrics["total_loss"]))
    assert np.isfinite(v), f"non-finite loss {v}"
    return v


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", default="/tmp/voxe2e_bench")
    parser.add_argument("--batch-size", type=int, default=128)
    parser.add_argument("--n-views", type=int, default=1)
    parser.add_argument("--views", type=int, default=2,
                        help="rendered views per sample on disk")
    parser.add_argument("--samples", type=int, default=1536,
                        help="train-split size of the generated tree")
    parser.add_argument("--steps", type=int, default=24,
                        help="measured steps (after warmup)")
    parser.add_argument("--warm", type=int, default=6)
    parser.add_argument("--workers", type=int, default=8)
    parser.add_argument("--host-augment", action="store_true",
                        help="use the host transform path instead of "
                        "TRAIN.DEVICE_AUGMENT")
    parser.add_argument("--nano", action="store_true",
                        help="tiny backbone for CPU smoke runs")
    parser.add_argument("--json", default="")
    args = parser.parse_args(argv)

    import jax

    from swinvox_tpu.data.device_augment import (
        apply_device_augment,
        batch_to_host_dict,
    )
    from swinvox_tpu.data.pipeline import build_loader
    from swinvox_tpu.data.synthetic import generate_dataset
    from swinvox_tpu.data.taxonomy import DatasetType
    from swinvox_tpu.parallel import build_mesh, replicated, shard_params
    from swinvox_tpu.parallel.mesh import device_prefetch, shard_batch
    from swinvox_tpu.train.state import create_train_state
    from swinvox_tpu.train.steps import make_train_step
    from swinvox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # ---- on-disk tree (reused across runs) ------------------------------
    marker = os.path.join(args.root, "data", "taxonomy.json")
    if not os.path.exists(marker):
        print(
            f"generating {args.samples}-sample synthetic tree under "
            f"{args.root} ...", file=sys.stderr,
        )
        cfg = generate_dataset(
            os.path.join(args.root, "data"),
            n_samples_per_split=(args.samples, 4, 4),
            n_views=args.views,
        )
    else:
        from swinvox_tpu.config import default_config

        data_dir = os.path.join(args.root, "data")
        cfg = default_config()
        cfg.DATASETS.SHAPENET.TAXONOMY_FILE_PATH = marker
        cfg.DATASETS.SHAPENET.RENDERING_PATH = os.path.join(
            data_dir, "ShapeNetRendering/%s/%s/rendering/%02d.png"
        )
        cfg.DATASETS.SHAPENET.VOXEL_PATH = os.path.join(
            data_dir, "ShapeNetVox32/%s/%s/model.binvox"
        )

    cfg.CONST.BATCH_SIZE = args.batch_size
    cfg.CONST.N_VIEWS_RENDERING = args.n_views
    cfg.CONST.NUM_WORKER = args.workers
    cfg.TRAIN.DEVICE_AUGMENT = not args.host_augment
    if args.nano:
        cfg.NETWORK.COMPUTE_DTYPE = "float32"
        cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
        cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
        cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)

    # ---- model + step, exactly as the trainer builds them ---------------
    loader = build_loader(cfg, DatasetType.TRAIN)
    steps_per_epoch = max(1, len(loader))
    model, state, optimizers = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch, n_views=args.n_views
    )
    mesh = build_mesh(cfg, batch_size=args.batch_size)
    state = state.replace(
        params=shard_params(state.params, mesh),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_states=shard_params(state.opt_states, mesh),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    train_step = make_train_step(model, optimizers, mesh=mesh)
    step_rng = jax.random.PRNGKey(2)

    # ---- device-only control: the same step on a pre-staged batch -------
    rng = np.random.default_rng(1)
    ctrl = shard_batch(
        {
            "images": rng.uniform(
                -1, 1, (args.batch_size, args.n_views, 224, 224, 3)
            ).astype(np.float32),
            "volumes": (
                rng.random((args.batch_size, 32, 32, 32)) > 0.7
            ).astype(np.float32),
        },
        mesh,
    )
    with mesh:
        state, m = train_step(
            state, ctrl["images"], ctrl["volumes"], step_rng,
            enable_merger=True, enable_refiner=True,
        )
    _force(m)  # compile
    t0 = time.perf_counter()
    n_ctrl = 10
    with mesh:
        for _ in range(n_ctrl):
            state, m = train_step(
                state, ctrl["images"], ctrl["volumes"], step_rng,
                enable_merger=True, enable_refiner=True,
            )
    _force(m)
    device_ips = n_ctrl * args.batch_size * args.n_views / (
        time.perf_counter() - t0
    )

    # ---- sustained end-to-end loop (trainer's hot loop verbatim) --------
    total_steps = args.warm + args.steps
    done = 0
    t_start = None
    epoch = 0
    aug_mode = None
    while done < total_steps:
        loader.set_epoch(epoch)
        host_batches = (batch_to_host_dict(b, cfg) for b in loader)
        for device_batch in device_prefetch(host_batches, mesh):
            if aug_mode is None:
                aug_mode = (
                    "device" if "aug_bg_color" in device_batch else "host"
                )
            with mesh:
                images = apply_device_augment(device_batch, cfg)
                state, m = train_step(
                    state, images, device_batch["volumes"], step_rng,
                    enable_merger=True, enable_refiner=True,
                )
            done += 1
            if done == args.warm:
                _force(m)  # drain everything before the clock starts
                t_start = time.perf_counter()
            if done == total_steps:
                break
        epoch += 1
    _force(m)
    elapsed = time.perf_counter() - t_start
    e2e_ips = args.steps * args.batch_size * args.n_views / elapsed

    # ---- decomposition: host loader alone, then the raw transfer ---------
    # (in this dev environment the axon tunnel moves host->device at
    # ~16-19 MB/s, so the e2e number here is TRANSFER-bound; these two
    # measurements separate "host pipeline can't keep up" — a real
    # problem we'd have to fix — from "the tunnel is slow" — an
    # environment artifact a PCIe-attached TPU host doesn't have)
    loader.set_epoch(epoch + 1)
    n_host = 0
    sample_host = None
    t0 = time.perf_counter()
    for b in loader:
        sample_host = batch_to_host_dict(b, cfg)
        n_host += b.images.shape[0] * args.n_views
        if n_host >= args.steps * args.batch_size * args.n_views:
            break
    host_ips = n_host / (time.perf_counter() - t0)

    batch_bytes = sum(
        np.asarray(v).nbytes for v in sample_host.values()
    )
    import jax.numpy as jnp

    best_xfer = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        staged = {
            k: jax.device_put(np.asarray(v)) for k, v in sample_host.items()
        }
        for v in staged.values():
            _ = float(jnp.asarray(v).astype(jnp.float32).sum())
        best_xfer = min(best_xfer, time.perf_counter() - t0)

    result = {
        "metric": "e2e_train_throughput_from_disk",
        "value": round(e2e_ips, 1),
        "unit": "images/s",
        "device_only_images_per_sec": round(device_ips, 1),
        "host_loader_only_images_per_sec": round(host_ips, 1),
        "host_to_device_gap_pct": round(
            100.0 * (1.0 - e2e_ips / device_ips), 1
        ),
        "batch_payload_mb": round(batch_bytes / 1e6, 2),
        "transfer_s_per_batch": round(best_xfer, 3),
        "transfer_mb_per_s": round(batch_bytes / 1e6 / best_xfer, 1),
        "augment_mode": aug_mode,
        "batch_size": args.batch_size,
        "n_views": args.n_views,
        "steps": args.steps,
        "train_samples_on_disk": args.samples,
        "workers": args.workers,
    }
    print(json.dumps(result))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
