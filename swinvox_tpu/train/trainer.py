"""Training loop — the reference's train_net (core/train.py:35-376).

Same recipe: 8-stage train / 4-stage val transforms, per-module optimizers
with MultiStepLR, staged merger/refiner enabling, per-epoch validation, and
best-IoU / SAVE_FREQ checkpointing — but the entire hot loop (forward, BCE
losses, backward, four optimizer updates) is ONE jitted XLA program fed by
a prefetching host pipeline, sharded over the device mesh, in bfloat16
(no GradScaler needed).
"""

from __future__ import annotations

import logging
import os
import time
from datetime import datetime
from typing import Optional

import jax
import numpy as np

from swinvox_tpu.config import Config
from swinvox_tpu.data.device_augment import (
    apply_device_augment,
    batch_to_host_dict,
)
from swinvox_tpu.data.pipeline import build_loader
from swinvox_tpu.data.taxonomy import DATASET_INDEX_MAPPING, DatasetType
from swinvox_tpu.parallel import (
    build_mesh,
    replicated,
    shard_batch,
    shard_params,
    warm_collectives,
)
from swinvox_tpu.parallel.mesh import device_prefetch
from swinvox_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from swinvox_tpu.train.evaluator import evaluate
from swinvox_tpu.train.state import create_train_state
from swinvox_tpu.train.steps import make_train_step
from swinvox_tpu.utils.cache import enable_compilation_cache
from swinvox_tpu.utils.meters import AverageMeter
from swinvox_tpu.utils.metrics_logger import MetricsLogger

log = logging.getLogger(__name__)


def train_net(cfg: Config) -> float:
    from swinvox_tpu.parallel.distributed import maybe_initialize

    maybe_initialize(cfg)  # multi-host bootstrap BEFORE any device use
    enable_compilation_cache()
    cfg.validate()

    train_loader = build_loader(cfg, DatasetType.TRAIN)
    val_loader = build_loader(cfg, DatasetType.VAL)
    steps_per_epoch = max(1, len(train_loader))

    model, state, optimizers = create_train_state(
        cfg, jax.random.PRNGKey(cfg.CONST.RNG_SEED), steps_per_epoch
    )
    for name, n in state.n_params().items():
        log.info("Parameters in %s: %d.", name.capitalize(), n)

    mesh = build_mesh(cfg, batch_size=cfg.CONST.BATCH_SIZE)
    warm_collectives(mesh)
    state = state.replace(
        params=shard_params(state.params, mesh),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
        opt_states=shard_params(state.opt_states, mesh),
        step=jax.device_put(state.step, replicated(mesh)),
    )
    train_step = make_train_step(
        model, optimizers, grad_accum_steps=cfg.TRAIN.GRAD_ACCUM_STEPS,
        mesh=mesh,
    )

    init_epoch, best_iou, best_epoch = 0, -1.0, -1
    if cfg.CONST.WEIGHTS and cfg.TRAIN.RESUME_TRAIN:
        state, meta = load_checkpoint(cfg.CONST.WEIGHTS, state)
        # restored leaves are host numpy — re-place them on the mesh (on a
        # multi-process mesh an unsharded leaf cannot feed the global step)
        state = state.replace(
            params=shard_params(state.params, mesh),
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            opt_states=shard_params(state.opt_states, mesh),
            step=jax.device_put(np.asarray(state.step), replicated(mesh)),
        )
        if meta.get("format") == "params-only":
            # weights-only export: no optimizer state or epoch counters —
            # fine-tune from epoch 0 rather than crash on missing meta
            log.warning(
                "%s is a params-only export; resuming weights at epoch 0 "
                "with fresh optimizer state", cfg.CONST.WEIGHTS,
            )
        else:
            init_epoch = meta["epoch_idx"]
            best_iou = meta["best_iou"]
            best_epoch = meta["best_epoch"]

    output_dir = os.path.join(
        cfg.DIR.OUT_PATH, datetime.now().isoformat().replace(":", "-")
    )
    ckpt_dir = os.path.join(output_dir, "checkpoints")
    writer = MetricsLogger(os.path.join(output_dir, "logs"), "train")
    val_writer = MetricsLogger(os.path.join(output_dir, "logs"), "val")
    with open(os.path.join(output_dir, "config.json"), "w") as f:
        f.write(cfg.to_json())

    taxonomies = DATASET_INDEX_MAPPING[cfg.DATASET.TEST_DATASET](cfg).taxonomy_info()
    step_rng = jax.random.PRNGKey(cfg.CONST.RNG_SEED + 1)
    n_batches = len(train_loader)

    for epoch_idx in range(init_epoch, cfg.TRAIN.NUM_EPOCHS):
        epoch_start = time.time()
        batch_time, data_time = AverageMeter(), AverageMeter()
        encoder_losses, refiner_losses = AverageMeter(), AverageMeter()

        enable_merger = (
            cfg.NETWORK.USE_MERGER
            and epoch_idx >= cfg.TRAIN.EPOCH_START_USE_MERGER
        )
        enable_refiner = (
            cfg.NETWORK.USE_REFINER
            and epoch_idx >= cfg.TRAIN.EPOCH_START_USE_REFINER
        )

        train_loader.set_epoch(epoch_idx)
        t_end = time.time()
        profiling = False
        # device-augment loaders ship raw pixels + aug_* params (the
        # augmentation runs jitted on the accelerator right before the
        # step); host-augmented loaders — including bbox datasets that
        # fell back despite TRAIN.DEVICE_AUGMENT — ship images only
        host_batches = (batch_to_host_dict(b, cfg) for b in train_loader)
        for batch_idx, device_batch in enumerate(
            device_prefetch(host_batches, mesh)
        ):
            if cfg.DIR.PROFILE_DIR and epoch_idx == init_epoch:
                if batch_idx == 2 and not profiling:
                    jax.profiler.start_trace(cfg.DIR.PROFILE_DIR)
                    profiling = True
                elif batch_idx == 6 and profiling:
                    jax.profiler.stop_trace()
                    profiling = False
                    log.info("Wrote profiler trace to %s", cfg.DIR.PROFILE_DIR)
            data_time.update(time.time() - t_end)
            with mesh:
                images = apply_device_augment(device_batch, cfg)
                state, metrics = train_step(
                    state,
                    images,
                    device_batch["volumes"],
                    step_rng,
                    enable_merger=enable_merger,
                    enable_refiner=enable_refiner,
                )
            # metrics stay on-device; fetching every batch would stall the
            # pipeline on a host round-trip (reference logs per batch,
            # core/train.py:311-314 — set LOG_EVERY=1 for that behavior)
            if (
                batch_idx % max(1, cfg.TRAIN.LOG_EVERY) == 0
                or batch_idx == n_batches - 1
            ):
                ed_loss = float(metrics["encoder_loss"])
                r_loss = float(metrics["refiner_loss"])
                encoder_losses.update(ed_loss)
                refiner_losses.update(r_loss)
                n_itr = epoch_idx * n_batches + batch_idx
                writer.add_scalar("EncoderDecoder/BatchLoss", ed_loss, n_itr)
                writer.add_scalar("Refiner/BatchLoss", r_loss, n_itr)
                batch_time.update(time.time() - t_end)
                log.info(
                    "[Epoch %d/%d][Batch %d/%d] BatchTime = %.3f (s) "
                    "DataTime = %.3f (s) EDLoss = %.4f RLoss = %.4f",
                    epoch_idx + 1, cfg.TRAIN.NUM_EPOCHS, batch_idx + 1,
                    n_batches, batch_time.val, data_time.val, ed_loss, r_loss,
                )
            else:
                batch_time.update(time.time() - t_end)
            t_end = time.time()

        if profiling:  # epochs shorter than the stop batch still flush
            jax.profiler.stop_trace()
            profiling = False
            log.info("Wrote profiler trace to %s", cfg.DIR.PROFILE_DIR)

        writer.add_scalar("EncoderDecoder/EpochLoss", encoder_losses.avg, epoch_idx + 1)
        writer.add_scalar("Refiner/EpochLoss", refiner_losses.avg, epoch_idx + 1)
        log.info(
            "[Epoch %d/%d] EpochTime = %.3f (s) EDLoss = %.4f RLoss = %.4f",
            epoch_idx + 1, cfg.TRAIN.NUM_EPOCHS,
            time.time() - epoch_start, encoder_losses.avg, refiner_losses.avg,
        )

        # optional per-epoch re-draw of n_views (reference core/train.py:
        # 335-339); derived from (seed, epoch) so resumed runs draw the
        # same schedule as uninterrupted ones
        if cfg.TRAIN.UPDATE_N_VIEWS_RENDERING:
            n_views = int(
                np.random.default_rng(
                    np.random.SeedSequence([cfg.CONST.RNG_SEED, epoch_idx])
                ).integers(1, cfg.CONST.N_VIEWS_RENDERING + 1)
            )
            train_loader.dataset.set_n_views(n_views)
            log.info("Updated #RenderingViews to %d", n_views)

        iou = evaluate(
            cfg, model, state, val_loader, taxonomies,
            epoch_idx=epoch_idx + 1,
            enable_merger=enable_merger,
            enable_refiner=enable_refiner,
            metrics_logger=val_writer,
            render_dir=os.path.join(output_dir, "images"),
            mesh=mesh,
        )

        if (epoch_idx + 1) % cfg.TRAIN.SAVE_FREQ == 0 or iou > best_iou:
            file_name = f"checkpoint-epoch-{epoch_idx + 1:03d}.ckpt"
            if iou > best_iou:
                best_iou, best_epoch = iou, epoch_idx
                file_name = "checkpoint-best.ckpt"
            save_checkpoint(
                os.path.join(ckpt_dir, file_name),
                state, epoch_idx, best_iou, best_epoch,
            )

    writer.close()
    val_writer.close()
    return best_iou


def test_net(
    cfg: Config,
    epoch_idx: int = -1,
    weights: Optional[str] = None,
) -> float:
    """Standalone evaluation (reference core/test.py:24-89 standalone path).

    Like the reference, every test_net call renders the first 3 samples
    (core/test.py:179-187) and streams metrics + renders to the writer.
    """
    from swinvox_tpu.parallel.distributed import maybe_initialize

    maybe_initialize(cfg)
    enable_compilation_cache()
    cfg.validate()
    model, state, _ = create_train_state(cfg, jax.random.PRNGKey(cfg.CONST.RNG_SEED))
    weights = weights or cfg.CONST.WEIGHTS
    if weights:
        state, _ = load_checkpoint(weights, state, restore_optimizer=False)
    # eval shards over the same mesh as training (all devices)
    mesh = build_mesh(cfg)
    warm_collectives(mesh)
    state = state.replace(
        params=shard_params(state.params, mesh),
        batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
    )
    loader = build_loader(cfg, DatasetType.TEST)
    taxonomies = DATASET_INDEX_MAPPING[cfg.DATASET.TEST_DATASET](cfg).taxonomy_info()
    output_dir = os.path.join(
        cfg.DIR.OUT_PATH, datetime.now().isoformat().replace(":", "-")
    )
    writer = MetricsLogger(os.path.join(output_dir, "logs"), "test")
    try:
        return evaluate(
            cfg, model, state, loader, taxonomies, epoch_idx=epoch_idx,
            enable_merger=cfg.NETWORK.USE_MERGER,
            enable_refiner=cfg.NETWORK.USE_REFINER,
            metrics_logger=writer,
            render_dir=os.path.join(output_dir, "images"),
            mesh=mesh,
        )
    finally:
        writer.close()
