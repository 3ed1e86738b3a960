"""Evaluation loop — the reference's test_net (core/test.py:24-273).

Semantics preserved: losses x10, sigmoid -> binarize at TEST.VOXEL_THRESH,
per-sample IoU (union-0 edge case) and F-score, per-taxonomy aggregation,
sample-weighted overall means, printed IoU/F-score tables with the
published-baseline column from the taxonomy JSON, return max(mean IoU).

TPU-first differences vs the reference's batch-size-1 loop (core/test.py:73):
  * samples are evaluated in fixed-shape batches (the last batch padded
    and masked), which is where most of the 10x+ eval throughput comes from;
  * when a mesh is passed, eval batches shard over the 'data' axis like
    train batches (batch size rounded up to a multiple of the axis), so
    validation scales with the device count;
  * dispatch is asynchronous with up to 3 batches in flight — host-side
    batch assembly and metric reduction overlap device compute.
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from swinvox_tpu.config import Config
from swinvox_tpu.data.pipeline import BatchLoader
from swinvox_tpu.data.taxonomy import TaxonomyInfo
from swinvox_tpu.models import SwinVoxModel
from swinvox_tpu.train.state import TrainState
from swinvox_tpu.train.steps import make_eval_step
from swinvox_tpu.utils.meters import AverageMeter

log = logging.getLogger(__name__)


def evaluate(
    cfg: Config,
    model: SwinVoxModel,
    state: TrainState,
    loader: BatchLoader,
    taxonomies: Dict[str, TaxonomyInfo],
    epoch_idx: int = 0,
    eval_batch_size: Optional[int] = None,
    enable_merger: bool = True,
    enable_refiner: bool = True,
    metrics_logger=None,
    print_tables: bool = True,
    render_dir: Optional[str] = None,
    n_render: int = 3,
    mesh=None,
) -> float:
    thresholds = tuple(cfg.TEST.VOXEL_THRESH)
    eval_step = make_eval_step(model, thresholds)
    if eval_batch_size is None:
        eval_batch_size = cfg.TEST.EVAL_BATCH_SIZE
    if mesh is not None:
        # eval batches shard over the mesh's data axis like train batches;
        # pad the batch size up to a multiple so every shard is full
        data_size = mesh.shape["data"]
        eval_batch_size = max(eval_batch_size, data_size)
        eval_batch_size += -eval_batch_size % data_size

    encoder_losses = AverageMeter()
    refiner_losses = AverageMeter()
    test_iou: Dict[str, List[np.ndarray]] = {}
    test_fscore: Dict[str, List[np.ndarray]] = {}

    # accumulate samples into fixed-shape batches for the jitted step
    pend_img, pend_vol, pend_tax = [], [], []
    pend_aug: List[dict] = []  # device-augment mode: per-sample params
    rendered = [0]  # first n_render samples -> PNG (reference test.py:179-187)
    inflight = []  # (device outputs, taxonomy ids, n, host volumes) pairs

    def submit():
        """Launch the jitted step on the pending samples (async dispatch);
        results are drained later so the host pipeline overlaps device
        compute (double buffering)."""
        if not pend_img:
            return
        n = len(pend_img)
        pad = eval_batch_size - n
        images = np.stack(pend_img + [pend_img[-1]] * pad)
        volumes = np.stack(pend_vol + [pend_vol[-1]] * pad)
        host = {"images": images, "volumes": volumes}
        if pend_aug:
            for k in pend_aug[0]:
                vals = [p[k] for p in pend_aug] + [pend_aug[-1][k]] * pad
                host[f"aug_{k}"] = np.stack(vals)
            pend_aug.clear()

        def augment(batch):
            from swinvox_tpu.data.device_augment import apply_device_augment

            return apply_device_augment(batch, cfg)

        if mesh is not None:
            from swinvox_tpu.parallel import shard_batch

            sharded = shard_batch(host, mesh)
            with mesh:
                out = eval_step(
                    state.params,
                    state.batch_stats,
                    augment(sharded),
                    sharded["volumes"],
                    enable_merger=enable_merger,
                    enable_refiner=enable_refiner,
                )
        else:
            out = eval_step(
                state.params,
                state.batch_stats,
                augment(host),
                volumes,
                enable_merger=enable_merger,
                enable_refiner=enable_refiner,
            )
        need_probs = render_dir is not None and rendered[0] < n_render
        if not need_probs:
            out = {k: v for k, v in out.items() if k != "probs"}
        inflight.append((out, list(pend_tax), n, volumes if need_probs else None))
        pend_img.clear()
        pend_vol.clear()
        pend_tax.clear()

    def drain():
        out, tax, n, volumes = inflight.pop(0)
        iou = np.asarray(out["iou"])[:n]
        fscore = np.asarray(out["fscore"])[:n]
        # per-sample losses: padded duplicates are sliced off
        encoder_losses.update(float(np.asarray(out["encoder_loss"])[:n].mean()), n)
        refiner_losses.update(float(np.asarray(out["refiner_loss"])[:n].mean()), n)
        for i, tid in enumerate(tax):
            test_iou.setdefault(tid, []).append(iou[i])
            test_fscore.setdefault(tid, []).append(fscore[i])
        if volumes is not None and rendered[0] < n_render:
            from swinvox_tpu.utils.visualization import get_volume_views

            probs = np.asarray(out["probs"])[:n]
            for i in range(min(n, n_render - rendered[0])):
                idx = rendered[0]
                get_volume_views(probs[i], render_dir, "GV", idx, epoch_idx)
                get_volume_views(volumes[i], render_dir, "GT", idx, epoch_idx)
                # stream the renders to TensorBoard with the reference's
                # tags (core/test.py:179-187)
                if metrics_logger is not None:
                    for prefix, tag in (("GV", "Reconstructed"), ("GT", "GroundTruth")):
                        metrics_logger.add_image(
                            f"Model{idx:02d}/{tag}",
                            os.path.join(
                                render_dir,
                                f"{prefix}-e{epoch_idx:03d}-s{idx:02d}.png",
                            ),
                            epoch_idx,
                        )
                rendered[0] += 1

    n_seen = 0
    for batch in loader:
        for i in range(batch.images.shape[0]):
            pend_img.append(batch.images[i])
            pend_vol.append(batch.volumes[i])
            pend_tax.append(batch.taxonomy_ids[i])
            if batch.aug is not None:
                pend_aug.append({k: v[i] for k, v in batch.aug.items()})
            n_seen += 1
            if len(pend_img) == eval_batch_size:
                submit()
                while len(inflight) > 2:  # keep 2 batches in flight
                    drain()
    submit()
    while inflight:
        drain()

    if n_seen == 0:
        log.warning("evaluate: empty loader")
        return -1.0

    # per-taxonomy means + sample-weighted overall (reference :194-206)
    n_thresh = len(thresholds)
    mean_iou = np.zeros(n_thresh)
    mean_fscore = np.zeros(n_thresh)
    per_tax_iou = {}
    per_tax_fscore = {}
    for tid, rows in test_iou.items():
        per_tax_iou[tid] = np.mean(rows, axis=0)
        mean_iou += per_tax_iou[tid] * len(rows)
    for tid, rows in test_fscore.items():
        per_tax_fscore[tid] = np.mean(rows, axis=0)
        mean_fscore += per_tax_fscore[tid] * len(rows)
    mean_iou /= n_seen
    mean_fscore /= n_seen

    if print_tables:
        _print_table(
            "TEST RESULTS (IoU)", per_tax_iou, test_iou, taxonomies,
            thresholds, mean_iou, cfg.CONST.N_VIEWS_RENDERING, baselines=True,
        )
        _print_table(
            "TEST RESULTS (F-score)", per_tax_fscore, test_fscore, taxonomies,
            thresholds, mean_fscore, cfg.CONST.N_VIEWS_RENDERING, baselines=False,
        )

    max_iou = float(np.max(mean_iou))
    if metrics_logger is not None:
        metrics_logger.add_scalar("EncoderDecoder/EpochLoss", encoder_losses.avg, epoch_idx)
        metrics_logger.add_scalar("Refiner/EpochLoss", refiner_losses.avg, epoch_idx)
        metrics_logger.add_scalar("Refiner/IoU", max_iou, epoch_idx)
        metrics_logger.add_scalar("Refiner/F-score", float(np.max(mean_fscore)), epoch_idx)
    log.info(
        "Eval epoch %d: EDLoss=%.4f RLoss=%.4f max IoU=%.4f",
        epoch_idx, encoder_losses.avg, refiner_losses.avg, max_iou,
    )
    return max_iou


def _print_table(
    title, per_tax, rows_by_tax, taxonomies, thresholds, overall, n_views,
    baselines,
):
    print(f"============================ {title} ============================")
    header = ["Taxonomy", "#Sample", "Baseline"] + [f"t={t:.2f}" for t in thresholds]
    print("\t".join(header))
    for tid, values in per_tax.items():
        info = taxonomies.get(tid)
        name = (info.taxonomy_name if info else tid).ljust(8)
        n = len(rows_by_tax[tid])
        if baselines and info and info.baselines:
            b = info.baselines.get(f"{n_views}-view")
            bstr = f"{b:.4f}" if b is not None else "N/a"
        else:
            bstr = "N/a"
        print(
            "\t".join(
                [name, str(n), bstr] + [f"{v:.4f}" for v in values]
            )
        )
    print("Overall \t\t\t" + "\t".join(f"{v:.4f}" for v in overall))
    print()
