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
    batch assembly and metric reduction overlap device compute;
  * MULTI-PROCESS (pod-slice) runs work on the same codepath: each process
    feeds its local slice of every global eval batch (build_loader shards
    the records per process), per-sample metrics ride back through ONE
    replicating all-gather per batch together with a validity mask and
    integer taxonomy ids, and every process reduces the identical global
    result — so the returned IoU (and the trainer's best-checkpoint
    decision that hangs off it) agrees on every host.  The reference has
    no multi-host story at all (single-process DataParallel).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, List, Optional

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
    n_proc = jax.process_count() if mesh is not None else 1
    if mesh is not None:
        # eval batches shard over the mesh's data axis like train batches;
        # pad the batch size up to a multiple so every shard is full
        data_size = mesh.shape["data"]
        if data_size % n_proc != 0:
            raise ValueError(
                f"evaluate: data axis {data_size} not divisible by "
                f"{n_proc} processes"
            )
        eval_batch_size = max(eval_batch_size, data_size)
        eval_batch_size += -eval_batch_size % data_size
    # each process assembles its slice of the global eval batch
    local_bs = eval_batch_size // n_proc
    multi = n_proc > 1
    is_main = jax.process_index() == 0

    target_submits = None
    if multi:
        from jax.experimental import multihost_utils

        from swinvox_tpu.parallel.mesh import replicated

        # every eval-step dispatch is a collective over the global mesh, so
        # all processes must agree on the number of batches BEFORE looping
        # (per-process record counts differ by 1 when the split is uneven)
        try:
            local_n = len(loader.dataset)
        except (AttributeError, TypeError) as e:
            raise ValueError(
                "multi-process evaluate() needs len(loader.dataset) to "
                "agree on the global batch count across processes"
            ) from e
        counts = np.asarray(
            multihost_utils.process_allgather(np.asarray(local_n))
        )
        if int(counts.sum()) == 0:
            log.warning("evaluate: empty loader (all processes)")
            return -1.0
        if int(counts.min()) == 0:
            raise ValueError(
                f"evaluate: some process holds zero eval samples "
                f"(counts={counts.tolist()}); need global sample count >= "
                f"process count"
            )
        target_submits = -(-int(counts.max()) // local_bs)
        # per-sample metrics ride home through one replicating all-gather
        # per batch; integer taxonomy ids index this shared order
        tids = sorted(taxonomies)
        tid_to_idx = {t: i for i, t in enumerate(tids)}
        _gather = jax.jit(lambda t: t, out_shardings=replicated(mesh))

    encoder_losses = AverageMeter()
    refiner_losses = AverageMeter()
    test_iou: Dict[str, List[np.ndarray]] = {}
    test_fscore: Dict[str, List[np.ndarray]] = {}

    # accumulate samples into fixed-shape batches for the jitted step
    pend_img, pend_vol, pend_tax = [], [], []
    pend_aug: List[dict] = []  # device-augment mode: per-sample params
    last = {}  # most recent sample, for all-pad trailing batches
    rendered = [0]  # first n_render samples -> PNG (reference test.py:179-187)
    n_seen = [0]
    n_submits = [0]
    inflight = []

    def submit(force: bool = False):
        """Launch the jitted step on the pending samples (async dispatch);
        results are drained later so the host pipeline overlaps device
        compute (double buffering)."""
        if not pend_img:
            if not force:
                return
            # all-padding batch: this process ran out of samples but others
            # have more global batches to dispatch — participate with its
            # last sample repeated and zero valid rows
            if not last:
                raise ValueError(
                    "evaluate: process has no samples to pad trailing "
                    "batches with"
                )
            pend_img.append(last["img"])
            pend_vol.append(last["vol"])
            if last.get("aug") is not None:
                pend_aug.append(last["aug"])
            n = 0
        else:
            n = len(pend_img)
        pad = local_bs - len(pend_img)
        images = np.stack(pend_img + [pend_img[-1]] * pad)
        volumes = np.stack(pend_vol + [pend_vol[-1]] * pad)
        if volumes.dtype != np.uint8:  # binary occupancy: uint8 on the wire
            volumes = volumes.astype(np.uint8)
        host = {"images": images, "volumes": volumes}
        if pend_aug:
            for k in pend_aug[0]:
                vals = [p[k] for p in pend_aug] + [pend_aug[-1][k]] * pad
                host[f"aug_{k}"] = np.stack(vals)
            pend_aug.clear()

        def augment(batch):
            from swinvox_tpu.data.device_augment import apply_device_augment

            return apply_device_augment(batch, cfg)

        # rendered[0] advances identically on every process, so this flag
        # (and therefore the gathered-tensor signature) stays consistent
        # across the collective
        need_probs = render_dir is not None and rendered[0] < n_render
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
        if multi:
            from swinvox_tpu.parallel import shard_batch

            # ship this process's sample bookkeeping through the mesh so
            # every process can do the identical global reduction
            tax_idx = np.full((local_bs,), -1, np.int32)
            for i, tid in enumerate(pend_tax):
                tax_idx[i] = tid_to_idx[tid]
            meta = shard_batch(
                {
                    "tax": tax_idx,
                    "valid": (np.arange(local_bs) < n).astype(np.int32),
                },
                mesh,
            )
            payload = {
                "iou": out["iou"],
                "fscore": out["fscore"],
                "encoder_loss": out["encoder_loss"],
                "refiner_loss": out["refiner_loss"],
                "tax": meta["tax"],
                "valid": meta["valid"],
            }
            if need_probs:
                payload["probs"] = out["probs"]
                payload["volumes"] = sharded["volumes"]
            inflight.append((payload, need_probs, None, None))
        else:
            if not need_probs:
                out = {k: v for k, v in out.items() if k != "probs"}
            inflight.append(
                (out, list(pend_tax), n, volumes if need_probs else None)
            )
        n_submits[0] += 1
        pend_img.clear()
        pend_vol.clear()
        pend_tax.clear()

    def render(probs, volumes, idx):
        from swinvox_tpu.utils.visualization import get_volume_views

        get_volume_views(probs, render_dir, "GV", idx, epoch_idx)
        get_volume_views(volumes, render_dir, "GT", idx, epoch_idx)
        # stream the renders to TensorBoard with the reference's tags
        # (core/test.py:179-187)
        if metrics_logger is not None:
            for prefix, tag in (("GV", "Reconstructed"), ("GT", "GroundTruth")):
                metrics_logger.add_image(
                    f"Model{idx:02d}/{tag}",
                    os.path.join(
                        render_dir, f"{prefix}-e{epoch_idx:03d}-s{idx:02d}.png"
                    ),
                    epoch_idx,
                )

    def drain():
        if multi:
            payload, need_probs, _, _ = inflight.pop(0)
            # one replicated all-gather brings the GLOBAL per-sample rows
            # (plus validity + taxonomy ids) to every process
            g = jax.device_get(_gather(payload))
            valid = np.asarray(g["valid"], bool)
            tax_idx = np.asarray(g["tax"])
            nv = int(valid.sum())
            if nv:
                encoder_losses.update(
                    float(g["encoder_loss"][valid].mean()), nv
                )
                refiner_losses.update(
                    float(g["refiner_loss"][valid].mean()), nv
                )
                for i in np.nonzero(valid)[0]:
                    tid = tids[tax_idx[i]]
                    test_iou.setdefault(tid, []).append(g["iou"][i])
                    test_fscore.setdefault(tid, []).append(g["fscore"][i])
                n_seen[0] += nv
            if need_probs:
                for i in np.nonzero(valid)[0]:
                    if rendered[0] >= n_render:
                        break
                    if is_main and render_dir is not None:
                        render(g["probs"][i], g["volumes"][i], rendered[0])
                    rendered[0] += 1
            return
        out, tax, n, volumes = inflight.pop(0)
        iou = np.asarray(out["iou"])[:n]
        fscore = np.asarray(out["fscore"])[:n]
        # per-sample losses: padded duplicates are sliced off
        encoder_losses.update(float(np.asarray(out["encoder_loss"])[:n].mean()), n)
        refiner_losses.update(float(np.asarray(out["refiner_loss"])[:n].mean()), n)
        for i, tid in enumerate(tax):
            test_iou.setdefault(tid, []).append(iou[i])
            test_fscore.setdefault(tid, []).append(fscore[i])
        n_seen[0] += n
        if volumes is not None and rendered[0] < n_render:
            probs = np.asarray(out["probs"])[:n]
            for i in range(min(n, n_render - rendered[0])):
                render(probs[i], volumes[i], rendered[0])
                rendered[0] += 1

    for batch in loader:
        for i in range(batch.images.shape[0]):
            pend_img.append(batch.images[i])
            pend_vol.append(batch.volumes[i])
            pend_tax.append(batch.taxonomy_ids[i])
            last = {"img": batch.images[i], "vol": batch.volumes[i]}
            if batch.aug is not None:
                aug = {k: v[i] for k, v in batch.aug.items()}
                pend_aug.append(aug)
                last["aug"] = aug
            if len(pend_img) == local_bs:
                submit()
                while len(inflight) > 2:  # keep 2 batches in flight
                    drain()
    submit()
    if multi:
        while n_submits[0] < target_submits:
            submit(force=True)
    while inflight:
        drain()

    if n_seen[0] == 0:
        log.warning("evaluate: empty loader")
        return -1.0

    # per-taxonomy means + sample-weighted overall (reference :194-206)
    n_thresh = len(thresholds)
    mean_iou = np.zeros(n_thresh)
    mean_fscore = np.zeros(n_thresh)
    per_tax_iou = {}
    per_tax_fscore = {}
    tax_counts = {tid: len(rows) for tid, rows in test_iou.items()}
    for tid, rows in test_iou.items():
        per_tax_iou[tid] = np.mean(rows, axis=0)
        mean_iou += per_tax_iou[tid] * len(rows)
    for tid, rows in test_fscore.items():
        per_tax_fscore[tid] = np.mean(rows, axis=0)
        mean_fscore += per_tax_fscore[tid] * len(rows)
    mean_iou /= n_seen[0]
    mean_fscore /= n_seen[0]

    if print_tables and is_main:
        _print_table(
            "TEST RESULTS (IoU)", per_tax_iou, tax_counts, taxonomies,
            thresholds, mean_iou, cfg.CONST.N_VIEWS_RENDERING, baselines=True,
        )
        _print_table(
            "TEST RESULTS (F-score)", per_tax_fscore, tax_counts, taxonomies,
            thresholds, mean_fscore, cfg.CONST.N_VIEWS_RENDERING, baselines=False,
        )

    max_iou = float(np.max(mean_iou))
    if metrics_logger is not None and is_main:
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
    title, per_tax, tax_counts, taxonomies, thresholds, overall, n_views,
    baselines,
):
    print(f"============================ {title} ============================")
    header = ["Taxonomy", "#Sample", "Baseline"] + [f"t={t:.2f}" for t in thresholds]
    print("\t".join(header))
    for tid, values in per_tax.items():
        info = taxonomies.get(tid)
        name = (info.taxonomy_name if info else tid).ljust(8)
        n = tax_counts[tid]
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
