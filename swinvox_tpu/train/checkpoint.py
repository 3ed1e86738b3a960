"""Checkpoint save/restore.

Keeps the reference's checkpoint contract (core/train.py:358-371): a
best/every-SAVE_FREQ policy, `checkpoint-best` for new best IoU, payload
keyed by the four module groups plus epoch/best bookkeeping — serialized
with flax msgpack instead of torch.save.  Unlike the reference (which drops
optimizer/scheduler state on resume, core/train.py:174-186), the full
optimizer state is saved and restored; set restore_optimizer=False for
reference-faithful resume.
"""

from __future__ import annotations

import json
import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from swinvox_tpu.train.state import TrainState

log = logging.getLogger(__name__)


def _to_host(tree):
    """Fetch a (possibly sharded) device tree to host numpy.

    Under a MULTI-PROCESS mesh, model-sharded leaves (the refiner
    bottleneck under PARALLEL.MODEL_PARALLEL > 1, parallel/mesh.py TP
    rules) span non-addressable devices, where jax.device_get raises —
    gather those with a process-wide all-gather instead.  The gathers are
    collectives: every process must call _to_host (same tree, same order),
    even though only process 0 writes the file.
    """

    def get(x):
        if isinstance(x, jax.Array) and not (
            x.is_fully_addressable or x.is_fully_replicated
        ):
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(jax.device_get(x))

    return jax.tree.map(get, tree)


def _write_blob(path: str, blob: bytes) -> None:
    """Atomic write, process 0 only (multi-process runs share the save
    call so the gather collectives in _to_host line up)."""
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)


def save_checkpoint(
    path: str,
    state: TrainState,
    epoch_idx: int,
    best_iou: float,
    best_epoch: int,
) -> None:
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_states": _to_host(state.opt_states),
        "step": int(jax.device_get(state.step)),
    }
    meta = {
        "epoch_idx": int(epoch_idx),
        "best_iou": float(best_iou),
        "best_epoch": int(best_epoch),
    }
    blob = serialization.msgpack_serialize(
        {"meta": meta, "state": serialization.to_state_dict(payload)}
    )
    _write_blob(path, blob)
    log.info("Saved checkpoint to %s (%.1f MB)", path, len(blob) / 1e6)


def save_params_only(path: str, state: TrainState) -> None:
    """Export weights only (params + batch_stats), no optimizer state.

    The deployment artifact — ~320 MB at the reference's 79.1 M f32
    parameters, matching the reference's published checkpoint size
    (README.md:30); full training checkpoints are ~2x that because they
    carry Adam moments.  Loadable by load_checkpoint (and therefore
    Predictor.from_checkpoint), which detects the format marker.
    """
    payload = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
    }
    blob = serialization.msgpack_serialize(
        {
            "meta": {"format": "params-only"},
            "state": serialization.to_state_dict(payload),
        }
    )
    _write_blob(path, blob)
    log.info("Saved params-only checkpoint to %s (%.1f MB)", path, len(blob) / 1e6)


def export_params_only(src_path: str, dst_path: str) -> None:
    """Convert a full training checkpoint file into a params-only export.

    Pure blob surgery (drops opt_states/step from the serialized state
    dict) — no model or config needed, so it works on any checkpoint:

        python -m swinvox_tpu.train.checkpoint full.ckpt params.ckpt
    """
    with open(src_path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    state_dict = blob["state"]
    slim = {
        "params": state_dict["params"],
        "batch_stats": state_dict["batch_stats"],
    }
    out = serialization.msgpack_serialize(
        {"meta": {"format": "params-only"}, "state": slim}
    )
    os.makedirs(os.path.dirname(dst_path) or ".", exist_ok=True)
    tmp = dst_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(out)
    os.replace(tmp, dst_path)
    log.info(
        "Exported params-only checkpoint %s (%.1f MB) from %s",
        dst_path,
        len(out) / 1e6,
        src_path,
    )


def load_checkpoint(
    path: str,
    state: TrainState,
    restore_optimizer: bool = True,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into an existing (shape-matching) TrainState template.

    Accepts both full training checkpoints and params-only exports
    (save_params_only); the latter restore weights/statistics and leave
    the optimizer state and step counter at the template's values.
    """
    with open(path, "rb") as f:
        blob = serialization.msgpack_restore(f.read())
    meta = blob["meta"]
    if meta.get("format") == "params-only":
        template = {
            "params": _to_host(state.params),
            "batch_stats": _to_host(state.batch_stats),
        }
        restored = serialization.from_state_dict(template, blob["state"])
        new_state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"]
        )
        log.info("Restored params-only checkpoint %s", path)
        return new_state, meta
    # the template must keep its real pytree structure (optax NamedTuples),
    # so from_state_dict can rebuild it from the raw msgpack dicts
    template = {
        "params": _to_host(state.params),
        "batch_stats": _to_host(state.batch_stats),
        "opt_states": _to_host(state.opt_states),
        "step": int(jax.device_get(state.step)),
    }
    restored = serialization.from_state_dict(template, blob["state"])
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_states=restored["opt_states"]
        if restore_optimizer
        else state.opt_states,
        step=np.asarray(restored["step"], np.int32),
    )
    log.info(
        "Restored checkpoint %s: epoch %d, best IoU %.4f @ epoch %d",
        path,
        meta["epoch_idx"],
        meta["best_iou"],
        meta["best_epoch"],
    )
    return new_state, meta


if __name__ == "__main__":
    import sys

    if len(sys.argv) != 3:
        print(
            "usage: python -m swinvox_tpu.train.checkpoint "
            "<full.ckpt> <params-only.ckpt>",
            file=sys.stderr,
        )
        sys.exit(2)
    logging.basicConfig(level=logging.INFO)
    export_params_only(sys.argv[1], sys.argv[2])
