"""Multi-process (multi-host) bootstrap: one codepath, 1 chip -> pod slice.

The reference is single-process (torch.nn.DataParallel over the GPUs of
one host, core/train.py:156-161); scaling a TPU pod slice instead needs
`jax.distributed.initialize` so every host sees the global device set,
after which the existing mesh/sharding path (parallel/mesh.py) and the
process-sharded BatchLoader (data/pipeline.py:344-347) do the rest — no
separate "distributed backend" exists, by design (SURVEY.md §2).

Activation, first match wins (all idempotent):
  * SWINVOX_COORDINATOR=host:port (+ SWINVOX_NUM_PROCESSES,
    SWINVOX_PROCESS_ID) — explicit bootstrap, e.g. CPU fleets or tests;
  * cfg.PARALLEL.DISTRIBUTED = true (or SWINVOX_DISTRIBUTED=1) —
    `jax.distributed.initialize()` with auto-detection: on Cloud TPU the
    pod metadata supplies coordinator/count/id, on GPU clusters the usual
    cluster envs do;
  * otherwise: no-op (single process).

Call early — before any jax.devices() use.  train_net / test_net / the
CLI runner call this automatically.
"""

from __future__ import annotations

import logging
import os
from typing import Optional

log = logging.getLogger(__name__)

_INITIALIZED = False


def maybe_initialize(cfg: Optional[object] = None) -> bool:
    """Bootstrap jax.distributed when configured; returns True iff this
    run is multi-process (jax.process_count() > 1) afterwards."""
    global _INITIALIZED
    import jax

    coordinator = os.environ.get("SWINVOX_COORDINATOR")
    want = (
        coordinator is not None
        or os.environ.get("SWINVOX_DISTRIBUTED", "") not in ("", "0", "false")
        or bool(cfg is not None and getattr(cfg.PARALLEL, "DISTRIBUTED", False))
    )
    if not want:
        return jax.process_count() > 1
    if _INITIALIZED:
        return jax.process_count() > 1

    kwargs = {}
    if coordinator:
        kwargs = dict(
            coordinator_address=coordinator,
            num_processes=int(os.environ["SWINVOX_NUM_PROCESSES"]),
            process_id=int(os.environ["SWINVOX_PROCESS_ID"]),
        )
        # CPU fleets have no accelerator-derived local devices; expose the
        # host platform's (virtual) devices explicitly when requested
        local = os.environ.get("SWINVOX_LOCAL_DEVICE_IDS")
        if local:
            kwargs["local_device_ids"] = [
                int(i) for i in local.split(",") if i.strip() != ""
            ]
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError as e:
        if "already initialized" not in str(e).lower():
            raise
    _INITIALIZED = True
    log.info(
        "jax.distributed: process %d/%d, %d local + %d global devices",
        jax.process_index(), jax.process_count(),
        jax.local_device_count(), jax.device_count(),
    )
    return jax.process_count() > 1
