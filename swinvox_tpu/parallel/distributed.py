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
_BARRIER_COUNT = 0


def coordination_barrier(name: str, timeout_s: int = 1200) -> None:
    """Align all processes via the jax.distributed coordination service.

    Unlike a Gloo collective this has a CONFIGURABLE timeout and no
    compiled dispatch, so it is safe to place in front of lazily-created
    communicator contexts (see warm_collectives).  No-op single-process.
    Every process must call with the same sequence of names.
    """
    global _BARRIER_COUNT
    import jax

    if jax.process_count() <= 1:
        return
    from jax._src import distributed as _dist

    client = _dist.global_state.client
    if client is None:  # initialized outside jax.distributed (unusual)
        return
    _BARRIER_COUNT += 1
    client.wait_at_barrier(
        f"swinvox_{name}_{_BARRIER_COUNT}", timeout_in_ms=timeout_s * 1000
    )


def warm_collectives(mesh=None, timeout_s: int = 1200) -> None:
    """Pre-create the cross-process communicator contexts a sharded run
    will use.  No-op single-process.

    XLA:CPU's Gloo backend builds each communicator clique lazily on its
    first collective with a HARD-CODED 30s key-value-store wait
    (xla/backends/cpu/collectives); the configurable
    --xla_cpu_collective_call_*_timeout_seconds flags only govern calls on
    contexts that already exist.  On a contended host two processes can
    skew by minutes while tracing/compiling, so any first-collective that
    lands after such a gap dies with "Gloo context initialization failed:
    DEADLINE_EXCEEDED" (observed live: shard_params' device_put on one
    process while the peer was still building its train state).  Aligning
    the processes with a coordination-service barrier and immediately
    running one tiny collective per device set leaves every later
    dispatch on a warm context, governed by the configurable call
    timeouts instead.  TPU runs don't need this (ICI communicators are
    created at client init) but it is harmless there.
    """
    import jax

    if jax.process_count() <= 1:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    coordination_barrier("warm_collectives", timeout_s)
    # global clique: every device on every process
    multihost_utils.process_allgather(np.zeros((1,), np.float32))
    if mesh is None:
        return
    from jax.sharding import NamedSharding, PartitionSpec as P

    for axis in mesh.axis_names:
        if mesh.shape[axis] <= 1:
            continue
        # per-axis cliques: one communicator per row/column of the mesh —
        # the device sets the train step's psums/all-gathers run over
        from jax.experimental.shard_map import shard_map

        f = jax.jit(
            shard_map(
                lambda x, a=axis: jax.lax.psum(x, a),
                mesh=mesh,
                in_specs=P(axis),
                out_specs=P(),
            )
        )
        n = mesh.shape[axis]
        x = jax.device_put(
            np.zeros((n,), np.float32), NamedSharding(mesh, P(axis))
        )
        np.asarray(f(x))  # block: the context must exist before returning
    coordination_barrier("warm_collectives_done", timeout_s)


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
