"""Device mesh + sharding rules — the TPU-native replacement for the
reference's single-process torch.nn.DataParallel (core/train.py:156-161).

One jax.sharding.Mesh with axes ("data", "model"):
  * the batch axis is sharded over "data"; gradients are reduced over ICI
    by GSPMD automatically (params replicated -> XLA inserts the all-reduce),
  * large dense parameters (the refiner's 8192x2048 bottleneck) are sharded
    over "model" when the axis has size > 1 — a tensor-parallel path that
    costs nothing at model_parallel=1,
  * BatchNorm statistics are computed over the GLOBAL batch (XLA partitions
    the mean over the sharded axis), which is strictly better than
    DataParallel's per-replica stats.

The same code path serves 1 chip, an 8-chip v5e host, or a pod slice; no
separate "distributed backend" exists, by design.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from swinvox_tpu.config import Config

# param-tree path substrings -> PartitionSpec for the "model" axis.
# Kernel layout for Dense is (in, out): shard the big refiner bottleneck
# column-wise (fc1) and row-wise (fc2) so the pair needs one all-reduce.
_TP_RULES = (
    (("refiner", "fc1", "kernel"), P(None, "model")),
    (("refiner", "fc1", "bias"), P("model")),
    (("refiner", "fc2", "kernel"), P("model", None)),
)


def select_devices(spec: str, devices: Optional[Sequence[Any]] = None):
    """Parse a ``--gpu``-style selector ("0", "0,2") into device objects.

    The TPU analogue of the reference exporting CUDA_VISIBLE_DEVICES
    (runner.py:74-75): an empty spec means every visible device.
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = (spec or "").strip()
    if not spec:
        return devices
    try:
        idx = [int(tok) for tok in spec.split(",") if tok.strip() != ""]
    except ValueError:
        raise ValueError(
            f"device selector {spec!r}: expected comma-separated indices"
        ) from None
    bad = [i for i in idx if not 0 <= i < len(devices)]
    if bad:
        raise ValueError(
            f"device selector {spec!r}: indices {bad} out of range "
            f"(0..{len(devices) - 1})"
        )
    return [devices[i] for i in idx]


def build_mesh(
    cfg: Optional[Config] = None,
    devices: Optional[Sequence[Any]] = None,
    batch_size: Optional[int] = None,
) -> Mesh:
    """Build the (data, model) mesh.

    When batch_size is given, the data axis is clamped to the largest value
    that divides the batch (unused devices are left off the mesh) so small
    batches still run — the analogue of DataParallel silently using fewer
    GPUs than visible.
    """
    if devices is None and cfg is not None:
        devices = select_devices(getattr(cfg.CONST, "DEVICE_SELECT", ""))
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    model = 1 if cfg is None else max(1, cfg.PARALLEL.MODEL_PARALLEL)
    data = n // model
    if cfg is not None and cfg.PARALLEL.DATA_PARALLEL > 0:
        data = cfg.PARALLEL.DATA_PARALLEL
    if batch_size is not None:
        while data > 1 and batch_size % data != 0:
            data -= 1
    if data * model > n:
        raise ValueError(f"mesh {data}x{model} exceeds {n} devices")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: tuple, mesh: Mesh) -> P:
    if mesh.shape["model"] > 1:
        names = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in path)
        for rule_names, spec in _TP_RULES:
            if all(any(r == n for n in names) for r in rule_names):
                return spec
    return P()


def shard_params(tree: Any, mesh: Mesh) -> Any:
    """device_put every leaf with its sharding rule (replicated by default,
    tensor-parallel for matching rules when the model axis is real)."""
    def place(path, leaf):
        return jax.device_put(leaf, NamedSharding(mesh, _param_spec(path, mesh)))

    return jax.tree_util.tree_map_with_path(place, tree)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place host arrays with the batch axis sharded over 'data'.

    Single-process: a plain sharded device_put.  Multi-process: each host
    holds only its slice of the global batch (BatchLoader shards by
    process), so the global array must be assembled from process-local
    data — device_put would misread the local slice as the global array.
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        n_proc = jax.process_count()

        def place(x):
            global_shape = (x.shape[0] * n_proc,) + tuple(x.shape[1:])
            return jax.make_array_from_process_local_data(
                sharding, x, global_shape
            )

        return jax.tree.map(place, batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def shard_batch_views(batch: Any, mesh: Mesh) -> Any:
    """Context/sequence-parallel placement: shard the VIEW axis too.

    Images [B, N, H, W, C] go out as P('data', 'model') — each model-axis
    device holds a slice of the views, and GSPMD inserts the all-gathers
    the cross-view attention (attention over the N axis,
    models/cross_view.py) and the merger's softmax-over-views need.  The
    reference has no analogue (its max sequence is n_views <= 24); this is
    the demonstration CP path from SURVEY.md §2.  Volumes have no view
    axis and stay P('data').

    Requires n_views % mesh.shape['model'] == 0 (enforced: an uneven
    split would silently pad views on some devices, corrupting the
    softmax-over-views — error out instead so the caller picks a view
    count or mesh that divides).
    """
    model = mesh.shape["model"]
    imgs = batch.get("images") if isinstance(batch, dict) else None
    if imgs is not None and imgs.ndim >= 2 and imgs.shape[1] % model != 0:
        raise ValueError(
            f"shard_batch_views: n_views={imgs.shape[1]} is not divisible "
            f"by the model axis ({model}); choose N_VIEWS_RENDERING % "
            f"model == 0 or use shard_batch (data-parallel only)"
        )
    img_sharding = NamedSharding(mesh, P("data", "model"))
    data_sharding = batch_sharding(mesh)

    def place(key_is_images, x):
        return jax.device_put(
            x, img_sharding if key_is_images else data_sharding
        )

    return {
        k: place(k == "images", v) for k, v in batch.items()
    }


def device_prefetch(iterator, mesh: Mesh, depth: int = 2):
    """Wrap a host batch iterator with device-side double buffering.

    Keeps `depth` batches already transferred (sharded over 'data') ahead of
    the consumer, so the HBM feed overlaps the previous train step — the
    mesh analogue of the reference's pin_memory+non_blocking copies
    (core/train.py:68, utils/helpers.py:15-18).
    """
    import collections

    queue = collections.deque()
    for item in iterator:
        queue.append(shard_batch(item, mesh))
        if len(queue) > depth:
            yield queue.popleft()
    while queue:
        yield queue.popleft()
