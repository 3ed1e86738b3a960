"""Multi-process bootstrap tests: 2 real processes on CPU.

Each subprocess initializes jax.distributed through
parallel/distributed.maybe_initialize (SWINVOX_COORDINATOR env path) with
4 virtual CPU devices, giving a genuine 2-process x 4-device = 8-device
runtime.  This executes the code single-process tests cannot reach:
  * the `jax.make_array_from_process_local_data` branch of
    parallel.mesh.shard_batch (each host holds only its slice),
  * the BatchLoader shard_index/shard_count slicing
    (data/pipeline.py:344-347 wiring),
  * a jitted global-batch computation over the multi-process mesh
    (GSPMD collectives across process boundaries).

Reference target: SURVEY.md §2 comm-backend row — "one codepath for
1 chip -> pod slice" (the reference itself is single-process
DataParallel, core/train.py:156-161).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys, json
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

from swinvox_tpu.parallel.distributed import maybe_initialize

is_multi = maybe_initialize()
assert is_multi, "maybe_initialize did not produce a multi-process runtime"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert jax.local_device_count() == 4, jax.local_device_count()

import jax.numpy as jnp
from swinvox_tpu.config import default_config
from swinvox_tpu.parallel.mesh import build_mesh, shard_batch, shard_params

pid = jax.process_index()
cfg = default_config()
mesh = build_mesh(cfg)
assert mesh.devices.size == 8, mesh.devices.shape

# ---- shard_batch: the make_array_from_process_local_data branch --------
# The GLOBAL batch is 8 rows; this process holds rows [4*pid, 4*pid+4).
global_batch = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
local = global_batch[4 * pid : 4 * pid + 4]
batch = shard_batch({"x": local}, mesh)
x = batch["x"]
assert x.shape == (8, 3), x.shape  # global shape, assembled across hosts

@jax.jit
def global_mean(x):
    return x.mean()

got = float(global_mean(x))
want = float(global_batch.mean())
assert abs(got - want) < 1e-6, (got, want)

# a jitted step touching replicated params + the sharded batch
params = shard_params({"w": jnp.ones((3,), jnp.float32)}, mesh)

@jax.jit
def step(params, x):
    return (x @ params["w"]).sum()

got2 = float(step(params, x))
want2 = float(global_batch.sum())
assert abs(got2 - want2) < 1e-4, (got2, want2)

# ---- BatchLoader sharding: per-process slices tile the global batch ----
from swinvox_tpu.data.pipeline import BatchLoader, VoxelDataset
from swinvox_tpu.data.synthetic import generate_dataset
from swinvox_tpu.data.taxonomy import DATASET_INDEX_MAPPING, DatasetType

root = os.environ["SWINVOX_TEST_ROOT"]
cfg = generate_dataset(root, n_samples_per_split=(8, 2, 2), n_views=1,
                       seed=0)
cfg.CONST.BATCH_SIZE = 4
records = DATASET_INDEX_MAPPING["ShapeNet"](cfg).samples(DatasetType.TRAIN)
ds = VoxelDataset(records, DatasetType.TRAIN, 1, cfg, train_augment=True,
                  seed=0)
loader = BatchLoader(
    ds, batch_size=4, shuffle=True, drop_last=True, num_workers=0,
    seed=7, shard_index=jax.process_index(), shard_count=2,
)
ids = [list(b.sample_names) for b in loader]
print("RESULT " + json.dumps({
    "pid": pid, "mean": got, "dot": got2, "batches": ids,
}))
"""


@pytest.mark.heavy
def test_two_process_cpu_bootstrap(tmp_path):
    port = 10000 + os.getpid() % 20000
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)

    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            SWINVOX_COORDINATOR=f"127.0.0.1:{port}",
            SWINVOX_NUM_PROCESSES="2",
            SWINVOX_PROCESS_ID=str(pid),
            SWINVOX_TEST_ROOT=str(tmp_path / f"data{pid}"),
            PYTHONPATH=os.pathsep.join(
                [p for p in (REPO, env.get("PYTHONPATH", "")) if p]
            ),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        outs.append(out)

    import json

    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r

    assert set(results) == {0, 1}
    # both processes computed the same GLOBAL mean/dot over the assembled batch
    assert results[0]["mean"] == results[1]["mean"]
    assert results[0]["dot"] == results[1]["dot"]

    # loader shards: same batch sequence, disjoint halves covering all 8
    b0, b1 = results[0]["batches"], results[1]["batches"]
    assert len(b0) == len(b1) == 2  # 8 samples / global batch 4
    for half0, half1 in zip(b0, b1):
        assert len(half0) == len(half1) == 2  # 4 global / 2 processes
        assert not set(half0) & set(half1)
    seen = {s for b in b0 + b1 for s in b}
    assert len(seen) == 8
