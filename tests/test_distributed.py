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


_TRAIN_EVAL_WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count="
    + os.environ["SWINVOX_LOCAL_DEVICES"]
).strip()
import jax
jax.config.update("jax_platforms", "cpu")

multi = "SWINVOX_COORDINATOR" in os.environ
if multi:
    from swinvox_tpu.parallel.distributed import maybe_initialize
    assert maybe_initialize()

from swinvox_tpu.config import default_config
from swinvox_tpu.data.pipeline import Batch
from swinvox_tpu.data.taxonomy import TaxonomyInfo
from swinvox_tpu.parallel.distributed import warm_collectives
from swinvox_tpu.parallel.mesh import (
    build_mesh, replicated, shard_batch, shard_params,
)
from swinvox_tpu.train.checkpoint import (
    _to_host, load_checkpoint, save_checkpoint,
)
from swinvox_tpu.train.evaluator import evaluate
from swinvox_tpu.train.state import create_train_state
from swinvox_tpu.train.steps import make_train_step
from swinvox_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
pid = jax.process_index()
n_proc = jax.process_count()

# nano backbone: the full codepath at a CPU-friendly size
cfg = default_config()
cfg.NETWORK.COMPUTE_DTYPE = "float32"
cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)
cfg.PARALLEL.MODEL_PARALLEL = 2  # TP rules -> model-sharded ckpt leaves

mesh = build_mesh(cfg)  # (4 data x 2 model) over 8 devices either way
warm_collectives(mesh)  # pre-create Gloo contexts (hardcoded 30s init)
data_size = mesh.shape["data"]

model, state, optimizers = create_train_state(
    cfg, jax.random.PRNGKey(0), steps_per_epoch=1, n_views=2
)
state = state.replace(
    params=shard_params(state.params, mesh),
    batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
    opt_states=shard_params(state.opt_states, mesh),
    step=jax.device_put(state.step, replicated(mesh)),
)

# ---- one REAL train step on a seeded global batch ----------------------
images = (np.random.default_rng(0)
          .uniform(-1, 1, (data_size, 2, 224, 224, 3)).astype(np.float32))
volumes = (np.random.default_rng(1)
           .random((data_size, 32, 32, 32)) > 0.7).astype(np.float32)
rows = data_size // n_proc
batch = shard_batch(
    {"images": images[rows * pid : rows * (pid + 1)],
     "volumes": volumes[rows * pid : rows * (pid + 1)]},
    mesh,
)
train_step = make_train_step(model, optimizers)
with mesh:
    state, metrics = train_step(
        state, batch["images"], batch["volumes"], jax.random.PRNGKey(2),
        enable_merger=True, enable_refiner=True,
    )
    loss = float(metrics["total_loss"])

# ---- evaluate(): 7 global samples over 2 procs = uneven 4/3 split ------
global_n = 7
rng = np.random.default_rng(3)
eval_images = rng.uniform(-1, 1, (global_n, 2, 224, 224, 3)).astype(np.float32)
eval_volumes = (rng.random((global_n, 32, 32, 32)) > 0.7).astype(np.float32)
tax_names = ["cat_a", "cat_b"]
tax_of = [tax_names[i % 2] for i in range(global_n)]
idx = list(range(global_n))[pid::n_proc]  # build_loader's strided sharding

class FakeLoader:
    dataset = idx
    def __iter__(self):
        yield Batch(
            taxonomy_ids=[tax_of[i] for i in idx],
            sample_names=[f"s{i}" for i in idx],
            images=eval_images[idx],
            volumes=eval_volumes[idx],
        )

taxonomies = {t: TaxonomyInfo(t, t, {}) for t in tax_names}
iou = evaluate(
    cfg, model, state, FakeLoader(), taxonomies,
    eval_batch_size=4, print_tables=(pid == 0), mesh=mesh,
    render_dir=os.environ["SWINVOX_RENDER_DIR"],
)

# ---- checkpoint round-trip over the model-sharded state ----------------
path = os.environ["SWINVOX_CKPT"]
save_checkpoint(path, state, 0, float(iou), 0)
if multi:
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("ckpt-save")
state2, meta = load_checkpoint(path, state)
assert abs(meta["best_iou"] - float(iou)) < 1e-9, meta
jax.tree.map(
    lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
    _to_host(state.params), state2.params,
)

print("RESULT " + json.dumps({"pid": pid, "loss": loss, "iou": iou}))
"""


@pytest.mark.heavy
def test_two_process_train_eval_checkpoint(tmp_path):
    """The full per-epoch loop a real multi-host run depends on — train
    step, evaluate(), save/load checkpoint — across 2 REAL processes with
    model-sharded (TP) state, cross-checked against the identical
    single-process run on the same 4x2 mesh.

    Reference contract: per-epoch validation inside training
    (core/train.py:342) followed by the best-IoU checkpoint save
    (core/train.py:347-372)."""
    script = tmp_path / "worker_train_eval.py"
    script.write_text(_TRAIN_EVAL_WORKER)
    render_mp = tmp_path / "renders_mp"
    render_sp = tmp_path / "renders_sp"

    def common_env(**extra):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=os.pathsep.join(
                [p for p in (REPO, env.get("PYTHONPATH", "")) if p]
            ),
            **extra,
        )
        return env

    # 2-process run: 2 x 4 virtual devices
    port = 12000 + os.getpid() % 20000
    procs = []
    for pid in range(2):
        env = common_env(
            SWINVOX_COORDINATOR=f"127.0.0.1:{port}",
            SWINVOX_NUM_PROCESSES="2",
            SWINVOX_PROCESS_ID=str(pid),
            SWINVOX_LOCAL_DEVICES="4",
            SWINVOX_RENDER_DIR=str(render_mp),
            SWINVOX_CKPT=str(tmp_path / "mp.ckpt"),
        )
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)], env=env,
                stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            )
        )
    import json

    results = {}
    for p in procs:
        out, err = p.communicate(timeout=3600)
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")][-1]
        r = json.loads(line[len("RESULT "):])
        results[r["pid"]] = r
    # single-process control on the same (4 data x 2 model) mesh — launched
    # AFTER the pair completes: three concurrent multi-minute compiles
    # oversubscribe this 1-CPU host past the subprocess timeout
    sp = subprocess.Popen(
        [sys.executable, str(script)],
        env=common_env(
            SWINVOX_LOCAL_DEVICES="8",
            SWINVOX_RENDER_DIR=str(render_sp),
            SWINVOX_CKPT=str(tmp_path / "sp.ckpt"),
        ),
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    sp_out, sp_err = sp.communicate(timeout=3600)
    assert sp.returncode == 0, f"control failed:\n{sp_out}\n{sp_err}"
    line = [ln for ln in sp_out.splitlines() if ln.startswith("RESULT ")][-1]
    control = json.loads(line[len("RESULT "):])

    assert set(results) == {0, 1}
    # both processes reduce the identical global metrics (the trainer's
    # best-checkpoint decision depends on this agreement)
    assert results[0]["iou"] == results[1]["iou"]
    assert results[0]["loss"] == results[1]["loss"]
    # and the multi-process run reproduces the single-process numbers
    assert abs(results[0]["loss"] - control["loss"]) < 1e-4
    assert abs(results[0]["iou"] - control["iou"]) < 1e-5
    # process 0 rendered the first 3 global samples
    mp_renders = sorted(p.name for p in render_mp.glob("*.png"))
    sp_renders = sorted(p.name for p in render_sp.glob("*.png"))
    assert len(mp_renders) == 6  # 3 samples x (GV, GT)
    assert mp_renders == sp_renders
    # process 0 wrote the checkpoint
    assert (tmp_path / "mp.ckpt").exists()


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
