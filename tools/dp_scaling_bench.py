"""Data-parallel weak-scaling curve on the virtual CPU mesh.

Real multi-chip hardware is not available in this environment, so this
characterizes the data-parallel scaling TREND the idiomatic-JAX way: the
full jitted train step (forward, both losses, backward, 4 Adam updates,
GSPMD grad all-reduce) over meshes of 1/2/4/8 virtual CPU devices with a
FIXED per-device batch (weak scaling, SURVEY.md §2 DP row).

Interpretation caveat, measured into the numbers: the virtual devices
share ONE host CPU, so ideal weak scaling here is step time growing
LINEARLY with the device count (total compute grows, compute capacity
does not — unlike real chips where ideal is flat).  The collective /
partitioning overhead is therefore reported as
  overhead(d) = t_step(d) - d * t_step(1)
— what the all-reduce and GSPMD glue add beyond the d-times compute.

Usage:
  python tools/dp_scaling_bench.py [--per-device-batch 2] [--steps 3]
      [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# must run before jax initializes: 8 virtual CPU devices
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np


def main(argv=None) -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--per-device-batch", type=int, default=2)
    parser.add_argument("--n-views", type=int, default=1)
    parser.add_argument("--steps", type=int, default=3)
    parser.add_argument("--sizes", default="1,2,4,8")
    parser.add_argument("--full-model", action="store_true",
                        help="full flagship model instead of nano "
                        "(slow on CPU)")
    parser.add_argument("--json", default="")
    args = parser.parse_args(argv)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from swinvox_tpu.config import default_config
    from swinvox_tpu.parallel import build_mesh, replicated, shard_params
    from swinvox_tpu.parallel.mesh import shard_batch
    from swinvox_tpu.train.state import create_train_state
    from swinvox_tpu.train.steps import make_train_step
    from swinvox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    devices = jax.devices()
    assert len(devices) >= 8, devices

    cfg = default_config()
    cfg.NETWORK.COMPUTE_DTYPE = "float32"
    cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
    if not args.full_model:
        cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
        cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)
    cfg.PARALLEL.MODEL_PARALLEL = 1

    sizes = [int(s) for s in args.sizes.split(",")]
    rows = []
    t1 = None
    for d in sizes:
        batch = args.per_device_batch * d
        mesh = build_mesh(cfg, devices=devices[:d])
        assert dict(mesh.shape) == {"data": d, "model": 1}, mesh.shape
        model, state, optimizers = create_train_state(
            cfg, jax.random.PRNGKey(0), steps_per_epoch=10,
            n_views=args.n_views,
        )
        state = state.replace(
            params=shard_params(state.params, mesh),
            batch_stats=jax.device_put(state.batch_stats, replicated(mesh)),
            opt_states=shard_params(state.opt_states, mesh),
            step=jax.device_put(state.step, replicated(mesh)),
        )
        train_step = make_train_step(model, optimizers)
        rng = np.random.default_rng(0)
        b = shard_batch(
            {
                "images": rng.uniform(
                    -1, 1, (batch, args.n_views, 224, 224, 3)
                ).astype(np.float32),
                "volumes": (
                    rng.random((batch, 32, 32, 32)) > 0.7
                ).astype(np.float32),
            },
            mesh,
        )
        rng_key = jax.random.PRNGKey(2)
        with mesh:
            state, m = train_step(
                state, b["images"], b["volumes"], rng_key,
                enable_merger=True, enable_refiner=True,
            )
        float(m["total_loss"])  # compile + warm
        t0 = time.perf_counter()
        with mesh:
            for _ in range(args.steps):
                state, m = train_step(
                    state, b["images"], b["volumes"], rng_key,
                    enable_merger=True, enable_refiner=True,
                )
        loss = float(m["total_loss"])
        assert np.isfinite(loss), loss
        t_step = (time.perf_counter() - t0) / args.steps
        if d == sizes[0] and sizes[0] == 1:
            t1 = t_step
        row = {
            "data_parallel": d,
            "global_batch": batch,
            "step_time_s": round(t_step, 4),
            "images_per_sec": round(batch * args.n_views / t_step, 2),
        }
        if t1 is not None:
            row["overhead_vs_linear_s"] = round(t_step - d * t1, 4)
            row["overhead_pct"] = round(
                100.0 * (t_step - d * t1) / (d * t1), 1
            )
        rows.append(row)
        print(json.dumps(row))

    out = {
        "metric": "dp_weak_scaling_cpu_mesh",
        "per_device_batch": args.per_device_batch,
        "model": "full" if args.full_model else "nano",
        "rows": rows,
    }
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
