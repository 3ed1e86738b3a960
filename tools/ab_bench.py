"""A/B a config override against the default on the real chip.

Usage:
  python tools/ab_bench.py --set NETWORK.USE_BAND2D_MERGER=true \
      [--batch 128] [--steps 10] [--trials 3] [--mode train|infer] [--base-too]

Prints one JSON line per variant: {"variant", "images_per_sec", ...}.
Methodology matches bench.py: chained steps, final scalar fetch (the axon
tunnel's block_until_ready returns early), best-of-N trials, finiteness
asserted before a sample is kept.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _measure(fn, n_steps, n_trials):
    best = float("inf")
    for _ in range(n_trials):
        t0 = time.perf_counter()
        s = fn(n_steps)
        acc = float(s)
        elapsed = time.perf_counter() - t0
        assert np.isfinite(acc), f"non-finite chain value {acc!r}"
        best = min(best, elapsed)
    return best


def bench_train(cfg, batch, steps, trials, n_views=1):
    from swinvox_tpu.train.state import create_train_state
    from swinvox_tpu.train.steps import make_train_step

    model, state, optimizers = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100, n_views=n_views
    )
    train_step = make_train_step(model, optimizers)
    rng = np.random.default_rng(1)
    images = jax.device_put(
        rng.uniform(-1, 1, (batch, n_views, 224, 224, 3)).astype(np.float32)
    )
    volumes = jax.device_put(
        (rng.random((batch, 32, 32, 32)) > 0.7).astype(np.float32)
    )
    step_rng = jax.random.PRNGKey(2)

    state, metrics = train_step(
        state, images, volumes, step_rng,
        enable_merger=True, enable_refiner=True,
    )
    float(metrics["total_loss"])

    def run(n):
        nonlocal state
        m = None
        for _ in range(n):
            state, m = train_step(
                state, images, volumes, step_rng,
                enable_merger=True, enable_refiner=True,
            )
        return m["total_loss"]

    elapsed = _measure(run, steps, trials)
    return steps * batch * n_views / elapsed


def bench_infer(cfg, batch, steps, trials, n_views=1):
    from swinvox_tpu.models import SwinVoxModel

    model = SwinVoxModel.from_config(cfg)
    sample = jnp.zeros((batch, n_views, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, sample, train=False))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def infer(variables, images):
        out = model.apply(variables, images, train=False)
        return jax.nn.sigmoid(
            out["refined_volumes"].astype(jnp.float32)
        ).mean()

    batch_x = jax.device_put(
        np.random.default_rng(0)
        .uniform(-1, 1, (batch, n_views, 224, 224, 3))
        .astype(np.float32)
    )
    float(infer(variables, batch_x))

    def run(n):
        s = None
        for _ in range(n):
            s = infer(variables, batch_x)
        return s

    elapsed = _measure(run, steps, trials)
    return steps * batch * n_views / elapsed


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--set", dest="overrides", action="append", default=[])
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--trials", type=int, default=3)
    ap.add_argument("--mode", choices=("train", "infer"), default="train")
    ap.add_argument("--base-too", action="store_true",
                    help="also run the unmodified default config")
    args = ap.parse_args()

    from swinvox_tpu import default_config
    from swinvox_tpu.cli.runner import build_config
    from swinvox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    bench = bench_train if args.mode == "train" else bench_infer

    variants = []
    if args.base_too:
        variants.append(("base", default_config()))
    ns = argparse.Namespace(
        config_json=None, dataset_root=None, gpu_id=None, batch_size=None,
        epoch=None, n_views=None, out_path=None, weights=None, profile=False,
        randomize=False, test=False, lr_find=False, tune=False,
        overrides=args.overrides,
    )
    variants.append(("+".join(args.overrides) or "base", build_config(ns)))

    for name, cfg in variants:
        ips = bench(cfg, args.batch, args.steps, args.trials)
        print(json.dumps({
            "variant": name,
            "mode": args.mode,
            "batch": args.batch,
            "images_per_sec": round(ips, 1),
            "ms_per_step": round(1000.0 * args.batch / ips, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
