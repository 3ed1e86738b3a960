"""Serving benchmark: latency percentiles + throughput vs offered load.

Drives BatchingServer with the real model on the current backend and
reports, per (batch_size, offered load) point:
  * achieved throughput (img/s) and mean batch occupancy,
  * request latency p50/p90/p99 (ms),
  * rejected/timed-out counts (backpressure policy effects).

Two latency components are reported separately because this development
environment reaches the TPU through the axon tunnel (~16-19 MB/s
host->device, PERFORMANCE.md "Serving"): `device_ms` is the pure model
step measured with a pre-staged batch (what a real TPU host would see),
while the end-to-end numbers include the tunnel.

Usage:
  python tools/serve_bench.py [--batches 16,32,64] [--loads 0.5,1.0,2.0]
      [--requests 256] [--n-views 1] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _percentiles(xs):
    a = np.asarray(xs) * 1000.0
    return {
        "p50_ms": round(float(np.percentile(a, 50)), 2),
        "p90_ms": round(float(np.percentile(a, 90)), 2),
        "p99_ms": round(float(np.percentile(a, 99)), 2),
    }


def device_only_ms(predictor, batch_size, n_views, trials=8):
    """Pure jitted-model latency with a pre-staged device batch."""
    import jax

    rng = np.random.default_rng(0)
    batch = jax.device_put(
        rng.uniform(-1, 1, (batch_size, n_views, 224, 224, 3)).astype(
            np.float32
        )
    )
    out = predictor.predict(batch)
    float(np.asarray(out).ravel()[0])  # force completion (axon quirk)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = predictor.predict(batch)
        float(np.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return 1000.0 * best


class DeviceStagedPredictor:
    """Serving predictor with the TUNNEL taken out of the loop.

    This environment reaches the TPU through the axon tunnel (~16-19 MB/s
    host<->device), so end-to-end serving rows are transfer-bound and say
    nothing about how the BatchingServer + model behave on a real TPU host
    (PCIe/DMA at GB/s, transfer ~ms).  This wrapper keeps the REAL
    queueing/coalescing/backpressure dynamics but (a) feeds the jitted
    model a pre-staged on-device batch of the dispatched shape, and (b)
    fetches only a [B] per-sample reduction of the full sigmoid volume
    (forces the whole computation, ~bytes over the tunnel), standing in
    for the ~ms result DMA of a real host.  Request payloads returned to
    futures are the reductions, not volumes — benchmarking only.
    """

    def __init__(self, predictor):
        import jax
        import jax.numpy as jnp

        model = predictor.model
        self._vars = predictor.variables
        self._cache = {}
        self._fn = jax.jit(
            lambda v, x: jax.nn.sigmoid(
                model.apply(v, x, train=False)["refined_volumes"].astype(
                    jnp.float32
                )
            ).mean(axis=(1, 2, 3))
        )

    def predict(self, images):
        import jax

        if images.shape not in self._cache:
            self._cache[images.shape] = jax.device_put(
                np.ascontiguousarray(images)
            )
        return np.asarray(self._fn(self._vars, self._cache[images.shape]))


def run_point(predictor, batch_size, load_factor, n_requests, n_views,
              device_ms):
    """Offered load = load_factor x the device's max throughput."""
    from swinvox_tpu.serve import BatchingServer, ServerOverloadedError

    max_ips = batch_size / (device_ms / 1000.0)
    offered_ips = load_factor * max_ips
    inter_arrival = n_views / offered_ips

    rng = np.random.default_rng(1)
    img = rng.uniform(-1, 1, (n_views, 224, 224, 3)).astype(np.float32)

    latencies = []
    rejected = 0
    lock = threading.Lock()

    with BatchingServer(
        predictor, batch_size=batch_size, n_views=n_views,
        max_wait_ms=max(2.0, device_ms / 4), max_queue=4 * batch_size,
    ) as server:
        server.predict(img)  # compile before the clock starts
        futures = []
        t_start = time.perf_counter()
        for i in range(n_requests):
            target = t_start + i * inter_arrival
            delay = target - time.perf_counter()
            if delay > 0:
                time.sleep(delay)
            t0 = time.perf_counter()
            try:
                fut = server.submit(img)
            except ServerOverloadedError:
                with lock:
                    rejected += 1
                continue
            fut.add_done_callback(
                lambda f, t0=t0: latencies.append(time.perf_counter() - t0)
            )
            futures.append(fut)
        for f in futures:
            f.result(timeout=600)
        elapsed = time.perf_counter() - t_start
        stats = server.stats()

    done = len(latencies)
    return {
        "batch_size": batch_size,
        "load_factor": load_factor,
        "offered_img_per_s": round(offered_ips, 1),
        "achieved_img_per_s": round(done * n_views / elapsed, 1),
        "completed": done,
        "rejected": rejected,
        "mean_batch_occupancy": round(
            stats.get("mean_batch_occupancy", 0.0), 2
        ),
        **_percentiles(latencies),
        "device_only_ms_per_batch": round(device_ms, 2),
        "device_max_img_per_s": round(max_ips, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="16,32,64")
    ap.add_argument("--loads", default="0.5,1.0,2.0")
    ap.add_argument("--requests", type=int, default=256)
    ap.add_argument("--n-views", type=int, default=1)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--json", dest="json_out", default=None)
    ap.add_argument("--nano", action="store_true",
                    help="tiny f32 backbone (CPU smoke runs)")
    ap.add_argument("--device-only", action="store_true",
                    help="take the axon tunnel out of the loop: model runs "
                    "on pre-staged device batches, results are tiny "
                    "reductions (real-TPU-host simulation)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from swinvox_tpu import default_config
    from swinvox_tpu.infer import Predictor
    from swinvox_tpu.models import SwinVoxModel
    from swinvox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.checkpoint:
        predictor = Predictor.from_checkpoint(args.checkpoint)
    else:
        cfg = default_config()
        if args.nano:
            cfg.NETWORK.COMPUTE_DTYPE = "float32"
            cfg.NETWORK.USE_PALLAS_WINDOW_ATTENTION = False
            cfg.NETWORK.USE_PALLAS_SWIN_BLOCK = False
            cfg.NETWORK.SWIN_DEPTHS = (1, 1, 1, 1)
            cfg.NETWORK.RESNET_STAGE_DEPTHS = (1, 1, 1)
            cfg.NETWORK.USE_SWIN_T_MULTI_STAGE = False
            cfg.NETWORK.SWIN_T_STAGES = (3,)
            cfg.NETWORK.USE_CROSS_VIEW_ATTENTION = False
        model = SwinVoxModel.from_config(cfg)
        sample = jnp.zeros((1, args.n_views, 224, 224, 3), jnp.float32)
        variables = jax.jit(lambda k: model.init(k, sample, train=False))(
            jax.random.PRNGKey(0)
        )
        predictor = Predictor(model, variables, cfg)

    transport = "host"
    if args.device_only:
        predictor = DeviceStagedPredictor(predictor)
        transport = "device_staged"

    results = []
    for b in [int(x) for x in args.batches.split(",")]:
        dms = device_only_ms(predictor, b, args.n_views)
        for lf in [float(x) for x in args.loads.split(",")]:
            r = run_point(
                predictor, b, lf, args.requests, args.n_views, dms
            )
            r["transport"] = transport
            print(json.dumps(r), flush=True)
            results.append(r)
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
