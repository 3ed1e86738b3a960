"""Capture a jax.profiler trace of the train step on the TPU.

Usage: python tools/trace_train_step.py [out_dir] [batch]
Then:  python tools/parse_trace.py <out_dir>

The per-op module attribution this enables drove every optimization in
PERFORMANCE.md (tf_op provenance -> encoder/swin, merger, refiner, ...).
"""
import sys
import time

import jax
import numpy as np

from swinvox_tpu import default_config
from swinvox_tpu.train.state import create_train_state
from swinvox_tpu.train.steps import make_train_step
from swinvox_tpu.utils.cache import enable_compilation_cache

B = int(sys.argv[2]) if len(sys.argv) > 2 else 64
OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpu_trace"


def main():
    enable_compilation_cache()
    cfg = default_config()
    model, state, optimizers = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100, n_views=1
    )
    train_step = make_train_step(model, optimizers, donate=False)
    rng = np.random.default_rng(1)
    images = jax.device_put(
        rng.uniform(-1.0, 1.0, (B, 1, 224, 224, 3)).astype(np.float32)
    )
    volumes = jax.device_put(
        (rng.random((B, 32, 32, 32)) > 0.7).astype(np.float32)
    )
    key = jax.random.PRNGKey(2)

    s, m = train_step(state, images, volumes, key,
                      enable_merger=True, enable_refiner=True)
    print("warm:", float(m["total_loss"]), flush=True)

    jax.profiler.start_trace(OUT)
    for _ in range(3):
        s, m = train_step(s, images, volumes, key,
                          enable_merger=True, enable_refiner=True)
    print("traced:", float(m["total_loss"]), flush=True)
    jax.profiler.stop_trace()
    print("trace written to", OUT)


if __name__ == "__main__":
    main()
