"""Benchmark: ShapeNet views->voxel throughput on one TPU chip.

Measures the flagship SwinVox model (default config: multi-stage Swin +
cross-view attention + merger + refiner, bfloat16) on synthetic 224^2
1-view batches, end to end:

  * TRAINING (the headline): one jitted train step — forward, both BCE
    losses, backward, all four per-module Adam updates — at batch 128
    (the measured single-chip sweet spot; post-identity re-sweep
    2026-08-20: 638.6 @128 vs 579.4 @192, 630.9 @256; round-2 curve
    was 417/492/552/476/518 img/s at
    batch 64/96/128/192/256), 1 view, merger+refiner enabled.
    Baseline: the reference's only recorded throughput, ~70 images/s
    TRAINING on a Colab GPU (BASELINE.md; Notebooks cell 47).
  * INFERENCE (carried in the same JSON line): encoder -> decoder ->
    merger -> refiner -> sigmoid at batch 128.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.

Methodology notes: the axon TPU tunnel adds ~35-40 ms latency per blocking
fetch and block_until_ready returns early, so each loop keeps NSTEPS
batches in flight and a final scalar fetch forces completion; a tiny
reduction of each output chains into the next step to prevent reordering.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_TRAIN_IMAGES_PER_SEC = 70.0
TRAIN_BATCH = 128
INFER_BATCH = 128
N_VIEWS = 1
NSTEPS_INFER = 30
NSTEPS_TRAIN = 10


def _other_tpu_processes():
    """Other live python processes on this host (candidate TPU users).

    Only ONE process can use the TPU without time-slicing; a stale
    background trainer silently halves the measured throughput (the
    r4 driver recorded 507.9 img/s where a clean same-day re-measure
    gave 568.9).  We can't kill by pattern safely — detect and report.
    """
    import os

    me = os.getpid()
    parents = set()
    pid = me
    for _ in range(10):  # ancestors are not "other" processes
        try:
            with open(f"/proc/{pid}/stat") as f:
                pid = int(f.read().split(")")[-1].split()[1])
        except (OSError, ValueError, IndexError):
            break
        parents.add(pid)
    out = []
    for entry in os.listdir("/proc"):
        if not entry.isdigit() or int(entry) == me or int(entry) in parents:
            continue
        try:
            with open(f"/proc/{entry}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if "python" in cmd and any(
            k in cmd for k in ("swinvox", "bench", "train", "serve", "jax")
        ):
            out.append(f"pid {entry}: {cmd.strip()[:160]}")
    return out


def _measure(fn, n_steps, n_trials=6, label=""):
    """Best wall-clock of n_trials runs of n_steps chained calls.

    Per-trial numbers go to stderr so run-condition variance (tunnel
    contention, cold caches, a concurrent TPU process) is visible in the
    driver tail instead of silently poisoning the single reported value.
    """
    times = []
    for i in range(n_trials):
        t0 = time.perf_counter()
        s = fn(n_steps)
        acc = float(s)  # device->host fetch forces completion of the chain
        elapsed = time.perf_counter() - t0
        # a diverged/NaN chain must never contribute a timing sample
        assert np.isfinite(acc), f"non-finite chain value {acc!r}"
        times.append(elapsed)
    best = min(times)
    spread = (max(times) - best) / best
    print(
        f"bench[{label}]: trials s/run = "
        + ", ".join(f"{t:.3f}" for t in times)
        + f" (best {best:.3f}, spread {spread:.1%})",
        file=sys.stderr,
    )
    if spread > 0.25:
        print(
            f"bench[{label}]: WARNING trial spread {spread:.1%} > 25% — "
            "run conditions unstable (contention or cold cache); "
            "the best-of-N value stands but treat it as a lower bound",
            file=sys.stderr,
        )
    return best


def bench_inference(model, variables):
    @jax.jit
    def infer(variables, images):
        out = model.apply(variables, images, train=False)
        probs = jax.nn.sigmoid(out["refined_volumes"].astype(jnp.float32))
        return probs.mean()

    batch = jax.device_put(
        np.random.default_rng(0)
        .uniform(-1.0, 1.0, (INFER_BATCH, N_VIEWS, 224, 224, 3))
        .astype(np.float32)
    )
    float(infer(variables, batch))  # warm up + compile

    def run(n):
        s = None
        for _ in range(n):
            s = infer(variables, batch)
        return s

    elapsed = _measure(run, NSTEPS_INFER, label="infer")
    return NSTEPS_INFER * INFER_BATCH * N_VIEWS / elapsed


def bench_training(cfg):
    from swinvox_tpu.train.state import create_train_state
    from swinvox_tpu.train.steps import make_train_step

    model, state, optimizers = create_train_state(
        cfg, jax.random.PRNGKey(0), steps_per_epoch=100, n_views=N_VIEWS
    )
    train_step = make_train_step(model, optimizers)  # donated state buffers
    rng = np.random.default_rng(1)
    images = jax.device_put(
        rng.uniform(-1.0, 1.0, (TRAIN_BATCH, N_VIEWS, 224, 224, 3)).astype(
            np.float32
        )
    )
    volumes = jax.device_put(
        (rng.random((TRAIN_BATCH, 32, 32, 32)) > 0.7).astype(np.float32)
    )
    step_rng = jax.random.PRNGKey(2)

    # warm up + compile
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

    elapsed = _measure(run, NSTEPS_TRAIN, label="train")
    return NSTEPS_TRAIN * TRAIN_BATCH * N_VIEWS / elapsed


def main() -> int:
    from swinvox_tpu import default_config
    from swinvox_tpu.models import SwinVoxModel
    from swinvox_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    others = _other_tpu_processes()
    if others:
        print(
            "bench: WARNING other candidate TPU processes are live — the "
            "chip time-slices and the measurement may be contaminated:\n  "
            + "\n  ".join(others),
            file=sys.stderr,
        )
    cfg = default_config()

    # The rewindow stage chain is the newest Mosaic surface; if a
    # toolchain change makes it fail to BUILD, fall back to the proven
    # per-block fused path rather than losing the whole benchmark.
    fallback = ""
    # Transient tunnel/RPC failures (the axon remote-compile endpoint
    # occasionally drops a response mid-read) must NOT demote the run to
    # the slower fallback config — retry the DEFAULT config first and
    # only fall back on persistent (i.e. real lowering/build) failures.
    transient_markers = (
        "remote_compile", "read body", "DEADLINE", "UNAVAILABLE",
        "Socket closed", "connection", "Connection", "RESOURCE_EXHAUSTED",
    )
    train_ips = None
    last_err = None
    for attempt in range(3):
        try:
            train_ips = bench_training(cfg)
            break
        except Exception as e:  # compile/lowering failure, not divergence
            last_err = e
            msg = f"{type(e).__name__}: {e}"
            if any(m in msg for m in transient_markers) and attempt < 2:
                print(
                    f"bench: transient failure ({msg[:200]}); retrying "
                    f"default config (attempt {attempt + 2}/3)",
                    file=sys.stderr,
                )
                time.sleep(10)
                continue
            break
    if train_ips is None:
        if not cfg.NETWORK.USE_REWINDOW_CHAIN:
            raise last_err
        print(
            f"bench: default config failed ({type(last_err).__name__}: "
            f"{last_err}); retrying with NETWORK.USE_REWINDOW_CHAIN=false",
            file=sys.stderr,
        )
        cfg.NETWORK.USE_REWINDOW_CHAIN = False
        fallback = "rewindow_chain_disabled"
        train_ips = bench_training(cfg)

    model = SwinVoxModel.from_config(cfg)
    init_sample = jnp.zeros((INFER_BATCH, N_VIEWS, 224, 224, 3), jnp.float32)
    variables = jax.jit(lambda k: model.init(k, init_sample, train=False))(
        jax.random.PRNGKey(0)
    )
    infer_ips = bench_inference(model, variables)

    result = {
        "metric": "shapenet_1view_train_throughput_per_chip",
        "value": round(train_ips, 1),
        "unit": "images/s",
        "vs_baseline": round(train_ips / REFERENCE_TRAIN_IMAGES_PER_SEC, 2),
        "train_batch": TRAIN_BATCH,
        "inference_images_per_sec": round(infer_ips, 1),
        "inference_batch": INFER_BATCH,
        "baseline_train_images_per_sec": REFERENCE_TRAIN_IMAGES_PER_SEC,
    }
    if fallback:
        result["fallback"] = fallback
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
