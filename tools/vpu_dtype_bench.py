"""Measure VPU elementwise throughput: f32 vs bf16, in Pallas on the real chip.

Question (PERFORMANCE.md "Known roofline positions"): the fused swin train
kernels are VPU-op-throughput bound with all elementwise math in f32.  If
Mosaic executes bf16 elementwise at 2x the f32 rate on this chip, halving
the elementwise width is the largest remaining lever (~80 ms of the 220 ms
batch-128 step is inside those kernels).  If bf16 runs at the same rate
(internally widened to f32 lanes), the candidate is dead and PERFORMANCE.md
gets the measurement either way.

Method: one VMEM-resident block per grid step, a long chain of dependent
mul/add (+ optional tanh / where) ops so the kernel is pure VPU issue rate;
vary the chain length and dtype, fit ns/op/element from the slope between
two chain lengths (subtracts load/store and launch overhead).

Run on the TPU: python tools/vpu_dtype_bench.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROWS, LANES = 512, 512
GRID = 64  # blocks per call; total elements = GRID*ROWS*LANES ~ 16.8M


def _kernel(x_ref, o_ref, *, n_ops, flavor):
    x = x_ref[...]
    one = jnp.asarray(1.0000001, x.dtype)
    small = jnp.asarray(1e-6, x.dtype)
    if flavor == "muladd":
        for _ in range(n_ops // 2):
            x = x * one + small
    elif flavor == "tanh":
        for _ in range(n_ops):
            x = jnp.tanh(x)
    elif flavor == "where":
        zero = jnp.asarray(0.0, x.dtype)
        for _ in range(n_ops // 2):
            x = jnp.where(x > zero, x * one, x + small)
    else:
        raise ValueError(flavor)
    o_ref[...] = x


@functools.partial(jax.jit, static_argnames=("n_ops", "flavor", "dtype"))
def run(x, n_ops, flavor, dtype):
    return pl.pallas_call(
        functools.partial(_kernel, n_ops=n_ops, flavor=flavor),
        grid=(GRID,),
        in_specs=[
            pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((ROWS, LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((GRID * ROWS, LANES), dtype),
    )(x)


def time_call(fn, n_rep=5):
    fn()  # compile + warm
    best = float("inf")
    for _ in range(n_rep):
        t0 = time.perf_counter()
        out = fn()
        float(out[0, 0])  # force through the tunnel
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    n_elem = GRID * ROWS * LANES
    for flavor in ("muladd", "tanh", "where"):
        for dtype in (jnp.float32, jnp.bfloat16):
            name = jnp.dtype(dtype).name
            x = jnp.asarray(
                np.random.default_rng(0).uniform(-1, 1, (GRID * ROWS, LANES)),
                dtype,
            )
            lo, hi = (64, 256) if flavor != "tanh" else (16, 64)
            try:
                t_lo = time_call(lambda: run(x, lo, flavor, dtype))
                t_hi = time_call(lambda: run(x, hi, flavor, dtype))
            except Exception as e:
                print(f"{flavor:8s} {name:9s} FAILED: {type(e).__name__}: "
                      f"{str(e).splitlines()[0][:120]}")
                continue
            dt = t_hi - t_lo
            ops = (hi - lo) * n_elem
            print(
                f"{flavor:8s} {name:9s} chain {lo}->{hi}: "
                f"{t_lo*1e3:7.3f} -> {t_hi*1e3:7.3f} ms  "
                f"slope {dt/ (hi-lo) *1e6:8.2f} us/op-pass  "
                f"{ops/dt/1e12:6.2f} Tops/s"
            )


if __name__ == "__main__":
    main()
