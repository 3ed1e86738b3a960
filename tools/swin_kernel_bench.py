"""Microbench for fused-Swin-block kernel variants on the real chip.

The production kernels (ops/pallas_swin_block.py) are VPU-op-throughput
bound (PERFORMANCE.md round-3 ablations), and a chunk of the non-math
cost is suspected to be Mosaic relayout copies: per-head Q/K/V lane
slices at 32-lane offsets plus the head concats.  This harness times the
production forward kernel against a HEAD-ALIGNED variant per stage:

  * weights arrive as [3, h, c, hd] / [h, hd, c] so per-head access is a
    LEADING-dim index (free) instead of a lane-offset slice (relayout);
  * per-head context is folded straight into the output projection
    (ctx_h @ wproj[h], accumulated over heads) — no lane concat at all.

Usage:  python tools/swin_kernel_bench.py [--batch 64] [--steps 30]
Prints one JSON line per (stage, variant).
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from swinvox_tpu.ops.pallas_swin_block import (
    _ln,
    _erf,
    fused_swin_block,
)

# Swin-Tiny stage configs at 224^2 input: (C, heads, windows-per-image)
STAGES = [(96, 3, 64), (192, 6, 16), (384, 12, 4), (768, 24, 1)]
T_PAD = 64  # 7*7 tokens padded to the kernels' sublane multiple


def _aligned_block_kernel(
    x_ref,
    ln1s_ref, ln1b_ref,
    wqkv_ref,  # [3, h, c, hd]
    bqkv_ref,  # [3, h, hd]
    wproj_ref,  # [h, hd, c]
    bproj_ref, bias_ref,
    ln2s_ref, ln2b_ref,
    w1_ref, b1_ref, w2_ref, b2_ref,
    o_ref,
    *, num_heads: int, scale: float, eps: float,
):
    bw, t, c = x_ref.shape
    dtype = x_ref.dtype
    x32 = x_ref[:].astype(jnp.float32)

    h = _ln(
        x32, ln1s_ref[:].astype(jnp.float32), ln1b_ref[:].astype(jnp.float32),
        eps,
    ).astype(dtype)

    bias = bias_ref[:].astype(jnp.float32)
    attn = None
    for head in range(num_heads):
        qh = (
            jax.lax.dot_general(
                h, wqkv_ref[0, head],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[0, head].astype(jnp.float32)
        ).astype(dtype)
        kh = (
            jax.lax.dot_general(
                h, wqkv_ref[1, head],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[1, head].astype(jnp.float32)
        ).astype(dtype)
        vh = (
            jax.lax.dot_general(
                h, wqkv_ref[2, head],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            + bqkv_ref[2, head].astype(jnp.float32)
        ).astype(dtype)
        s = (
            jax.lax.dot_general(
                qh, kh, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
                preferred_element_type=jnp.float32,
            )
            * scale
            + bias[head][None]
        )
        p = jax.nn.softmax(s, axis=-1)
        ctx_h = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ).astype(dtype)
        term = jax.lax.dot_general(
            ctx_h, wproj_ref[head],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        attn = term if attn is None else attn + term
    attn = attn + bproj_ref[:].astype(jnp.float32)

    x2 = x32 + attn
    h2 = _ln(
        x2, ln2s_ref[:].astype(jnp.float32), ln2b_ref[:].astype(jnp.float32),
        eps,
    ).astype(dtype)
    m = (
        jax.lax.dot_general(
            h2, w1_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b1_ref[:].astype(jnp.float32)
    )
    m = (0.5 * m * (1.0 + _erf(m * 0.7071067811865476))).astype(dtype)
    m = (
        jax.lax.dot_general(
            m, w2_ref[:], dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        + b2_ref[:].astype(jnp.float32)
    )
    o_ref[:] = (x2 + m).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("num_heads", "scale", "eps", "bw"))
def aligned_block(
    x, ln1s, ln1b, wqkv3, bqkv3, wprojh, bproj, rel_bias,
    ln2s, ln2b, w1, b1, w2, b2, num_heads, scale, eps, bw,
):
    nw, t, c = x.shape
    grid = (nw // bw,)
    x_spec = pl.BlockSpec((bw, t, c), lambda j: (j, 0, 0), memory_space=pltpu.VMEM)

    def const(shape):
        return pl.BlockSpec(
            shape, lambda j, _s=shape: tuple(0 for _ in _s),
            memory_space=pltpu.VMEM,
        )

    operands = [x, ln1s, ln1b, wqkv3, bqkv3, wprojh, bproj, rel_bias,
                ln2s, ln2b, w1, b1, w2, b2]
    in_specs = [x_spec] + [const(op.shape) for op in operands[1:]]
    return pl.pallas_call(
        functools.partial(
            _aligned_block_kernel, num_heads=num_heads, scale=scale, eps=eps
        ),
        grid=grid,
        in_specs=in_specs,
        out_specs=x_spec,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=False,
    )(*operands)


def _measure(fn, x, steps, trials=3):
    y = fn(x)
    float(jnp.sum(y.astype(jnp.float32)))  # force compile + execute
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        y = x
        for _ in range(steps):
            y = fn(y)
        acc = float(jnp.sum(y.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        assert np.isfinite(acc)
        best = min(best, dt)
    return best / steps * 1000.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--stages", default="0,1,2,3")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    for si in (int(s) for s in args.stages.split(",")):
        c, heads, nwpi = STAGES[si]
        hd = c // heads
        nw = args.batch * nwpi
        t = T_PAD
        x = jnp.asarray(
            rng.standard_normal((nw, t, c)), jnp.bfloat16
        )
        ln1s = jnp.ones((c,), jnp.float32); ln1b = jnp.zeros((c,), jnp.float32)
        ln2s = jnp.ones((c,), jnp.float32); ln2b = jnp.zeros((c,), jnp.float32)
        wqkv = jnp.asarray(rng.standard_normal((c, 3 * c)) * 0.02, jnp.bfloat16)
        bqkv = jnp.zeros((3 * c,), jnp.float32)
        wproj = jnp.asarray(rng.standard_normal((c, c)) * 0.02, jnp.bfloat16)
        bproj = jnp.zeros((c,), jnp.float32)
        rel_bias = jnp.asarray(rng.standard_normal((heads, 49, 49)) * 0.02,
                               jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((c, 4 * c)) * 0.02, jnp.bfloat16)
        b1 = jnp.zeros((4 * c,), jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((4 * c, c)) * 0.02, jnp.bfloat16)
        b2 = jnp.zeros((c,), jnp.float32)
        scale = hd ** -0.5

        # --- production fwd kernel (per-head lane slices + concat) -------
        @jax.jit
        def prod(y):
            return fused_swin_block(
                y, ln1s, ln1b, wqkv, bqkv, wproj, bproj, rel_bias, None,
                ln2s, ln2b, w1, b1, w2, b2, num_heads=heads,
                logical_tokens=49,
            )

        print(f"# stage {si}: measuring production kernel...", file=sys.stderr, flush=True)
        ms_prod = _measure(prod, x, args.steps)
        print(f"# stage {si}: prod {ms_prod:.3f} ms", file=sys.stderr, flush=True)

        # --- head-aligned variant ----------------------------------------
        # [c, 3c] -> [3, h, c, hd]; [c, c] -> [h, hd, c]
        wqkv3 = jnp.transpose(
            wqkv.reshape(c, 3, heads, hd), (1, 2, 0, 3)
        )
        bqkv3 = bqkv.reshape(3, heads, hd)
        wprojh = wproj.reshape(heads, hd, c)
        # pad rel bias key columns like the production path does
        rb = jnp.pad(rel_bias, ((0, 0), (0, t - 49), (0, t - 49)))
        rb = rb.at[:, :, 49:].set(-1e9)

        for bw in (32, 16, 8, 4, 2, 1):
            if nw % bw == 0:
                try:
                    print(f"# stage {si}: trying aligned bw={bw}...",
                          file=sys.stderr, flush=True)
                    def var(y, _bw=bw):
                        return aligned_block(
                            y, ln1s, ln1b, wqkv3, bqkv3, wprojh, bproj, rb,
                            ln2s, ln2b, w1, b1, w2, b2, heads, scale, 1e-5,
                            _bw,
                        )

                    ms_var = _measure(var, x, args.steps)
                    # numerical sanity (bf16 tolerance)
                    a = np.asarray(prod(x), np.float32)
                    b = np.asarray(var(x), np.float32)
                    err = float(
                        np.max(np.abs(a[:, :49] - b[:, :49]))
                        / (np.max(np.abs(a[:, :49])) + 1e-9)
                    )
                    break
                except Exception as e:  # VMEM overflow at this bw
                    last_err = e
                    continue
        else:
            raise last_err

        print(json.dumps({
            "stage": si, "c": c, "heads": heads, "nw": nw, "bw": bw,
            "prod_ms": round(ms_prod, 3), "aligned_ms": round(ms_var, 3),
            "speedup": round(ms_prod / ms_var, 3), "rel_err": err,
        }), flush=True)


if __name__ == "__main__":
    main()
