"""Isolation bench for the refiner down1 (Conv3d 1->32, k4, p2) backward.

The batch-128 trace attributes 8.78 ms/step at 1.9% MXU / 69 GB/s to
this layer's backward (transpose(jvp)/refiner/down1_conv) — XLA's worst
case: 1 input channel makes the filter-gradient conv contraction-starved
and the 1-lane input-gradient output wastes 127/128 lanes.  This bench
times every candidate formulation in isolation on the real chip so the
full-step A/B (tools/ab_bench.py --set NETWORK.REFINER_UNROLLED_CONV=true)
only runs on the measured winner.  History: the lax.scan-chunked patch
stack LOST end-to-end (round 2), the flat stack won in isolation but
lost end-to-end (round 3, 567 -> 465 img/s) — hence per-piece numbers
first, whole-step verdicts second.

Usage: python tools/down1_bench.py [--batch 128] [--trials 5] [--steps 20]
Prints one JSON line per candidate.
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

K = 4
C = 32
TAPS = [(a, b, c) for a in range(K) for b in range(K) for c in range(K)]


def fwd_conv(x, w):
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    return jax.lax.conv_general_dilated(
        x, w, (1, 1, 1), [(2, 2)] * 3, dimension_numbers=dn
    )


# ---- dW candidates --------------------------------------------------------


def dw_xla(x, w, dy):
    _, vjp = jax.vjp(lambda w_: fwd_conv(x, w_), w)
    return vjp(dy)[0]


def dw_stack(x, w, dy):
    so = x.shape[1] + 1
    xp = jnp.pad(x[..., 0], ((0, 0),) + ((2, 2),) * 3)
    patches = jnp.stack(
        [xp[:, a : a + so, b : b + so, c : c + so] for (a, b, c) in TAPS],
        axis=-1,
    )
    dk = jax.lax.dot_general(
        patches.reshape(-1, K * K * K),
        dy.reshape(-1, C),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dk.reshape(K, K, K, 1, C).astype(w.dtype)


def dw_patches(x, w, dy):
    # one conv-with-identity-kernel materializes all 64 taps (64 dense
    # lanes), then one deep MXU dot
    p = jax.lax.conv_general_dilated_patches(
        x,
        (K, K, K),
        (1, 1, 1),
        [(2, 2)] * 3,
        dimension_numbers=jax.lax.conv_dimension_numbers(
            x.shape, (K, K, K, 1, C), ("NDHWC", "DHWIO", "NDHWC")
        ),
    )  # [B, so, so, so, 64]
    dk = jax.lax.dot_general(
        p.reshape(-1, K * K * K),
        dy.reshape(-1, C),
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return dk.reshape(K, K, K, 1, C).astype(w.dtype)


def dw_zpatch(x, w, dy):
    # patch ONLY the depth axis (4 taps -> channels), turning the
    # 1-input-channel 3D filter-gradient into a 4-input-channel 2D one:
    # dW[a,b,c,o] = sum_{n,i,j,k} xz[n,i+a,j+b,k,c] * dy[n,i,j,k,o]
    # with (n,k) merged into the batch.  43 MB extra HBM vs dw_patches'
    # 588 MB, and XLA gets a contraction 4x deeper per tap.
    b, s = x.shape[0], x.shape[1]
    so = s + 1
    xp = jnp.pad(x[..., 0], ((0, 0),) + ((2, 2),) * 3)  # [b, 36,36,36]
    xz = jnp.stack(
        [xp[:, :, :, c : c + so] for c in range(K)], axis=-1
    )  # [b, 36, 36, so, 4]
    # merge (n, k) into batch: [b*so, 36, 36, 4]
    xz2 = xz.transpose(0, 3, 1, 2, 4).reshape(b * so, s + K, s + K, K)
    dy2 = dy.transpose(0, 3, 1, 2, 4).reshape(b * so, so, so, C)
    dn = jax.lax.conv_dimension_numbers(
        (1, so, so, K), (K, K, K, C), ("NHWC", "HWIO", "NHWC")
    )
    # filter-gradient of the implied 2D conv via vjp on a same-geometry fwd
    def fwd2d(w2):
        return jax.lax.conv_general_dilated(
            xz2, w2, (1, 1), [(0, 0), (0, 0)], dimension_numbers=dn
        )

    _, vjp = jax.vjp(fwd2d, jnp.zeros((K, K, K, C), dy.dtype))
    dk = vjp(dy2)[0]  # [a, b, c(z-tap as in-ch), o]
    return dk.reshape(K, K, K, 1, C).astype(w.dtype)


def dw_slicedot(x, w, dy):
    # z-patch to 4 lanes, then for each (a,b) xy-tap one dot_general over
    # (n, i, j, k): 16 dots of [Kc=4] x [C=32], contraction depth b*so^3.
    b, s = x.shape[0], x.shape[1]
    so = s + 1
    xp = jnp.pad(x[..., 0], ((0, 0),) + ((2, 2),) * 3)
    xz = jnp.stack(
        [xp[:, :, :, c : c + so] for c in range(K)], axis=-1
    )  # [b, 36, 36, so, 4]
    dyf = dy.reshape(-1, C)
    outs = []
    for a in range(K):
        for b_ in range(K):
            sl = xz[:, a : a + so, b_ : b_ + so].reshape(-1, K)
            outs.append(
                jax.lax.dot_general(
                    sl, dyf,
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
            )  # [4, C]
    dk = jnp.stack(outs).reshape(K, K, K, C)
    return dk.reshape(K, K, K, 1, C).astype(w.dtype)


# ---- dx candidates --------------------------------------------------------


def dx_xla(x, w, dy):
    _, vjp = jax.vjp(lambda x_: fwd_conv(x_, w), x)
    return vjp(dy)[0]


def dx_tconv(x, w, dy):
    # explicit transposed conv onto 1 output lane (what unrolled_conv uses)
    k_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)  # [k,k,k,C,1]
    dn = jax.lax.conv_dimension_numbers(
        dy.shape, k_t.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    return jax.lax.conv_general_dilated(
        dy, k_t.astype(dy.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=dn,
    ).astype(x.dtype)


def dx_pad8(x, w, dy):
    # same transposed conv but with the kernel zero-padded to 8 output
    # channels so XLA stops laying out a 1-lane result tensor
    k_t = jnp.flip(w, (0, 1, 2)).swapaxes(3, 4)  # [k,k,k,C,1]
    k_t8 = jnp.pad(k_t, ((0, 0),) * 4 + ((0, 7),))
    dn = jax.lax.conv_dimension_numbers(
        dy.shape, k_t8.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    out = jax.lax.conv_general_dilated(
        dy, k_t8.astype(dy.dtype), (1, 1, 1), [(1, 1)] * 3,
        dimension_numbers=dn,
    )
    return out[..., :1].astype(x.dtype)


def dx_matmul(x, w, dy):
    # channels -> taps with ONE MXU dot, then the 64 shifted tap planes
    # collapse into dx_pad as a single gather fusion
    b, s = x.shape[0], x.shape[1]
    so = s + 1
    w_mat = w.reshape(K * K * K, C)  # tap-major
    u = jax.lax.dot_general(
        dy.reshape(-1, C), w_mat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, so, so, so, K * K * K)
    dxp = jnp.zeros((b, s + K, s + K, s + K), jnp.float32)
    for i, (a, b_, c) in enumerate(TAPS):
        dxp = jax.lax.dynamic_update_slice(
            dxp,
            jax.lax.dynamic_slice(
                dxp, (0, a, b_, c), (x.shape[0], so, so, so)
            )
            + u[..., i],
            (0, a, b_, c),
        )
    return dxp[:, 2 : 2 + s, 2 : 2 + s, 2 : 2 + s, None].astype(x.dtype)


def dx_matmul_pad(x, w, dy):
    # same einsum but the shifted accumulation phrased as pad+add chains
    # (XLA fuses pads into the add tree where dynamic_update_slice cannot)
    b, s = x.shape[0], x.shape[1]
    so = s + 1
    w_mat = w.reshape(K * K * K, C)
    u = jax.lax.dot_general(
        dy.reshape(-1, C), w_mat,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(b, so, so, so, K * K * K)
    dxp = None
    for i, (a, b_, c) in enumerate(TAPS):
        t = jnp.pad(
            u[..., i],
            ((0, 0), (a, K - 1 - a), (b_, K - 1 - b_), (c, K - 1 - c)),
        )
        dxp = t if dxp is None else dxp + t
    return dxp[:, 2 : 2 + s, 2 : 2 + s, 2 : 2 + s, None].astype(x.dtype)


def bwd_both_xla(x, w, dy):
    # the pair the fused kernel replaces (reference cost = dw_xla + dx_xla)
    _, vjp = jax.vjp(lambda x_, w_: fwd_conv(x_, w_), x, w)
    dx, dw = vjp(dy)
    return dx + 0.0, dw  # tuple -> summed scalar downstream


def bwd_both_pallas(x, w, dy):
    from swinvox_tpu.ops.pallas_down1 import _down1_bwd

    dx, dw = _down1_bwd(x, w, dy)
    return dx, dw


CANDIDATES = {
    "dw_xla": dw_xla,
    "dw_stack": dw_stack,
    "dw_patches": dw_patches,
    "dw_zpatch": dw_zpatch,
    "dw_slicedot": dw_slicedot,
    "dx_xla": dx_xla,
    "dx_tconv": dx_tconv,
    "dx_pad8": dx_pad8,
    "dx_matmul": dx_matmul,
    "dx_matmul_pad": dx_matmul_pad,
    "bwd_both_xla": bwd_both_xla,
    "bwd_both_pallas": bwd_both_pallas,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--trials", type=int, default=5)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--only", action="append", default=None,
                    help="bench only these candidates (parity still all)")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    b, s = args.batch, 32
    x = jax.device_put(
        rng.standard_normal((b, s, s, s, 1)).astype(jnp.bfloat16)
    )
    w = jax.device_put(
        (rng.standard_normal((K, K, K, 1, C)) * 0.1).astype(jnp.bfloat16)
    )
    dy = jax.device_put(
        rng.standard_normal((b, s + 1, s + 1, s + 1, C)).astype(jnp.bfloat16)
    )

    # parity first (f32 reference on small batch)
    xs, ws, dys = x[:4].astype(jnp.float32), w.astype(jnp.float32), dy[
        :4
    ].astype(jnp.float32)
    ref_dw = np.asarray(dw_xla(xs, ws, dys), np.float32)
    ref_dx = np.asarray(dx_xla(xs, ws, dys), np.float32)
    for name, fn in CANDIDATES.items():
        out = fn(xs, ws, dys)
        if name.startswith("bwd_both"):
            pairs = [(out[0], ref_dx), (out[1], ref_dw)]
        else:
            pairs = [(out, ref_dw if name.startswith("dw") else ref_dx)]
        # the Pallas candidate's MXU dots round bf16 DIFFERENTLY from
        # XLA's conv-backward bf16 rounding (both are ~2.4e-3 from the
        # Precision.HIGHEST truth on f32 operands; on the production
        # bf16 path they are equivalent) — exact CPU parity is pinned in
        # tests/test_pallas.py::test_down1_fused_backward_grad_parity
        tol = 5e-3 if name.startswith("bwd_both_pallas") else 5e-5
        for got, ref in pairs:
            got = np.asarray(got, np.float32)
            err = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-8)
            assert err < tol, (name, err)
    print(json.dumps({"parity": "ok"}), flush=True)

    bench = {k: v for k, v in CANDIDATES.items()
             if not args.only or k in args.only}
    for name, fn in bench.items():
        # chain steps through a data dependency so the tunnel can't lie
        @jax.jit
        def chain(x, w, dy, fn=fn):
            def body(carry, _):
                # bounded data dependency: the tiny scaled carry keeps the
                # steps serialized without growing the operand magnitude
                out = fn(x, w, dy + (carry * 1e-12).astype(dy.dtype))
                if isinstance(out, tuple):
                    acc = sum(o.astype(jnp.float32).mean() for o in out)
                else:
                    acc = out.astype(jnp.float32).mean()
                return acc, None
            acc, _ = jax.lax.scan(
                body, jnp.zeros((), jnp.float32), None, length=args.steps
            )
            return acc

        float(chain(x, w, dy))  # compile+warm
        best = float("inf")
        for _ in range(args.trials):
            t0 = time.perf_counter()
            v = float(chain(x, w, dy))
            dt = time.perf_counter() - t0
            assert np.isfinite(v)
            best = min(best, dt)
        ms = 1000.0 * best / args.steps
        print(
            json.dumps({"candidate": name, "ms_per_call": round(ms, 3)}),
            flush=True,
        )


if __name__ == "__main__":
    main()
