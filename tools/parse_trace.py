"""Attribute a jax.profiler trace's device time to model modules.

Usage: python tools/parse_trace.py [trace_dir] [--ops]

Reads the newest ``*.trace.json.gz`` under
``<trace_dir>/plugins/profile/*/`` (default /tmp/tpu_trace), keeps the
"XLA Ops" device lanes, and aggregates durations by the ``tf_op``
provenance (jit(train_step)/jvp(SwinVoxModel)/<module>/...), splitting
forward from backward (``transpose(jvp(...))``).  ``--ops`` prints the
top individual ops with FLOPs / bytes / effective rates instead.

This attribution drove the optimization log in PERFORMANCE.md.
"""

from __future__ import annotations

import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def load_events(trace_dir: str):
    paths = sorted(
        glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz")
    )
    if not paths:
        raise SystemExit(f"no trace under {trace_dir}/plugins/profile/")
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    tid_names = {
        (e["pid"], e["tid"]): e["args"]["name"]
        for e in events
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    out = []
    for e in events:
        if e.get("ph") != "X":
            continue
        if "XLA Ops" not in tid_names.get((e["pid"], e["tid"]), ""):
            continue
        out.append(e)
    # traced-step count = the MODE of per-op occurrence counts (the max
    # overcounts when an op runs multiple times per step, e.g. inside a
    # grad-accumulation lax.scan)
    counts = defaultdict(int)
    for e in out:
        counts[e["name"]] += 1
    if counts:
        freq = defaultdict(int)
        for c in counts.values():
            freq[c] += 1
        steps = max(freq.items(), key=lambda kv: kv[1])[0]
    else:
        steps = 1
    return out, steps


def by_module(events, steps):
    agg = defaultdict(float)
    total = 0.0
    for e in events:
        args = e.get("args", {})
        top = args.get("tf_op", "")
        dur = e.get("dur", 0) / 1e3 / steps
        total += dur
        m = re.search(r"jit\([^)]*\)/(.*)", top)
        path_s = m.group(1) if m else top or "(no-op-info)"
        bwd = "transpose(jvp" in path_s
        mm = re.search(
            r"jvp\(\w+\)\)?/([a-zA-Z0-9_]+)(/([a-zA-Z0-9_]+))?", path_s
        )
        if mm:
            mod = mm.group(1)
            sub = mm.group(3) or ""
            if mod == "encoder" and sub:
                mod = f"encoder/{sub.split('_')[0]}"
            key = ("bwd " if bwd else "fwd ") + mod
        else:
            key = "other"
        agg[key] += dur
    print(f"TOTAL {total:.1f} ms/step over {steps} traced steps")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1]):
        if v >= 0.05:
            print(f"{v:8.2f} ms  {k}")


def by_op(events, steps, top_n=30):
    agg = defaultdict(lambda: [0.0, 0, 0.0, 0.0])
    for e in events:
        args = e.get("args", {})
        op = args.get("tf_op", "")[:100] or e["name"]
        a = agg[(op, args.get("hlo_category", "?")[:18])]
        a[0] += e.get("dur", 0) / 1e3 / steps
        a[1] += 1
        a[2] += float(args.get("model_flops", 0) or 0) / steps
        a[3] += float(args.get("bytes_accessed", 0) or 0) / steps
    for (op, cat), (d, n, fl, ba) in sorted(
        agg.items(), key=lambda kv: -kv[1][0]
    )[:top_n]:
        # fl/1e9 GFLOP over d ms = TFLOP/s; v5e bf16 peak ~197 TFLOP/s
        mxu = (fl / 1e9 / d) / 197.0 * 100 if d else 0
        bw = ba / 1e6 / d if d else 0
        print(
            f"{d:7.2f} ms {cat:18s} {mxu:5.1f}%MXU {bw:6.0f}GB/s  {op}"
        )


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    trace_dir = args[0] if args else "/tmp/tpu_trace"
    events, steps = load_events(trace_dir)
    if "--ops" in sys.argv:
        by_op(events, steps)
    else:
        by_module(events, steps)


if __name__ == "__main__":
    main()
