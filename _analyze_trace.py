"""Decompose a jax.profiler trace: sum TensorCore op durations by bucket.

Usage: python _analyze_trace.py <profile_dir> [n_top]
Parses plugins/profile/<ts>/*.trace.json.gz (perfetto JSON), keeps events on
TensorCore op lanes (XLA Ops), aggregates by op name, and buckets into the
BENCH.md categories (layer matmuls / loss head / attention / LN chains /
copies+other).
"""

import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def load_events(profile_dir):
    paths = sorted(Path(profile_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace in {profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data["traceEvents"]


def main():
    events = load_events(sys.argv[1])
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    # map pid/tid -> lane name
    lanes = {}
    procs = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "thread_name":
                lanes[(e["pid"], e["tid"])] = e["args"]["name"]
            elif e.get("name") == "process_name":
                procs[e["pid"]] = e["args"]["name"]

    dur_by_name = defaultdict(float)
    cnt_by_name = defaultdict(int)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lanes.get((e["pid"], e["tid"]), "")
        proc = procs.get(e["pid"], "")
        if "XLA Ops" not in lane and "XLA Ops" not in proc:
            continue
        d = e.get("dur", 0) / 1e3  # us -> ms
        name = e["name"]
        dur_by_name[name] += d
        cnt_by_name[name] += 1
        total += d

    print(f"total TensorCore op time: {total:.1f} ms (all steps captured)")
    items = sorted(dur_by_name.items(), key=lambda kv: -kv[1])
    print(f"\ntop {n_top} ops:")
    for name, d in items[:n_top]:
        print(f"  {d:8.3f} ms  x{cnt_by_name[name]:<4d} {name[:110]}")

    buckets = defaultdict(float)
    for name, d in items:
        n = name.lower()
        if "pallas" in n or re.search(r"wedge|flash|attn_kernel", n):
            buckets["attention-kernels"] += d
        elif re.search(r"fusion", n) and re.search(r"reduce|convert|exp", n):
            buckets["softmax/reduce-fusions"] += d
        elif "dot" in n or "convolution" in n or "einsum" in n:
            buckets["matmuls"] += d
        elif "dynamic-update-slice" in n or "copy" in n or "slice" in n:
            buckets["copies/DUS/slices"] += d
        elif "all-reduce" in n or "collective" in n:
            buckets["collectives"] += d
        else:
            buckets["other-fusions/elementwise"] += d
    print("\ncrude buckets:")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {v:8.1f} ms  {k}")


if __name__ == "__main__":
    main()
