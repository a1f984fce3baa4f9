"""Decompose a jax.profiler trace: EXCLUSIVE (self) TensorCore op times.

Usage: python tools/analyze_trace.py <profile_dir> [n_top]

Parses plugins/profile/<ts>/*.trace.json.gz (perfetto JSON), keeps events
on "XLA Ops" lanes, and computes each op's exclusive time with an
interval stack (container ops — while/call/fusion parents — get their
children's time subtracted), so the sum of self-times equals wall step
time. This is the r4 tooling that found the loss-head fp32-logits
materialization (BENCH.md "Loss-head study (r4)").

Pair with tools/dump_bench_hlo.py: profile op names match the optimized
HLO instruction names ONLY when both come from the same build — re-dump
the HLO after any model change before mapping names.
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path


def load_events(profile_dir):
    paths = sorted(Path(profile_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace in {profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        return json.load(f)["traceEvents"]


def exclusive_times(events):
    """{op name: (self ms, count)} over all XLA Ops lanes."""
    lanes, procs = {}, {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "thread_name":
                lanes[(e["pid"], e["tid"])] = e["args"]["name"]
            elif e.get("name") == "process_name":
                procs[e["pid"]] = e["args"]["name"]
    bylane = defaultdict(list)
    for e in events:
        if e.get("ph") != "X":
            continue
        lane = lanes.get((e["pid"], e["tid"]), "") + procs.get(e["pid"], "")
        if "XLA Ops" not in lane:
            continue
        bylane[(e["pid"], e["tid"])].append(e)
    excl = defaultdict(float)
    cnt = defaultdict(int)
    for evs in bylane.values():
        evs.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (ts, dur, name) of open intervals
        for e in evs:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1][0] + stack[-1][1]:
                stack.pop()
            if stack:
                excl[stack[-1][2]] -= dur / 1e3
            stack.append((ts, dur, e["name"]))
            excl[e["name"]] += dur / 1e3
            cnt[e["name"]] += 1
    return excl, cnt


def main():
    events = load_events(sys.argv[1])
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    excl, cnt = exclusive_times(events)
    total = sum(excl.values())
    print(f"exclusive TensorCore total: {total:.1f} ms (all captured steps)")
    items = sorted(excl.items(), key=lambda kv: -kv[1])
    for name, d in items[:n_top]:
        print(f"  {d:8.3f} ms  x{cnt[name]:<4d} {name[:110]}")


if __name__ == "__main__":
    main()
