"""Re-parse a jax.profiler trace, grouping device-op time by HLO source line.

Offline companion to tools/profile_step_trace.py: reads the newest
``*.trace.json.gz`` under the given dir and aggregates XLA-op durations by
the ``args.source`` (file:line) metadata each event carries — the
attribution that found the NLL take_along_axis gather (docs/PERF_NOTES.md).
``while``-umbrella events (the step-chaining fori_loop) are skipped so the
inner ops aren't double counted.

Usage: python tools/trace_by_source.py [--dir /tmp/pva_trace] [--steps 20]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
from collections import defaultdict


def load_events(trace_dir: str):
    traces = sorted(
        glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime)
    if not traces:
        raise SystemExit(f"no trace under {trace_dir}")
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", []), traces[-1]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", default="/tmp/pva_trace")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by", choices=["source", "op"], default="source",
                    help="group by source line or by tf_op path")
    args = ap.parse_args(argv)

    events, path = load_events(args.dir)
    names, tids = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")

    dur = defaultdict(float)
    cnt = defaultdict(int)
    ops = defaultdict(set)
    total = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if "TPU" not in names.get(e["pid"], ""):
            continue
        if "XLA Ops" not in tids.get((e["pid"], e["tid"]), ""):
            continue
        if e["name"].startswith(("while", "fori_loop")):
            continue  # umbrella over the chained steps; inner ops recorded
        a = e.get("args") or {}
        key = a.get("source") or a.get("tf_op") or "<no-source>"
        if args.by == "op":
            key = a.get("tf_op") or "<no-op>"
        d = e.get("dur", 0) / 1000.0
        dur[key] += d
        cnt[key] += 1
        ops[key].add(e["name"])
        total += d

    print(f"# inner device-op time: {total:.3f} ms "
          f"({total / args.steps:.3f} ms/step)  [{path}]")
    for key in sorted(dur, key=dur.get, reverse=True)[: args.top]:
        ex = sorted(ops[key])[:3]
        print(f"{dur[key] / args.steps:8.4f} ms/step  x{cnt[key] // args.steps:<4d}"
              f" {key[:100]}  e.g. {','.join(ex)[:70]}")


if __name__ == "__main__":
    main()
