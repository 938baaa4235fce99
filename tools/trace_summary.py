"""Aggregate a jax.profiler trace into a device-op cost map.

Parses the trace-viewer JSON (trace.json.gz) that jax.profiler.trace
writes, keeps the TPU device lane, and buckets op time by fusion name /
HLO metadata so PERF.md cost maps (inference r3, training r4) come from
one reproducible tool instead of ad-hoc notebook code.

Usage:
  python tools/trace_summary.py DIR [--top 30] [--bucket REGEX=NAME ...]

DIR is the directory passed to jax.profiler.trace (the newest
plugins/profile/*/[[]*.trace.json.gz under it is used).  --bucket
patterns are tried in order against the op name; first match wins, the
rest land in 'other'.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(trace_dir: str):
    pats = sorted(
        glob.glob(os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz"))
    )
    if not pats:
        sys.exit(f"no trace.json.gz under {trace_dir}")
    path = pats[-1]
    data = json.load(gzip.open(path))
    ev = data["traceEvents"]
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
        and "args" in e
    }
    dev_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    return path, [e for e in ev if e.get("ph") == "X" and e.get("pid") in dev_pids]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--bucket", action="append", default=[],
                    help="REGEX=NAME, first match wins")
    ap.add_argument("--steps", type=int, default=1,
                    help="divide totals by this many traced steps")
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    buckets = []
    for spec in args.bucket:
        pat, _, name = spec.partition("=")
        buckets.append((re.compile(pat), name or pat))

    by_name = collections.Counter()
    by_bucket = collections.Counter()
    n_by_name = collections.Counter()
    total = 0.0
    for e in events:
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        total += dur
        by_name[name] += dur
        n_by_name[name] += 1
        for pat, bname in buckets:
            if pat.search(name):
                by_bucket[bname] += dur
                break
        else:
            by_bucket["other"] += dur

    s = args.steps
    print(f"# {path}")
    print(f"device total: {total / s:.1f} ms/step ({len(events)} ops)\n")
    if buckets:
        print("| bucket | ms/step | % |")
        print("|---|---|---|")
        for bname, ms in by_bucket.most_common():
            print(f"| {bname} | {ms / s:.1f} | {100 * ms / total:.1f} |")
        print()
    print(f"| top op (x count) | ms/step | % |")
    print("|---|---|---|")
    for name, ms in by_name.most_common(args.top):
        short = name if len(name) <= 90 else name[:87] + "..."
        print(f"| {short} (x{n_by_name[name]}) | {ms / s:.2f} "
              f"| {100 * ms / total:.1f} |")


if __name__ == "__main__":
    main()
