#!/usr/bin/env python
"""Summarize a jax.profiler trace dir: top device ops by total self time.

No trace viewer ships in this image, so this parses the perfetto JSON the
profiler writes (plugins/profile/*/\*.trace.json.gz) directly and prints
per-op-category and per-op totals for the device track — enough to see
where a step's device time goes.

Usage: python scripts/parse_trace.py /tmp/some_trace_dir [--top 30]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re


def load_events(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--device_re", default="TPU|/device:|Chip",
                    help="regex matching device track process names")
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    print("trace:", path)

    # map pid -> process name to find device tracks
    pnames = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pnames[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in pnames.items()
                if re.search(args.device_re, n)}
    print("tracks:", {pid: n for pid, n in pnames.items()})

    tot = collections.Counter()
    cnt = collections.Counter()
    span = [None, None]
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0)
        name = e.get("name", "?")
        # strip fusion instance suffixes for grouping
        base = re.sub(r"[.\d]+$", "", name)
        tot[base] += dur
        cnt[base] += 1
        ts = e.get("ts", 0)
        span[0] = ts if span[0] is None else min(span[0], ts)
        span[1] = ts + dur if span[1] is None else max(span[1], ts + dur)

    wall = (span[1] - span[0]) / 1e3 if span[0] is not None else 0.0
    busy = sum(tot.values()) / 1e3
    print(f"device wall: {wall:.1f} ms, busy: {busy:.1f} ms, "
          f"events: {sum(cnt.values())}")
    print(f"{'total ms':>10} {'n':>7} {'avg us':>8}  op")
    for name, us in tot.most_common(args.top):
        print(f"{us / 1e3:10.2f} {cnt[name]:7d} {us / cnt[name]:8.1f}  "
              f"{name[:90]}")


if __name__ == "__main__":
    main()
