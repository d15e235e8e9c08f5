"""Summarize a jax.profiler trace (.trace.json.gz) into per-op totals.

No TensorFlow/xprof needed: the perfetto-format JSON carries every device
op event with its duration.  Aggregates by HLO op-name prefix so the
output answers "which kernels own the step time" directly.

    python tools/parse_trace.py /tmp/agt_trace --top 40
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
        raise SystemExit(f"no .trace.json.gz under {trace_dir}")
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    return path, data.get("traceEvents", [])


def device_pids(events):
    """pids whose process name looks like a device (TPU/accelerator)."""
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e.get("args", {}).get("name", "")
    return {pid for pid, n in names.items()
            if re.search(r"TPU|GPU|/device|Device", n, re.I)}, names


_GENERIC = re.compile(r"\.\d+$")


def bucket(name):
    """Collapse 'fusion.123' -> 'fusion', keep custom-call kernel names."""
    n = name.split("/")[-1]
    n = _GENERIC.sub("", n)
    return n


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--by-raw", action="store_true",
                    help="aggregate by full op name instead of bucket")
    args = ap.parse_args()

    path, events = load_events(args.trace_dir)
    dev, names = device_pids(events)
    totals = collections.Counter()
    counts = collections.Counter()
    wall = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev and e.get("pid") not in dev:
            continue
        dur = e.get("dur", 0)  # microseconds
        key = e.get("name", "?") if args.by_raw else bucket(e.get("name", "?"))
        totals[key] += dur
        counts[key] += 1
        wall += dur
    print(f"# {path}")
    print(f"# processes: { {p: n for p, n in names.items()} }")
    print(f"# device-op total: {wall/1e3:.2f} ms across {sum(counts.values())} events")
    print(f"{'total_ms':>10} {'count':>7}  op")
    for key, us in totals.most_common(args.top):
        print(f"{us/1e3:10.2f} {counts[key]:7d}  {key}")


if __name__ == "__main__":
    main()
