"""Summarize a jax.profiler trace: device-op time ranked by op name.

The repo's perf methodology (docs/PERFORMANCE.md) is to profile the REAL
engine and attack the top device ops; this turns a ``jax.profiler``
trace (``utils.profiling.trace`` / ``bench.py --profile``) into that
ranked table without TensorBoard, by parsing the Chrome-trace JSON the
profiler writes next to the xplane file (no TF/xprof protos needed —
this environment ships neither).

Usage:
  python tools/trace_summary.py /tmp/tracedir [--top 30] [--merge-fusions]

``--merge-fusions`` groups ``name.N`` / ``name_N`` duplicate-suffixed op
instances so per-op totals aggregate across a scan's unrolled copies.
"""

import argparse
import collections
import gzip
import json
import pathlib
import re


def load_events(trace_dir):
    paths = sorted(pathlib.Path(trace_dir).rglob("*.trace.json.gz"))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)
    return data.get("traceEvents", [])


def device_pids(events):
    """pids of device (TPU/GPU) process tracks, from metadata events."""
    names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            names[ev["pid"]] = ev.get("args", {}).get("name", "")
    return {
        pid for pid, name in names.items()
        if any(k in name for k in ("TPU", "GPU", "/device:", "Device"))
        and "Host" not in name
    }


def summarize(events, merge_fusions=False):
    pids = device_pids(events)
    totals = collections.Counter()
    counts = collections.Counter()
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in pids:
            continue
        name = ev.get("name", "?")
        if merge_fusions:
            name = re.sub(r"[._]\d+$", "", name)
        totals[name] += ev.get("dur", 0)  # us
        counts[name] += 1
    return totals, counts


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("trace_dir")
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--merge-fusions", action="store_true")
    args = ap.parse_args(argv)
    events = load_events(args.trace_dir)
    totals, counts = summarize(events, args.merge_fusions)
    total = sum(totals.values())
    print(f"total device op time: {total/1e3:.3f} ms")
    for key, us in totals.most_common(args.top):
        print(f"{us/1e3:9.3f} ms  {counts[key]:6d}x  {key[:110]}")


if __name__ == "__main__":
    main()
