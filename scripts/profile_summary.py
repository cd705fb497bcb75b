#!/usr/bin/env python
"""Summarize a ``--profile_dir`` trace: device time per HLO category.

Parses the ``*.trace.json.gz`` jax.profiler writes (no tensorboard
needed), restricts to the ``jit_train_step`` module spans, and prints the
table BASELINE.md's MFU-decomposition section is built from: per-category
device time, achieved TF/s (model_flops) and raw GB/s. One JSON line per
category plus a human-readable table on stderr.

Usage:
    python train.py ... --epochs 2 --profile_dir /tmp/prof
    python scripts/profile_summary.py /tmp/prof [--module train_step]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument(
        "--module", default="train_step",
        help="substring of the XLA module to attribute (default: train_step;"
             " use '' for all device ops)",
    )
    args = ap.parse_args()

    traces = sorted(
        glob.glob(
            os.path.join(args.profile_dir, "**", "*.trace.json.gz"),
            recursive=True,
        )
    )
    if not traces:
        sys.exit(f"no *.trace.json.gz under {args.profile_dir}")
    path = traces[-1]
    print(f"# {path}", file=sys.stderr)
    data = json.load(gzip.open(path, "rt"))
    events = data.get("traceEvents", [])

    # device pid + thread ids ("XLA Modules" / "XLA Ops")
    dev_pids = {
        e["pid"]
        for e in events
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "TPU" in e["args"].get("name", "")
    }
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and e.get("pid") in dev_pids:
            tids.setdefault(e["pid"], {})[e["args"].get("name", "")] = e["tid"]
    if not dev_pids:
        sys.exit("no TPU device process in trace (CPU-only run?)")
    pid = sorted(dev_pids)[0]
    mod_tid = tids.get(pid, {}).get("XLA Modules")
    ops_tid = tids.get(pid, {}).get("XLA Ops")

    spans = [
        (e["ts"], e["ts"] + e["dur"])
        for e in events
        if e.get("ph") == "X"
        and e.get("pid") == pid
        and e.get("tid") == mod_tid
        and args.module in e.get("name", "")
    ]
    spans.sort()

    def inside(ts: float) -> bool:
        if not args.module:
            return True
        # spans are few (one per step); linear scan is fine
        return any(a <= ts < b for a, b in spans)

    cat = collections.Counter()
    flops = collections.Counter()
    rbytes = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") == pid and e.get("tid") == ops_tid and inside(e["ts"]):
            a = e.get("args", {})
            c = a.get("hlo_category", "?")
            cat[c] += e.get("dur", 0)
            flops[c] += int(a.get("model_flops", 0) or 0)
            rbytes[c] += int(a.get("raw_bytes_accessed", 0) or 0)

    total = sum(cat.values())
    n = max(len(spans), 1)
    print(
        f"# {total/1e3:.2f} ms device time in {len(spans)} '{args.module}'"
        f" spans -> {total/1e3/n:.2f} ms/step",
        file=sys.stderr,
    )
    for c, d in cat.most_common():
        tfs = flops[c] / (d * 1e-6) / 1e12 if d else 0.0
        gbs = rbytes[c] / (d * 1e-6) / 1e9 if d else 0.0
        print(json.dumps({
            "category": c,
            "ms": round(d / 1e3, 3),
            "pct": round(100 * d / total, 1) if total else 0,
            "tflops_per_sec": round(tfs, 1),
            "raw_gb_per_sec": round(gbs, 1),
        }))


if __name__ == "__main__":
    main()
