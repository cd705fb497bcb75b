"""profile_summary parses a jax.profiler trace into per-category rows."""

import gzip
import json
import os
import subprocess
import sys


def test_profile_summary_on_synthetic_trace(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    os.makedirs(d)
    events = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Modules"}},
        {"ph": "M", "pid": 3, "tid": 3, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # two train_step module spans
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0.0, "dur": 100.0,
         "name": "jit_train_step(1)"},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 200.0, "dur": 100.0,
         "name": "jit_train_step(1)"},
        # ops inside the spans
        {"ph": "X", "pid": 3, "tid": 3, "ts": 10.0, "dur": 60.0,
         "name": "fusion.1",
         "args": {"hlo_category": "convolution fusion",
                  "model_flops": "1200000", "raw_bytes_accessed": "4096"}},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 210.0, "dur": 30.0,
         "name": "fusion.2",
         "args": {"hlo_category": "loop fusion",
                  "model_flops": "0", "raw_bytes_accessed": "8192"}},
        # an op OUTSIDE every span must be excluded
        {"ph": "X", "pid": 3, "tid": 3, "ts": 150.0, "dur": 500.0,
         "name": "fusion.3",
         "args": {"hlo_category": "loop fusion",
                  "model_flops": "0", "raw_bytes_accessed": "1"}},
    ]
    with gzip.open(d / "host.trace.json.gz", "wt") as fh:
        json.dump({"traceEvents": events}, fh)

    out = subprocess.run(
        [sys.executable, "scripts/profile_summary.py", str(tmp_path)],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr
    rows = [json.loads(line) for line in out.stdout.splitlines()]
    by_cat = {r["category"]: r for r in rows}
    assert by_cat["convolution fusion"]["ms"] == 0.06
    assert by_cat["convolution fusion"]["pct"] == 66.7
    assert by_cat["loop fusion"]["ms"] == 0.03  # excluded op not counted
    assert "2 'train_step' spans" in out.stderr
