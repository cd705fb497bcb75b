#!/bin/bash
# Fire the queued TPU work as soon as the tunnel recovers.
#
# Current queue (CLAUDE.md, 2026-08-19 evening — tunnel wedged ~11:02):
#   1. bench_tile --uncertainty --samples 32, then --no_moments  (UQ moments A/B)
#   2. bench_stream --hw 1024 --uncertainty --samples 32, then --no_moments
#   3. bench.py sanity at HEAD (expect ~10.6k p/s)
#   4. bench.py --scan_steps 2, then 4 and 8 only if 2 compiled sanely
#      (LAST: new-graph remote compiles have wedged the tunnel before; each
#      arm is deadline-bounded and the ladder stops on the first failure)
#
# Polls the environment doctor (exit 2 = accelerator unreachable) on a
# 15-minute cadence, up to $POLLS polls; on the first healthy probe runs the
# queue strictly sequentially (never two TPU processes — see CLAUDE.md).
# Re-probes the tunnel between stages so a mid-queue wedge skips the rest
# instead of burning every stage's timeout. Per-stage stdout lands in
# results/tpu_queue/<stage>.log; progress notes append to $LOG. Recording the
# numbers in BASELINE.md is manual afterwards.
#
# Usage (repo root):  nohup scripts/tpu_queue.sh >/dev/null 2>&1 &

set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-results/tpu_queue.log}
DIR=results/tpu_queue
POLLS=${POLLS:-96} # 96 x 15 min = 24 h
mkdir -p "$DIR"
export SVRS_BENCH_PROBE_BUDGET_S=${SVRS_BENCH_PROBE_BUDGET_S:-300}

note() { echo "[$(date -u +%FT%TZ)] $*" >>"$LOG"; }

# run <stage-name> <timeout-s> <cmd...>  — returns the command's exit code.
run() {
    local name=$1 tmo=$2; shift 2
    note "start $name: $*"
    timeout "$tmo" "$@" >"$DIR/$name.log" 2>&1
    local rc=$?
    note "done  $name exit=$rc"
    return $rc
}

healthy() { timeout 300 python -m simple_vae_rs_tpu.doctor --budget 120 >>"$LOG" 2>&1; }

note "queue armed: tile/stream UQ moments A/B + bench sanity + scan_steps ladder (max $POLLS polls)"
for i in $(seq 1 "$POLLS"); do
    if healthy; then
        note "tunnel healthy (poll $i) — draining queue"
        run tile_moments    2400 python scripts/bench_tile.py --uncertainty --samples 32
        run tile_no_moments 2400 python scripts/bench_tile.py --uncertainty --samples 32 --no_moments
        healthy || { note "tunnel wedged after tile stage — stopping"; exit 1; }
        run stream_moments    3600 python scripts/bench_stream.py --hw 1024 --uncertainty --samples 32
        run stream_no_moments 3600 python scripts/bench_stream.py --hw 1024 --uncertainty --samples 32 --no_moments
        healthy || { note "tunnel wedged after stream stage — stopping"; exit 1; }
        run bench_sanity 3600 python bench.py
        healthy || { note "tunnel wedged after bench sanity — stopping"; exit 1; }
        # scan_steps ladder: k=2 bounded tight (compile risk); only climb on success.
        if run scan2 1800 python bench.py --scan_steps 2; then
            if run scan4 1800 python bench.py --scan_steps 4; then
                run scan8 2400 python bench.py --scan_steps 8
            fi
        else
            note "scan_steps 2 failed/timed out — abandoning the ladder (see CLAUDE.md caution)"
        fi
        note "queue done (record numbers in BASELINE.md by hand)"
        exit 0
    fi
    note "tunnel still wedged (poll $i)"
    sleep 900
done
note "gave up after $POLLS polls"
exit 1
