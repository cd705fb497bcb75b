#!/bin/bash
# Drain the queued TPU work across a FLAPPING tunnel.
#
# The tunnel comes back in short healthy windows (2026-08-19 evening: one
# ~8-minute window at 23:33-23:41 ran two stages before it wedged again),
# so the queue is stage-resumable: every poll that finds the tunnel
# healthy runs the next INCOMPLETE stage; a stage that fails (probe
# timeout, wedge mid-run) is retried on a later window instead of
# aborting the whole queue. Completion markers live in results/tpu_queue/
# (<stage>.done), per-stage stdout in <stage>.log.
#
# Remaining queue (stream_moments already landed 2026-08-19 23:43:
# 1024x1024x4 ps=64 batch=32 samples=32 uncertainty, device moments:
# 16.66 s/scene, ~2489 window-draws/s):
#   tile_moments / tile_no_moments   — whole-raster UQ A/B (moments hook)
#   stream_no_moments                — streamed-scene UQ A/B partner
#   bench_sanity                     — bench.py at HEAD (expect ~10.6k p/s)
#   scan2 -> scan4 -> scan8          — dispatch-fusion ladder, LAST
#     (new-graph remote compiles have wedged the tunnel; each rung is
#     deadline-bounded and the ladder stops at the first failure)
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

# run <stage> <timeout-s> <cmd...> — marks <stage>.done on success.
run() {
    local name=$1 tmo=$2; shift 2
    [ -e "$DIR/$name.done" ] && return 0
    note "start $name: $*"
    timeout "$tmo" "$@" >"$DIR/$name.log" 2>&1
    local rc=$?
    note "done  $name exit=$rc"
    [ "$rc" -eq 0 ] && touch "$DIR/$name.done"
    return $rc
}

healthy() { timeout 300 python -m simple_vae_rs_tpu.doctor --budget 120 >>"$LOG" 2>&1; }

all_done() {
    for s in tile_moments tile_no_moments stream_no_moments bench_sanity scan2; do
        [ -e "$DIR/$s.done" ] || return 1
    done
    return 0
}

note "queue re-armed (stage-resumable): tile A/B + stream_no_moments + bench + scan ladder (max $POLLS polls)"
for i in $(seq 1 "$POLLS"); do
    if all_done; then note "all stages done — exiting"; exit 0; fi
    if healthy; then
        note "tunnel healthy (poll $i) — running incomplete stages"
        run tile_moments      2400 python scripts/bench_tile.py --uncertainty --samples 32 \
          && run tile_no_moments   2400 python scripts/bench_tile.py --uncertainty --samples 32 --no_moments \
          && run stream_no_moments 3600 python scripts/bench_stream.py --hw 1024 --uncertainty --samples 32 --no_moments \
          && run bench_sanity      3600 python bench.py \
          && { # scan ladder only reached with everything else banked
               if run scan2 1800 python bench.py --scan_steps 2; then
                   run scan4 1800 python bench.py --scan_steps 4 \
                     && run scan8 2400 python bench.py --scan_steps 8
               else
                   note "scan_steps 2 failed — not retrying the ladder (compile risk)"
                   touch "$DIR/scan2.done"  # do not re-risk a wedge-y compile
               fi; }
        all_done && { note "queue drained — record numbers in BASELINE.md"; exit 0; }
        note "a stage failed (tunnel flapped?) — back to polling"
    else
        note "tunnel still wedged (poll $i)"
    fi
    sleep 900
done
note "gave up after $POLLS polls"
exit 1
