#!/bin/bash
# Drain the queued TPU work across a FLAPPING tunnel (round 5).
#
# Stage-resumable: every poll that finds the tunnel healthy runs the
# next INCOMPLETE stage; a stage that fails (probe timeout, mid-run
# wedge) is retried on a later healthy window. Completion markers live
# in results/tpu_queue/ (<stage>.done), per-stage stdout in <stage>.log.
#
# Round-5 queue, in value order:
#   elbo_ab_r5     — re-run the training-loss A/B with the arms now
#                    driven by TrainConfig.train_elbo: confirms the new
#                    xla DEFAULT is the faster arm (verdict item 1 done
#                    condition)
#   artifact_int8w — the paired serving window grown a live_int8w arm:
#                    live f32 vs live W8A8 vs live int8-WEIGHTS vs the
#                    f32/int8 artifacts, one session (verdict item 2)
#   bench_headline — bench.py: headline throughput with the train_elbo
#                    default flipped (expected ~+1% vs r4's 10,610 p/s)
#   hf_mid15_e350  — verdict item 7: the mid15 rebuild arm extended to
#                    e350 (fresh run; ~3.4 s/epoch on a healthy link) so
#                    the annealing conclusion replicates at the second
#                    texture level
#
# Usage (repo root):  nohup scripts/tpu_queue.sh >/dev/null 2>&1 &

set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-results/tpu_queue.log}
DIR=results/tpu_queue_r5
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

STAGES="elbo_ab_r5 artifact_int8w bench_headline hf_mid15_e350"
all_done() {
    for s in $STAGES; do
        [ -e "$DIR/$s.done" ] || return 1
    done
    return 0
}

note "round-5 queue armed: $STAGES (max $POLLS polls)"
for i in $(seq 1 "$POLLS"); do
    if all_done; then note "all stages done — exiting"; exit 0; fi
    if healthy; then
        note "tunnel healthy (poll $i) — running incomplete stages"
        run elbo_ab_r5     3600 python scripts/bench_elbo_ab.py \
          && run artifact_int8w 3600 python scripts/bench_artifact_int8.py \
          && run bench_headline 3600 python bench.py \
          && run hf_mid15_e350  5400 python scripts/quality_parity.py --side tpu --dataset hf --epochs 350
        all_done && { note "r5 queue drained — record numbers in BASELINE.md"; exit 0; }
        note "a stage failed (tunnel flapped?) — back to polling"
    else
        note "tunnel still wedged (poll $i)"
    fi
    sleep 900
done
note "gave up after $POLLS polls"
exit 1
