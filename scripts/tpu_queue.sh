#!/bin/bash
# Drain the queued TPU work across a FLAPPING tunnel (round 4).
#
# Stage-resumable: every poll that finds the tunnel healthy runs the
# next INCOMPLETE stage; a stage that fails (probe timeout, mid-run
# wedge) is retried on a later healthy window. Completion markers live
# in results/tpu_queue/ (<stage>.done), per-stage stdout in <stage>.log.
#
# Round-4 queue, in value order:
#   hf_tpu_e40     — canonical Cond arm on the (fixed-normalization)
#                    high-frequency PSF set: early read on the
#                    bicubic-beat experiment's jax side (verdict item 1)
#   hf_tpu_e120    — the flagship row (paired with the torch canonical
#                    e120 CPU run)
#   hf_ps32_e400   — LAST: small-preset long-convergence curve + saved
#                    weights for diagnostics (its bicubic bar is
#                    anchor-inflated at 32px tiles — not the win arm)
#   elbo_ab        — fused-ELBO vs XLA-loss training A/B (item 2);
#                    compiles ONE new step graph (the XLA-loss arm)
#   wl_chain       — width-in-lanes chain kernel vs XLA vs old chain
#                    (item 3); small fresh kernels, low compile risk
#   artifact_int8  — artifact vs live-int8 paired serving window (item 5)
#   bench_auto     — bench.py --scan_steps auto (item 6's probe policy
#                    on the real link) — doubles as the headline sanity
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

STAGES="hf_tpu_e40 hf_tpu_e120 elbo_ab hf_continue wl_chain artifact_int8 bench_auto hf_ps32_e400"
all_done() {
    for s in $STAGES; do
        [ -e "$DIR/$s.done" ] || return 1
    done
    return 0
}

note "round-4 queue armed: $STAGES (max $POLLS polls)"
for i in $(seq 1 "$POLLS"); do
    if all_done; then note "all stages done — exiting"; exit 0; fi
    if healthy; then
        note "tunnel healthy (poll $i) — running incomplete stages"
        run hf_tpu_e40    2400 python scripts/quality_parity.py --side tpu --dataset hf --epochs 40 \
          && run hf_tpu_e120   5400 python scripts/quality_parity.py --side tpu --dataset hf --epochs 120 \
          && run elbo_ab       3600 python scripts/bench_elbo_ab.py \
          && run hf_continue   5400 python scripts/hf_continue.py --to_epoch 400 \
          && run wl_chain      2400 python scripts/bench_chain.py \
          && run artifact_int8 3600 python scripts/bench_artifact_int8.py \
          && run bench_auto    3600 python bench.py --scan_steps auto \
          && run hf_ps32_e400  7200 python scripts/quality_parity.py --side tpu --preset small --dataset hf --epochs 400
        all_done && { note "queue drained — record numbers in BASELINE.md"; exit 0; }
        note "a stage failed (tunnel flapped?) — back to polling"
    else
        note "tunnel still wedged (poll $i)"
    fi
    sleep 900
done
note "gave up after $POLLS polls"
exit 1
