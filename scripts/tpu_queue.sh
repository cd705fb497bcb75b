#!/bin/bash
# Fire the queued TPU work as soon as the tunnel recovers.
#
# Polls the environment doctor (python -m simple_vae_rs_tpu.doctor, exit 2
# = accelerator unreachable) on a 15-minute cadence, up to $POLLS polls;
# on the first healthy probe runs, strictly sequentially (never two TPU
# processes — see CLAUDE.md):
#   1. python bench.py  — sanity at HEAD (its own wedge guard,
#      SVRS_BENCH_PROBE_BUDGET_S, aborts on a half-recovered tunnel)
#   2. scripts/quality_parity.py --side tpu --epochs 120 — the canonical
#      e120 framework arm the BASELINE parity table still needs
#      (~30 min at the healthy 14.4 s/epoch)
# Every stage is deadline-bounded so a re-wedging tunnel cannot hang the
# queue. Progress appends to $LOG; parity archives land in results/ as
# usual. Afterwards run scripts/quality_parity.py --report and
# scripts/plot_parity.py and update BASELINE.md by hand.
#
# Usage (repo root):  nohup scripts/tpu_queue.sh >/dev/null 2>&1 &

set -u
cd "$(dirname "$0")/.."
LOG=${LOG:-results/tpu_queue.log}
POLLS=${POLLS:-96} # 96 x 15 min = 24 h
mkdir -p results

note() { echo "[$(date -u +%FT%TZ)] $*" >>"$LOG"; }

note "queue armed: bench sanity + canonical e120 parity (max $POLLS polls)"
for i in $(seq 1 "$POLLS"); do
    if timeout 300 python -m simple_vae_rs_tpu.doctor --budget 120 >>"$LOG" 2>&1; then
        note "tunnel healthy (poll $i) — running bench.py"
        timeout 3600 python bench.py >>"$LOG" 2>&1
        note "bench exit=$?"
        note "starting the canonical e120 parity arm"
        timeout 14400 python scripts/quality_parity.py --side tpu \
            --epochs 120 >>"$LOG" 2>&1
        note "parity exit=$? — queue done (report + BASELINE update are manual)"
        exit 0
    fi
    note "tunnel still wedged (poll $i)"
    sleep 900
done
note "gave up after $POLLS polls"
exit 1
