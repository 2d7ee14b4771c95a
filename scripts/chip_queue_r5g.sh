#!/usr/bin/env bash
# Round-5 queue G: resolve queue r5f's anomalous head60 (43.22 steps/s vs
# the 985-1130 band) and decompose the warm-restart floor.
#   head_pf      dense 1M headline, per-frame series, Pallas dest ON
#   head_dp0_pf  same, PS_DEST_PALLAS=0 (the only unsharded change since
#                the last healthy dense window) — the A/B that separates
#                "dest kernel pathologizes 256x512x8" from "window artifact"
#   head60       the headline protocol run for the record
#   wsplit1/2    scripts/warm_split.py twice back-to-back: trace/lower vs
#                persistent-cache deserialize vs first dispatch on the 1M
#                user-grid signature (VERDICT r4 item 6's measured split)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5g_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5G $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5g"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    local t0=$SECONDS
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name ($((SECONDS - t0))s): $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?, $((SECONDS - t0))s): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run head_pf 2400 python bench.py --frames 24 --per-frame
run head_dp0_pf 2400 env PS_DEST_PALLAS=0 python bench.py --frames 24 --per-frame
run head60 2400 python bench.py --frames 60
run wsplit1 2400 python scripts/warm_split.py
run wsplit2 2400 python scripts/warm_split.py

note "queue r5g done"
