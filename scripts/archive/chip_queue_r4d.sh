#!/usr/bin/env bash
# Round-4 queue D: measure the sharded-path r4 fixes on hardware.
#   usershard2  bench.py --user-scene --sharded --frames 60 — strided
#               edge-row prologue (was 72.42 steps/s) + dense-pack readback
#               on the mesh state (readback_ms was 25240; expect ~2200)
#   shard2      bench.py --sharded — headline sharded program with the
#               strided edge-row build (was 844.9 steps/s / 2.6% overhead)
#   head4       bench.py — same-window single-chip control
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_d_summary.txt
: > "$SUMMARY"

note() { echo "[chipqD $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue D"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run usershard2 3600 python bench.py --user-scene --sharded --frames 60
run shard2     3600 python bench.py --sharded
run head4      1800 python bench.py
# third engine-fps sample for the config-5 >=0.85 target (runs straddle it:
# 0.88 pre-cache-fix, 0.82 post); cache is warm from today's queues
run i1m3       3600 python scripts/interactive_1m_chip.py

note "queue done"
