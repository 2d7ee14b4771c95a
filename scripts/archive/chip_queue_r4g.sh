#!/usr/bin/env bash
# Round-4 queue G: refresh the large-N rows with the r4 kernels (lane-chunked
# move, strided halo build, prologue input fusion). The 4M/16M BASELINE rows
# are still r2-era; re-measure them so the scaling table cites current code.
#   n4m    4M bucket path (r2: ~180 steps/s)
#   n16m   16M bucket path, per-frame series (r2 steady state: 46 steps/s)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_g_summary.txt
: > "$SUMMARY"

note() { echo "[chipqG $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue G"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run n4m 2400 python bench.py --particles 4194304 --frames 24
run n16m 3600 python bench.py --particles 16000000 --frames 24 --per-frame

note "queue G done"
