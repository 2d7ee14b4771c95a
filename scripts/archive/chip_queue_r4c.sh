#!/usr/bin/env bash
# Round-4 queue C: prove the cache-key fix (d4a7a19) on hardware.
#   warmuser  bench.py --user-scene --frames 10 — compiles the 1024x1024x16
#             frame program (+ sibling lane-chunk signature) under the NEW
#             caller-stack-stable cache key
#   i1m2      interactive_1m_chip.py — a separate process/entry point; with
#             the fix its daemon must HIT those entries: first_frames_wait_s
#             drops from 282 s (r4 pre-fix) to executable-deserialize time
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_c_summary.txt
: > "$SUMMARY"

note() { echo "[chipqC $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue C"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run warmuser 3600 python bench.py --user-scene --frames 10
run i1m2     3600 python scripts/interactive_1m_chip.py

note "queue done"
