#!/usr/bin/env bash
# Round-4 follow-up chip queue (runs after chip_queue_r4.sh):
#   usershard   sharded 1x1-mesh program on the 1M user scene, chunked
#               (lane-chunk tombstone-pad skip engaged — VERDICT item 3's
#               "skip engages on the user scene" half of the A/B)
#   usershard1  same, forced --lane-chunks 1 (the unchunked control)
#   head2/head3 headline re-measures in this window (the 11:47 head read
#               867 steps/s vs r3's 960-1014 — distinguish a chip slow
#               phase from a regression; the dense kernel is untouched)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_b_summary.txt
: > "$SUMMARY"

note() { echo "[chipqB $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting follow-up queue"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run usershard  3600 python bench.py --user-scene --sharded --frames 60
run usershard1 3600 python bench.py --user-scene --sharded --frames 60 --lane-chunks 1
run head2      1800 python bench.py
run head3      1800 python bench.py

note "queue done"
