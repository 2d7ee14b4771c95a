#!/usr/bin/env bash
# Round-5 queue H: final freshness pass — re-measure the remaining table
# rows at HEAD so every BASELINE number cites the shipped r5 kernels.
#   cfgs   configs 1-3 (allpairs 2k/16k + bucket 64k user grid)
#   n4m    4M headline row (r5c: 290.68 with move bounds, pre-Pallas-dest)
#   n64k   64k headline row (r4: 14,334)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5h_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5H $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5h"

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

run cfgs 3600 python scripts/bench_configs.py
note "cfgs detail: $(grep -o '"config[^}]*}' /tmp/chipq_cfgs.log | tr '\n' ' | ' | head -c 600)"
run n4m 2400 python bench.py --particles 4194304 --frames 24
run n64k 1200 python bench.py --particles 65536 --frames 60

note "queue r5h done"
