#!/usr/bin/env bash
# Round-4 chip queue — the r4 measurement agenda:
#   hw       hardware numerics suite (validates the refactored sharded pad
#            helpers + everything else compiled on the real chip)
#   head     headline 1M bench (regression guard; expect ~1000 steps/s)
#   user     user-scene re-measure + post-measure sibling-signature warm
#            (bench.py --warm-siblings default ON — feeds the cache the
#            OTHER lane-chunk variant of the user grid)
#   shard    sharded 1x1-mesh guard (pad_x_state/refresh_x_cols refactor)
#   cfg123   BASELINE configs 1-3 as named scenes (VERDICT item 5)
#   c64k     64k row re-measured with 60 frames (dispatch-latency guard)
#   i1m      assembled 1M interactive editor (config 5): ship-worker A/B —
#            r3 measured 65 steps/s end-to-end vs 99.7 compute; target >= 85
#            (PS_SHIP_TRACE attributes readback vs send in the daemon log)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_summary.txt
: > "$SUMMARY"

note() { echo "[chipq $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run hw     2700 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
run head   1800 python bench.py
run user   2400 python bench.py --user-scene --frames 60
run shard  1800 python bench.py --sharded
run cfg123 2400 python scripts/bench_configs.py
run c64k   1200 python bench.py --particles 65536 --frames 60
run i1m    3600 env PS_SHIP_TRACE=1 python scripts/interactive_1m_chip.py

note "queue done"
