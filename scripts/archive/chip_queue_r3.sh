#!/usr/bin/env bash
# Round-3 chip measurement queue — run when the TPU tunnel is up.
#
# The tunnel is SINGLE-TENANT (verify skill), so everything here is strictly
# sequential. Each step logs to /tmp/chipq_<step>.log and appends one status
# line to /tmp/chipq_summary.txt; a step failing does not stop the queue
# (later numbers are still worth having), but its FAIL line is recorded.
#
# Queue (priority order, ~45-75 min warm / longer cold):
#   1. hw      — tests/test_tpu_hw.py: compiled-Mosaic numerics vs the CPU
#                reference path. MUST re-run: the kernels changed since the
#                last chip validation (lane chunking, dead-neighborhood skip,
#                progressive-compile gate).
#   2. head    — headline bench (1M, cap-8 grid): regression check vs the
#                ~870-920 steps/s BASELINE row.
#   3. abA/abB — user-scene lane-chunk A/B in the SAME window (auto-chosen
#                chunking vs --lane-chunks 1 = unchunked kernel).
#   4. shard   — sharded program on the 1x1 mesh: overhead vs single-chip.
#   5. m16     — 16M steady-state with --per-frame distribution (VERDICT
#                item 8: characterize the 50% run-to-run variance).
#   6. i1m     — assembled 1M interactive editor (daemon+webview), the
#                config-5 re-measure with the dense-pack readback.
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

run hw    1800 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
run head   900 python bench.py
run abA   1200 python bench.py --user-scene
run abB   1200 python bench.py --user-scene --lane-chunks 1
run shard 1200 python bench.py --sharded
run m16   1800 python bench.py --particles 16000000 --frames 24 --per-frame
run i1m   3600 python scripts/interactive_1m_chip.py

note "queue done"
cat "$SUMMARY"
