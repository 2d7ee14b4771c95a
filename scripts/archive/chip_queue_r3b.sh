#!/usr/bin/env bash
# Round-3b chip measurement queue — the persistent-ext / live-tile-compaction
# A/B (commit "Persistent pad-extended lane-chunk layout ..."). Run when the
# TPU tunnel is up; strictly sequential (single-tenant tunnel).
#
# Queue (priority order):
#   1. hw      — tests/test_tpu_hw.py incl. the NEW ext/compact Mosaic tests:
#                scalar-prefetch + repeated-index DMA skip + aliasing are
#                pipeline features only a real compile validates.
#   2. extA    — user-scene 1M, ext-io auto (persistent layout + compaction,
#                the new production default).
#   3. extB    — same window, --ext-io nocompact (persistent layout only).
#   4. extC    — same window, --ext-io off (classic per-step ext = the 83.7
#                steps/s r3-final configuration, as the control).
#   5. head    — headline bench (1M cap-8, lane_chunks=1): must be unchanged.
#   6. decomp  — scripts/userscene_decomp.py under the new default: the
#                vacuum-floor V1 number is the direct before/after.
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

run hw    2700 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
run extA  1800 python bench.py --user-scene
run extB  1800 python bench.py --user-scene --ext-io nocompact
run extC  1800 python bench.py --user-scene --ext-io off
run head   900 python bench.py
run decomp 1800 python scripts/userscene_decomp.py

note "queue done"
cat "$SUMMARY"
