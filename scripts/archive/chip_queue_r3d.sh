#!/usr/bin/env bash
# Round-3d chip queue — confirm the new defaults (strided halo + input
# fusion, classic layout) across every surface:
#   hw     full hardware numerics suite (fusion is now default, so this
#          validates the fused programs incl. the sharded edge-rows call)
#   user   final user-scene number under pure defaults (expect ~96 steps/s)
#   shard  sharded 1x1-mesh guard (its step call now fuses too)
#   decomp frame-cost decomposition under the new defaults (new V1 floor)
#   i1m    assembled 1M interactive editor re-measure (engine-limited at
#          0.65 fps pre-fix; the BASELINE config-5 row)
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
run user   1800 python bench.py --user-scene
run shard  1800 python bench.py --sharded
run decomp 1800 python scripts/userscene_decomp.py
run i1m    3600 python scripts/interactive_1m_chip.py

note "queue done"
cat "$SUMMARY"
