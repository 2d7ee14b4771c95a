#!/usr/bin/env bash
# Round-5 queue E: refresh the user-scene step-cost decomposition at HEAD
# (the section-8 table still cites the 2026-08-18 probe), census the refs
# sharded program, re-measure the dense headline with the Pallas dest pass,
# and collect a config-5 window with the ship-trace decomposition on.
#   udec      userscene_decomp at HEAD (V0/V1/V2 floor split)
#   hlo_refs  HLO copy census of the refs-form sharded program
#   head60    dense 1M headline with the Pallas dest pass
#   cfg5_c    config-5 window with PS_SHIP_TRACE=1 (stage decomposition)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5e_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5E $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5e"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

# hw numerics incl. the sharded halo dest kernel (committed after queue
# r5d's hw leg started; compile cache is warm, so this is the cheap pass)
run hw2 3600 env PS_SHARD_REFRESH=refs PS_TPU_TEST_PLATFORM=axon,cpu \
    python -m pytest tests/test_tpu_hw.py -q
run udec 2400 python scripts/userscene_decomp.py
run hlo_refs 2400 env PS_SHARD_REFRESH=refs python scripts/hlo_probe.py
note "hlo_refs tail: $(tail -4 /tmp/chipq_hlo_refs.log | tr '\n' ' | ')"
run head60 2400 python bench.py --frames 60
run cfg5_c 2400 env PS_SHIP_TRACE=1 python scripts/interactive_1m_chip.py
note "cfg5_c first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5_c.log | head -1)"
note "ship trace: $(grep -m3 -i 'ship' /tmp/i1m_daemon.log 2>/dev/null | tr '\n' ' | ')"

note "queue r5e done"
