#!/usr/bin/env bash
# Round-5 queue F: re-run the measurement legs lost to the host restart
# (the /tmp logs and the persistent compile cache were wiped), in priority
# order. Cold cache: the first user-grid leg pays the ~10 min Mosaic
# compile; everything after rides the refreshed cache.
#   user_ctl    unsharded 1M user scene at HEAD (control + cache warm)
#   shard_refs  sharded 1M user scene (refs halo form is now the default)
#               - second window for the r5d 100.4 steps/s result
#   cfg5_a/b/c  three config-5 windows (target: >=0.85 engine fps in all
#               three); a has PS_SHIP_TRACE=1 for the stage decomposition
#   head60      dense 1M headline with the Pallas dest pass
#   udec        user-scene step-cost decomposition at HEAD (V0/V1/V2)
#   mdec_dp     move decomposition with the Pallas dest pass
#   user_dp0    unsharded user scene with PS_DEST_PALLAS=0 (dest A/B)
#   n16m        16M refresh on HEAD kernels
#   hlo_refs    HLO copy census of the refs-form sharded program
#   hw          full hardware-numerics suite at HEAD
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5f_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5F $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5f (cold cache expected)"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    local t0=$SECONDS
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name (${t0}s+$((SECONDS - t0))s): $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?, $((SECONDS - t0))s): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run user_ctl 3600 python bench.py --user-scene --frames 60
run shard_refs 3600 python bench.py --user-scene --sharded --frames 60
run cfg5_a 2700 env PS_SHIP_TRACE=1 python scripts/interactive_1m_chip.py
note "cfg5_a first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5_a.log | head -1)"
note "cfg5_a ship trace: $(grep -m3 -i 'ship' /tmp/i1m_daemon.log 2>/dev/null | tr '\n' ' | ')"
run cfg5_b 2700 python scripts/interactive_1m_chip.py
note "cfg5_b first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5_b.log | head -1)"
run cfg5_c 2700 python scripts/interactive_1m_chip.py
note "cfg5_c first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5_c.log | head -1)"
run head60 2400 python bench.py --frames 60
run udec 2400 python scripts/userscene_decomp.py
run mdec_dp 2400 python scripts/move_decomp.py --lane-chunks 8
run user_dp0 3600 env PS_DEST_PALLAS=0 python bench.py --user-scene --frames 60
run n16m 2400 python bench.py --particles 16000000 --frames 24 --per-frame
run hlo_refs 2400 python scripts/hlo_probe.py
note "hlo_refs tail: $(tail -4 /tmp/chipq_hlo_refs.log | tr '\n' ' | ')"
run hw 5400 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
note "hw tail: $(tail -2 /tmp/chipq_hw.log | tr '\n' ' | ')"

note "queue r5f done"
