#!/usr/bin/env bash
# Round-5 queue D: validate + measure the "refs" sharded halo refresh form
# (in-kernel halo-column splice, no per-step HBM rewrite) and collect two
# more config-5 windows on the two-stage ship pipeline.
#   hw_refs     sharded hardware-numerics tests with PS_SHARD_REFRESH=refs
#               (Mosaic-compiles the splice kernel on the real chip)
#   shard_refs  sharded 1M user scene, refs form
#   shard_sel2  same window, select form (control)
#   user_ctl2   unsharded control, same window (shard-overhead denominator)
#   cfg5_a/b    config-5 windows 3 and 4 (target: >=0.85 engine fps)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5d_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5D $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5d"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

# full hw-numerics suite under the refs form + the Pallas dest pass (both
# new kernels Mosaic-compile and bit-match the CPU reference on real hw)
run hw_refs 3600 env PS_SHARD_REFRESH=refs PS_TPU_TEST_PLATFORM=axon,cpu \
    python -m pytest tests/test_tpu_hw.py -q
note "hw_refs tail: $(tail -2 /tmp/chipq_hw_refs.log | tr '\n' ' | ')"
run shard_refs 3600 env PS_SHARD_REFRESH=refs python bench.py --user-scene --sharded --frames 60
run shard_sel2 3600 python bench.py --user-scene --sharded --frames 60
run user_ctl2 3600 python bench.py --user-scene --frames 60
run user_dp0 3600 env PS_DEST_PALLAS=0 python bench.py --user-scene --frames 60
run mdec_dp 2400 python scripts/move_decomp.py --lane-chunks 8
run n16m2 2400 python bench.py --particles 16000000 --frames 24 --per-frame
run cfg5_a 2400 python scripts/interactive_1m_chip.py
note "cfg5_a first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5_a.log | head -1)"
run cfg5_b 2400 python scripts/interactive_1m_chip.py
note "cfg5_b first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5_b.log | head -1)"

note "queue r5d done"
