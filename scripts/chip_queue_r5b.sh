#!/usr/bin/env bash
# Round-5 queue B: validate + measure the per-tile move-pass bounds
# (_move_pass_aux, f56f1f7) and the warm-ahead compile on the real chip.
#   hw          full hardware-numerics suite (bit-identity of the gated
#               place kernels vs the CPU reference path) — correctness gate
#   mdec_skip / move_decomp.py at the 1M user grid with the pass skip on
#   mdec_noskip vs PS_MOVE_PASS_SKIP=0 (same kernel, every group runs) —
#               isolates the place-pass win (r5a: 37.7 ms live place)
#   user_skip   1M user scene at HEAD (VERDICT item 3 target: >=110 steps/s)
#   shard_skip  sharded 1M user scene at HEAD (VERDICT item 1: <=10% overhead)
#   head60      dense headline control, 60 frames (r5a's 10-frame leg was
#               RTT-bound in a slow window)
#   cfg5        assembled interactive editor @1M (config 5 window + the
#               warm-ahead first_frames_wait_s measurement; the user_skip
#               leg a few minutes earlier plays the warm pass)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5b_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5B $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5b"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run hw 3600 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
note "hw tail: $(tail -2 /tmp/chipq_hw.log | head -1)"
run mdec_skip 3600 python scripts/move_decomp.py --lane-chunks 8
run mdec_noskip 3600 env PS_MOVE_PASS_SKIP=0 python scripts/move_decomp.py --lane-chunks 8
run user_skip 3600 python bench.py --user-scene --frames 60
run shard_skip 3600 python bench.py --user-scene --sharded --frames 60
run head60 2400 python bench.py --frames 60
run cfg5 2400 python scripts/interactive_1m_chip.py
note "cfg5 first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5.log | head -1)"

note "queue r5b done"
