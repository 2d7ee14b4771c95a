#!/usr/bin/env bash
# Round-4 queue F: measure the LANE-CHUNKED REBUCKET PASS (commit
# "Lane-chunked rebucket pass: column skip for sparse scenes") on hardware.
#   hw_move    the two move bit-identity tests compiled on the chip
#              (incl. the new chunked variant)
#   user_new   bench.py --user-scene --frames 60 at HEAD — the 1M editor
#              lattice (lane_chunks 8) now runs the chunked move too
#   user_old   same command from a worktree at the pre-chunked-move commit —
#              same-window control (chip slow phases make cross-window
#              comparisons unreliable)
#   mdec_c8 /  move_decomp.py at the 1M user grid, chunked vs unchunked —
#   mdec_c1    isolates the move-pass gain from the frame-level A/B
#   head       plain headline bench — C=1 control; also proves the dense
#              grid's compile-cache entry survived (the C=1 trace is
#              byte-identical by construction)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_f_summary.txt
: > "$SUMMARY"

note() { echo "[chipqF $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue F"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

# FULL hw suite (queue E's run caught the working tree mid-edit and is
# void): numerics guards for both chunked moves + the sharded program
run hw 3600 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
run user_new 3600 python bench.py --user-scene --frames 60
run shard_new 3600 python bench.py --user-scene --sharded --frames 60

OLD=$(git rev-parse dc06501^ 2>/dev/null || git rev-parse HEAD~1)
git worktree add -f /tmp/wt_movechunk "$OLD" >/dev/null 2>&1 || true
if [ -d /tmp/wt_movechunk ]; then
    note "control worktree at $OLD"
    (cd /tmp/wt_movechunk && run user_old 3600 python bench.py --user-scene --frames 60)
    (cd /tmp/wt_movechunk && run shard_old 3600 python bench.py --user-scene --sharded --frames 60)
    git worktree remove --force /tmp/wt_movechunk >/dev/null 2>&1 || true
else
    note "FAIL user_old: could not create worktree"
fi

run mdec_c8 3600 python scripts/move_decomp.py --lane-chunks 8
run head 1800 python bench.py

note "queue F done"
