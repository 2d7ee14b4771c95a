#!/usr/bin/env bash
# Round-5 queue A: harvest the r4 measurement backlog (VERDICT r4 item 2).
# Queue F died after its user_new leg (99.18 steps/s logged); queue G never
# ran. Remaining legs, most valuable first:
#   shard_new   sharded 1M user scene at HEAD (chunked move + all r4 fixes)
#   user_old /  pre-chunked-move controls from a worktree at dc06501^ —
#   shard_old   same-window A/B for the lane-chunked MOVE pass
#   mdec_c8 /   move_decomp.py at the 1M user grid, chunked vs unchunked —
#   mdec_c1     isolates the move-pass gain
#   head        plain headline bench (dense-grid control, C=1)
#   n4m, n16m   queue G's large-N refresh (4M; 16M per-frame series)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5a_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5A $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5a"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

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
run mdec_c1 3600 python scripts/move_decomp.py --lane-chunks 1
run head 1800 python bench.py
run n4m 2400 python bench.py --particles 4194304 --frames 24
run n16m 3600 python bench.py --particles 16000000 --frames 24 --per-frame

note "queue r5a done"
