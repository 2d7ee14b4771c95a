#!/usr/bin/env bash
# Round-4 queue E: measure the position-only per-step halo traffic change
# (commit "Sharded step: position-only per-step halo traffic") on hardware.
#   velhalo_new  bench.py --user-scene --sharded --frames 60 at HEAD
#                (queue D measured the 5-field refresh at 76.54 steps/s)
#   velhalo_old  same command from a worktree at the parent commit —
#                same-window control (chip slow phases make cross-window
#                comparisons unreliable)
#   hlo          scripts/hlo_probe.py — big copy/DUS census of the compiled
#                sharded user-grid program (cache-warm after velhalo_new)
#   head5        bench.py — single-chip headline control for the window
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_e_summary.txt
: > "$SUMMARY"

note() { echo "[chipqE $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue E"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run velhalo_new 3600 python bench.py --user-scene --sharded --frames 60

# same-window control at the parent commit (worktree; compile cache in
# ~/.cache is shared, and queue D already compiled the old program)
OLD=$(git rev-parse HEAD~1)
git worktree add -f /tmp/wt_velhalo "$OLD" >/dev/null 2>&1 || true
if [ -d /tmp/wt_velhalo ]; then
    note "control worktree at $OLD"
    (cd /tmp/wt_velhalo && run velhalo_old 3600 python bench.py --user-scene --sharded --frames 60)
    git worktree remove --force /tmp/wt_velhalo >/dev/null 2>&1 || true
else
    note "FAIL velhalo_old: could not create worktree"
fi

run hlo   3600 python scripts/hlo_probe.py
# hardware numerics incl. test_sharded_frame_compiled_on_hardware — the
# on-chip bit-identity guard for the position-only halo refresh
run hw    3600 env PS_TPU_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_hw.py -q
run head5 1800 python bench.py

note "queue E done"
