#!/usr/bin/env bash
# Round-3c chip measurement queue — strided-halo + input-fusion A/B on the
# user scene (after r3b falsified the ext/compaction traffic model).
#
#   f1  classic path + strided halo (the new construction, default off-mode)
#   f2  f1 + PS_STEP_INPUT_FUSION=1 (XLA fuses ext/halo producers into the
#       pallas call — experimental; a compile failure here is informative)
#   f3  persistent-ext nocompact + strided halo
#   f4  persistent-ext compact + strided halo (current auto default)
#   head headline guard (dense cap-8, untouched path)
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

run f1   1800 python bench.py --user-scene --ext-io off
run f2   1800 env PS_STEP_INPUT_FUSION=1 python bench.py --user-scene --ext-io off
run f3   1800 python bench.py --user-scene --ext-io nocompact
run f4   1800 python bench.py --user-scene
run head  900 python bench.py

note "queue done"
cat "$SUMMARY"
