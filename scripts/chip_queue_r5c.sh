#!/usr/bin/env bash
# Round-5 queue C: isolate the sharded halo-refresh cost + refresh large-N
# rows on the pass-skip kernels + config-5 window 2.
#   shard_dus   sharded 1M user scene with the DUS refresh form
#   shard_sel   same with the select form (r5b's 83.91 leg re-run = same-window
#               control; the r5b window read 2x-slow readbacks)
#   user_ctl    unsharded control, same window (shard-overhead denominator)
#   hlo         copy census of the compiled sharded program at HEAD
#   n4m, n16m   large-N rows on the move-pass-skip kernels (VERDICT item 7)
#   cfg5        config-5 window 2 (two-stage ship pipeline + warm_last_scene)
set -u
cd "$(dirname "$0")/.."
SUMMARY=/tmp/chipq_r5c_summary.txt
: > "$SUMMARY"

note() { echo "[chipq5C $(date +%H:%M:%S)] $*" | tee -a "$SUMMARY"; }

code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
if [ "$code" = "000" ]; then
    note "ABORT: tunnel down (curl 8093 -> 000)"
    exit 1
fi
note "tunnel up (code=$code); starting queue r5c"

run() {  # run <name> <timeout_s> <cmd...>
    local name=$1 tmo=$2; shift 2
    note "START $name: $*"
    if timeout "$tmo" "$@" > "/tmp/chipq_$name.log" 2>&1; then
        note "OK    $name: $(grep -m1 '"metric"' "/tmp/chipq_$name.log" || tail -1 "/tmp/chipq_$name.log")"
    else
        note "FAIL  $name (exit $?): $(tail -1 "/tmp/chipq_$name.log")"
    fi
}

run shard_dus 3600 env PS_SHARD_REFRESH=dus python bench.py --user-scene --sharded --frames 60
run shard_sel 3600 python bench.py --user-scene --sharded --frames 60
run user_ctl 3600 python bench.py --user-scene --frames 60
run hlo 2400 python scripts/hlo_probe.py
note "hlo tail: $(tail -4 /tmp/chipq_hlo.log | tr '\n' ' | ')"
run n4m 2400 python bench.py --particles 4194304 --frames 24
run n16m 3600 python bench.py --particles 16000000 --frames 24 --per-frame
run cfg5 2400 python scripts/interactive_1m_chip.py
note "cfg5 first_frames: $(grep -o '"first_frames_wait_s"[^,]*' /tmp/chipq_cfg5.log | head -1)"

note "queue r5c done"
