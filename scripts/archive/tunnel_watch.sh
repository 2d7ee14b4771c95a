#!/usr/bin/env bash
# Generic tunnel watcher: poll the TPU tunnel; when it answers, run the given
# chip queue script once; re-arm (3 attempts) on failures.
#   bash scripts/tunnel_watch.sh scripts/chip_queue_r3c.sh &
queue=${1:?usage: tunnel_watch.sh <queue-script>}
attempt=0
while [ "$attempt" -lt 3 ]; do
  code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
  if [ "$code" = "000" ]; then
    echo "[watch $(date +%H:%M:%S)] tunnel down" >> /tmp/tunnel_watch.log
    sleep 60
    continue
  fi
  attempt=$((attempt + 1))
  echo "[watch $(date +%H:%M:%S)] tunnel up (code=$code), $queue attempt $attempt" >> /tmp/tunnel_watch.log
  bash "/root/repo/$queue" >> /tmp/tunnel_watch.log 2>&1
  cp /tmp/chipq_summary.txt "/tmp/chipq_summary_$(basename "$queue" .sh)_a$attempt.txt" 2>/dev/null
  if ! grep -qE "FAIL|ABORT" /tmp/chipq_summary.txt 2>/dev/null; then
    echo "[watch $(date +%H:%M:%S)] queue clean after attempt $attempt" >> /tmp/tunnel_watch.log
    exit 0
  fi
  echo "[watch $(date +%H:%M:%S)] queue had failures; will re-arm" >> /tmp/tunnel_watch.log
  sleep 120
done
echo "[watch $(date +%H:%M:%S)] attempts exhausted" >> /tmp/tunnel_watch.log
