#!/usr/bin/env bash
# Poll the TPU tunnel (single-tenant, can be down for hours — verify skill);
# when it answers, run scripts/chip_queue_r3b.sh (the persistent-ext A/B
# queue) once. Re-arm (up to 3 attempts total) if the queue had failures.
# Run detached:  bash scripts/tunnel_watch_r3b.sh &  (logs: /tmp/tunnel_watch.log)
attempt=0
while [ "$attempt" -lt 3 ]; do
  code=$(curl -s -o /dev/null -w "%{http_code}" --max-time 5 http://127.0.0.1:8093/ || true)
  if [ "$code" = "000" ]; then
    echo "[watch $(date +%H:%M:%S)] tunnel down" >> /tmp/tunnel_watch.log
    sleep 60
    continue
  fi
  attempt=$((attempt + 1))
  echo "[watch $(date +%H:%M:%S)] tunnel up (code=$code), r3b queue attempt $attempt" >> /tmp/tunnel_watch.log
  bash /root/repo/scripts/chip_queue_r3b.sh >> /tmp/tunnel_watch.log 2>&1
  cp /tmp/chipq_summary.txt "/tmp/chipq_summary_r3b_a$attempt.txt" 2>/dev/null
  if ! grep -qE "FAIL|ABORT" /tmp/chipq_summary.txt 2>/dev/null; then
    echo "[watch $(date +%H:%M:%S)] r3b queue clean after attempt $attempt" >> /tmp/tunnel_watch.log
    exit 0
  fi
  echo "[watch $(date +%H:%M:%S)] r3b queue had failures; will re-arm" >> /tmp/tunnel_watch.log
  sleep 120
done
echo "[watch $(date +%H:%M:%S)] attempts exhausted" >> /tmp/tunnel_watch.log
