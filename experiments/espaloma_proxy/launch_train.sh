#!/bin/bash
# Detached retry loop for the on-chip espaloma-proxy training run.
#
# The axon chip tunnel drops occasionally; failures show up either as a
# fast "Unable to initialize backend 'axon'" error or as an indefinite
# hang during connection. run.py train resumes from last.ckpt, so the
# loop retries until proxy_results.json appears. A staleness watchdog
# kills attempts that stop making progress (no writes to the train log,
# metrics.jsonl, or checkpoint meta for STALE_S seconds — normal quiet
# periods are remote compiles, which finish well under that).
cd /root/repo || exit 1
LOG=/root/repo/experiments/espaloma_proxy/train.log
RESULTS=/root/repo/experiments/espaloma_proxy/proxy_results.json
RUN_DIR=/root/repo/experiments/espaloma_proxy/runs/espaloma-proxy
STALE_S=1500

newest_mtime() {
  local newest=0 f m
  for f in "$LOG" "$RUN_DIR/metrics.jsonl" "$RUN_DIR/last.ckpt/meta.json"; do
    [ -e "$f" ] || continue
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  echo "$newest"
}

for attempt in $(seq 1 40); do
  echo "=== attempt $attempt start $(date) ===" >> "$LOG"
  timeout 14400 python experiments/espaloma_proxy/run.py train --epochs 150 >> "$LOG" 2>&1 &
  TPID=$!
  while kill -0 "$TPID" 2>/dev/null; do
    sleep 120
    now=$(date +%s)
    last=$(newest_mtime)
    if [ $((now - last)) -gt "$STALE_S" ]; then
      echo "=== watchdog: no progress for $((now - last))s, killing attempt $attempt $(date) ===" >> "$LOG"
      kill "$TPID" 2>/dev/null
      sleep 5
      kill -9 "$TPID" 2>/dev/null
      break
    fi
  done
  wait "$TPID"
  rc=$?
  if [ -f "$RESULTS" ]; then
    echo "=== complete rc=$rc $(date) ===" >> "$LOG"
    exit 0
  fi
  echo "=== attempt $attempt ended rc=$rc, retry in 180s $(date) ===" >> "$LOG"
  sleep 180
done
echo "=== giving up after 40 attempts $(date) ===" >> "$LOG"
exit 1
