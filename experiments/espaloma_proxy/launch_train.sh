#!/bin/bash
# Detached retry loop for the on-chip espaloma-proxy training run.
#
# Usage: launch_train.sh [EPOCHS] [TIME_LIMIT_H]
#   EPOCHS        absolute epoch target (default 500)
#   TIME_LIMIT_H  optional per-session wall-clock bound passed to run.py
#
# The axon chip tunnel drops occasionally; failures show up either as a
# fast "Unable to initialize backend 'axon'" error or as an indefinite
# hang during connection. run.py train resumes from last.ckpt, so the
# loop retries until proxy_results.json reports the target epoch (NOT mere
# existence — a result from an earlier shorter run is already committed).
# A staleness watchdog kills attempts that stop making progress (no writes
# to the train log, metrics.jsonl, or checkpoint meta for STALE_S seconds —
# normal quiet periods are remote compiles, which finish well under that).
cd /root/repo || exit 1
EPOCHS=${1:-500}
TIME_LIMIT=${2:-}
LOG=/root/repo/experiments/espaloma_proxy/train.log
RESULTS=/root/repo/experiments/espaloma_proxy/proxy_results.json
RUN_DIR=/root/repo/experiments/espaloma_proxy/runs/espaloma-proxy
STALE_S=1500

reached_target() {
  python - "$RESULTS" "$EPOCHS" <<'EOF'
import json, sys
try:
    s = json.load(open(sys.argv[1]))
except Exception:
    sys.exit(1)
ep = s.get('epoch')
sys.exit(0 if ep is not None and ep >= int(sys.argv[2]) else 1)
EOF
}

newest_mtime() {
  local newest=0 f m
  for f in "$LOG" "$RUN_DIR/metrics.jsonl" "$RUN_DIR/last.ckpt/meta.json"; do
    [ -e "$f" ] || continue
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  echo "$newest"
}

EXTRA=()
[ -n "$TIME_LIMIT" ] && EXTRA=(--time_limit "$TIME_LIMIT")

for attempt in $(seq 1 40); do
  echo "=== attempt $attempt start (target $EPOCHS ep) $(date) ===" >> "$LOG"
  timeout 21600 python experiments/espaloma_proxy/run.py train \
    --epochs "$EPOCHS" "${EXTRA[@]}" >> "$LOG" 2>&1 &
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
  if reached_target; then
    echo "=== complete rc=$rc $(date) ===" >> "$LOG"
    exit 0
  fi
  # a time-limited session that finalized below target also lands here:
  # resume immediately (the bound is per-session)
  echo "=== attempt $attempt ended rc=$rc, retry in 180s $(date) ===" >> "$LOG"
  sleep 180
done
echo "=== giving up after 40 attempts $(date) ===" >> "$LOG"
exit 1
