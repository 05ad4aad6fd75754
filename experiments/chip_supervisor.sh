#!/bin/bash
# Long-horizon chip supervisor (round 3 tunnel outage).
#
# Takes over AFTER the original retry chains (launch_train.sh,
# /tmp/chain_after_proxy.sh, /tmp/chain2_lc.sh) have exited, and keeps
# retrying the on-chip stages until each artifact exists:
#   1. espaloma-proxy training  -> experiments/espaloma_proxy/proxy_results.json
#   2. grappa-1.2.1 rehearsal   -> rehearsal_results.json with epochs_run >= 1
#   3. bench.py                 -> /tmp/bench_r3_postproxy.log JSON line
#   4. learning-curve sweep     -> experiments/lc/lc_results.json (5 factors)
# Each stage is idempotent (training resumes from last.ckpt; run_lc caches
# per-factor results). A staleness watchdog kills attempts whose progress
# files stop changing (PJRT-init hangs); plain UNAVAILABLE errors fail fast.
#
# Start detached:  setsid nohup experiments/chip_supervisor.sh \
#                    [wait_pid ...] >/dev/null 2>&1 &
cd /root/repo || exit 1
LOG=/tmp/supervisor.log
PROXY=experiments/espaloma_proxy/proxy_results.json
REH=experiments/train-grappa-1.2.1/rehearsal_results.json
LCJ=experiments/lc/lc_results.json
BENCH_LOG=/tmp/bench_r3_postproxy.log
STALE_S=2400

log() { echo "sup: $* $(date -u)" >> "$LOG"; }

newest_mtime() {  # newest mtime over file args (globs expanded by caller)
  local newest=0 f m
  for f in "$@"; do
    [ -e "$f" ] || continue
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  echo "$newest"
}

# run_watched <hard_timeout_s> <stage_log> <watch_glob_string> cmd...
# Staleness counts from the LATER of stage start and the newest watched
# mtime — otherwise a fresh attempt inherits the previous attempt's old
# mtimes and gets killed while still compiling (happened 2026-08-18).
run_watched() {
  local hard=$1 slog=$2 watch=$3; shift 3
  local start
  start=$(date +%s)
  timeout "$hard" "$@" >> "$slog" 2>&1 &
  local pid=$!
  while kill -0 "$pid" 2>/dev/null; do
    sleep 120
    local now last
    now=$(date +%s)
    # shellcheck disable=SC2086
    last=$(newest_mtime $slog $watch)
    [ "$start" -gt "$last" ] && last=$start
    if [ $((now - last)) -gt "$STALE_S" ]; then
      log "watchdog: stale $((now - last))s, killing ($*)"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"
  return $?
}

# ---- wait for the original chains (PIDs passed as args) to exit ----------
for pid in "$@"; do
  while kill -0 "$pid" 2>/dev/null; do sleep 300; done
done
log "original chains exited; supervising"

reh_done() {
  python - <<'EOF'
import json, pathlib, sys
p = pathlib.Path('experiments/train-grappa-1.2.1/rehearsal_results.json')
try:
    sys.exit(0 if json.loads(p.read_text()).get('epochs_run', 0) >= 1 else 1)
except Exception:
    sys.exit(1)
EOF
}

lc_done() {
  python - <<'EOF'
import json, pathlib, sys
p = pathlib.Path('experiments/lc/lc_results.json')
try:
    sys.exit(0 if len(json.loads(p.read_text())) >= 5 else 1)
except Exception:
    sys.exit(1)
EOF
}

# proxy gate: first pass trains to 150 epochs; once results exist the
# extension stage (after rehearsal+bench) continues the SAME run to the
# absolute 500-epoch target of the published recipes (run.py resumes from
# last.ckpt idempotently).
proxy_epochs() {
  python - <<'EOF'
import json, pathlib
p = pathlib.Path('experiments/espaloma_proxy/proxy_results.json')
try:
    print(json.loads(p.read_text()).get('epochs_run', 0))
except Exception:
    print(0)
EOF
}

for attempt in $(seq 1 200); do
  if [ ! -f "$PROXY" ]; then
    log "attempt $attempt: proxy train"
    run_watched 14400 experiments/espaloma_proxy/train.log \
      "experiments/espaloma_proxy/runs/espaloma-proxy/metrics.jsonl experiments/espaloma_proxy/runs/espaloma-proxy/last.ckpt/meta.json" \
      python -u experiments/espaloma_proxy/run.py train --epochs 150
  elif ! reh_done; then
    log "attempt $attempt: 1.2.1 rehearsal"
    run_watched 7200 /tmp/rehearsal121_chip.log \
      "runs/grappa-1.2.1-rehearsal/metrics.jsonl runs/grappa-1.2.1-rehearsal/last.ckpt/meta.json" \
      python -u experiments/train-grappa-1.2.1/rehearsal.py --epochs 5
  elif ! grep -q '"metric"' "$BENCH_LOG" 2>/dev/null; then
    log "attempt $attempt: bench"
    timeout 3600 python -u bench.py >> "$BENCH_LOG" 2>&1
  elif [ "$(proxy_epochs)" -lt 500 ]; then
    log "attempt $attempt: proxy extension to 500 epochs (at $(proxy_epochs))"
    run_watched 14400 experiments/espaloma_proxy/train.log \
      "experiments/espaloma_proxy/runs/espaloma-proxy/metrics.jsonl experiments/espaloma_proxy/runs/espaloma-proxy/last.ckpt/meta.json" \
      python -u experiments/espaloma_proxy/run.py train --epochs 500
  elif ! lc_done; then
    log "attempt $attempt: learning-curve sweep"
    run_watched 14400 /tmp/lc_chip.log \
      "experiments/lc/lc_results.json experiments/lc/runs/*/metrics.jsonl" \
      python -u experiments/lc/run_lc.py --factors 1.0 0.5 0.25 0.1 0.05 --epochs 50
  else
    python -u experiments/lc/plot.py >> /tmp/lc_chip.log 2>&1
    log "ALL STAGES DONE"
    exit 0
  fi
  sleep 120
done
log "giving up after 200 attempts"
exit 1
