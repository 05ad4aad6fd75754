#!/bin/bash
# Round-5 chip queue, revision b. Differences vs chip_supervisor_r5.sh:
#   * stage order is ablation -> ONE bounded XL session -> LC -> XL top-up
#     -> HPO. The XL run (VERDICT #2) gets a clean 1.5 h session whose
#     time_limit finalizes WITH a bootstrap test eval, instead of being
#     the last stage that the deadline kills mid-epoch with no eval.
#   * on startup, waits for any still-running campaign process from a
#     previous supervisor to exit (so a handover never double-books the
#     single chip).
# Start detached:  setsid nohup experiments/chip_supervisor_r5b.sh \
#                    [deadline_epoch_s] >/dev/null 2>&1 &
cd /root/repo || exit 1
LOG=/tmp/supervisor_r5.log
DEADLINE=${1:-$(date -d '2026-08-21 07:20 UTC' +%s)}
STALE_S=2400
ABL=experiments/ablation/ablation_results.json
LC5=experiments/lc/lc_results_500ep.json
HPO=experiments/hpo/sweep/trials.jsonl
XL_S1=/tmp/xl_session1.done

log() { echo "sup5b: $* $(date -u)" >> "$LOG"; }

newest_mtime() {
  local newest=0 f m
  for f in "$@"; do
    [ -e "$f" ] || continue
    m=$(stat -c %Y "$f")
    [ "$m" -gt "$newest" ] && newest=$m
  done
  echo "$newest"
}

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
    if [ "$now" -gt $((DEADLINE + 300)) ]; then
      log "deadline passed mid-stage, killing ($*)"
      kill "$pid" 2>/dev/null; sleep 5; kill -9 "$pid" 2>/dev/null
      break
    fi
  done
  wait "$pid"
  return $?
}

abl_done() {
  python - <<'EOF'
import json, pathlib, sys
p = pathlib.Path('experiments/ablation/ablation_results.json')
try:
    r = json.loads(p.read_text())
    need = ('baseline', 'wrong_symmetry', 'no_gnn_attention')
    sys.exit(0 if all(r.get(a, {}).get('test') for a in need) else 1)
except Exception:
    sys.exit(1)
EOF
}

lc500_done() {
  python - <<'EOF'
import json, pathlib, sys
p = pathlib.Path('experiments/lc/lc_results_500ep.json')
try:
    sys.exit(0 if len(json.loads(p.read_text())) >= 5 else 1)
except Exception:
    sys.exit(1)
EOF
}

xl_epoch() {
  python - <<'EOF'
import json, pathlib
p = pathlib.Path('experiments/espaloma_proxy_xl/proxy_results.json')
try:
    print(json.loads(p.read_text()).get('epoch', 0) or 0)
except Exception:
    print(0)
EOF
}

xl_data_ready() {
  python - <<'EOF'
import pathlib, sys
base = pathlib.Path('experiments/espaloma_proxy_xl/cache/datasets')
tags = ['proxy-xl-spice-monomers', 'proxy-xl-spice-pubchem',
        'proxy-xl-peptide', 'proxy-xl-rna-like']
sys.exit(0 if all((base / t).exists() for t in tags) else 1)
EOF
}

hpo_trials() {
  [ -f "$HPO" ] && wc -l < "$HPO" || echo 0
}

run_xl_stage() {
  local tl=$1
  run_watched 9000 experiments/espaloma_proxy_xl/train.log \
    "experiments/espaloma_proxy_xl/runs/espaloma-proxy/metrics.jsonl experiments/espaloma_proxy_xl/runs/espaloma-proxy/last.ckpt/meta.json experiments/espaloma_proxy_xl/proxy_results.json" \
    python -u experiments/espaloma_proxy_xl/run_xl.py train --epochs 500 \
      --time_limit "$tl"
}

# Handover: never double-book the chip with a campaign process started by
# a previous supervisor (this loop only waits; it never kills by pattern).
for i in $(seq 1 120); do
  if ps aux | grep -E "run_ablation\.py|run_xl\.py train|run_lc\.py|run_hpo\.py" \
      | grep -v grep | grep -v "supervisor" > /dev/null; then
    sleep 60
  else
    break
  fi
done
log "handover clear, starting queue"

for attempt in $(seq 1 200); do
  now=$(date +%s)
  if [ "$now" -gt "$DEADLINE" ]; then
    log "deadline reached; stopping (ablation=$(abl_done && echo ok || echo no) lc=$(lc500_done && echo ok || echo no) xl_epoch=$(xl_epoch) hpo=$(hpo_trials))"
    exit 0
  fi
  if ! abl_done; then
    log "attempt $attempt: ablation arms"
    run_watched 14400 /tmp/ablation_r5.log \
      "experiments/ablation/runs/*/metrics.jsonl experiments/ablation/ablation_results.json" \
      python -u experiments/ablation/run_ablation.py --epochs 500 --time_limit 1.0
  elif xl_data_ready && [ "$(xl_epoch)" -lt 450 ] && [ ! -f "$XL_S1" ]; then
    log "attempt $attempt: espaloma-proxy XL session 1 (at epoch $(xl_epoch))"
    if run_xl_stage 1.5; then
      touch "$XL_S1"   # clean finalize (incl. time-limit exits) -> move on
    else
      log "xl session 1 exited nonzero; will retry"
    fi
  elif ! lc500_done; then
    log "attempt $attempt: LC convergence sweep"
    run_watched 14400 /tmp/lc500_r5.log \
      "experiments/lc/lc_results_500ep.json experiments/lc/runs500/*/metrics.jsonl" \
      python -u experiments/lc/run_lc.py --epochs 500 \
        --factors 1.0 0.5 0.25 0.1 0.05 \
        --out experiments/lc/runs500 --results "$LC5"
  elif xl_data_ready && [ "$(xl_epoch)" -lt 450 ]; then
    log "attempt $attempt: espaloma-proxy XL top-up (at epoch $(xl_epoch))"
    run_xl_stage 1.0
  elif [ "$(hpo_trials)" -lt 16 ]; then
    log "attempt $attempt: HPO sweep (at $(hpo_trials) trials)"
    run_watched 14400 /tmp/hpo_r5.log \
      "experiments/hpo/sweep/trials.jsonl experiments/hpo/sweep/*/metrics.jsonl" \
      python -u experiments/hpo/run_hpo.py --trials 16 --epochs 150
  else
    log "ALL STAGES DONE"
    exit 0
  fi
  sleep 60
done
log "giving up after 200 attempts"
exit 1
