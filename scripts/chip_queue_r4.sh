#!/bin/bash
# Round-4 chip work queue: waits for the espaloma-proxy launcher to exit,
# then runs the remaining on-chip items in VERDICT priority order. Each
# item is bounded and logged; failures don't block later items (the chip
# tunnel drops occasionally — every driver here resumes/caches).
#   1. learning-curve sweep (experiments/lc, resumable by design)
#   2. post-fusion step breakdown (f32 + bf16)
#   3. bf16 accuracy-tax per-stage ablations (tpu_convergence)
cd /root/repo || exit 1
Q=/root/repo/experiments/chip_queue_r4.log
PROXY_PID_FILE=/tmp/proxy_launcher.pid

echo "=== queue start $(date) ===" >> "$Q"
if [ -f "$PROXY_PID_FILE" ]; then
  P=$(cat "$PROXY_PID_FILE")
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
echo "=== proxy launcher done; queue begins $(date) ===" >> "$Q"
sleep 30   # let the chip client fully release

echo "--- step breakdown f32 $(date) ---" >> "$Q"
timeout 2400 python benchmarks/step_breakdown.py \
  > /root/repo/benchmarks/step_breakdown_r4_f32.json 2>>"$Q"
echo "breakdown f32 rc=$? $(date)" >> "$Q"

echo "--- step breakdown bf16 $(date) ---" >> "$Q"
timeout 2400 python benchmarks/step_breakdown.py --bf16 \
  > /root/repo/benchmarks/step_breakdown_r4_bf16.json 2>>"$Q"
echo "breakdown bf16 rc=$? $(date)" >> "$Q"

echo "--- lc sweep $(date) ---" >> "$Q"
timeout 10800 python experiments/lc/run_lc.py >> "$Q" 2>&1
echo "lc rc=$? $(date)" >> "$Q"

echo "--- bf16 ablation: GNN bf16 / heads f32 $(date) ---" >> "$Q"
timeout 7200 python experiments/smoke/tpu_convergence.py --epochs 1500 \
  --scan-epochs --gnn-dtype bfloat16 --name tpu-convergence-gnnbf16 \
  >> "$Q" 2>&1
echo "ablation gnn-bf16 rc=$? $(date)" >> "$Q"

echo "--- bf16 ablation: heads bf16 / GNN f32 $(date) ---" >> "$Q"
timeout 7200 python experiments/smoke/tpu_convergence.py --epochs 1500 \
  --scan-epochs --heads-dtype bfloat16 --name tpu-convergence-headsbf16 \
  >> "$Q" 2>&1
echo "ablation heads-bf16 rc=$? $(date)" >> "$Q"

echo "=== queue done $(date) ===" >> "$Q"
