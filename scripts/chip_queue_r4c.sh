#!/bin/bash
# Queue C: re-run the f32 breakdown (now with model_only_value_and_grad)
# after queue B finishes, then a warm bench.py for the driver.
cd /root/repo || exit 1
Q=/root/repo/experiments/chip_queue_r4.log
if [ -f /tmp/chip_queue_b.pid ]; then
  P=$(cat /tmp/chip_queue_b.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
sleep 15
echo "--- step breakdown f32 rerun (model_only) $(date) ---" >> "$Q"
timeout 2400 python benchmarks/step_breakdown.py \
  > /root/repo/benchmarks/step_breakdown_r4_f32.json 2>>"$Q"
echo "breakdown rerun rc=$? $(date)" >> "$Q"
echo "--- warm bench $(date) ---" >> "$Q"
timeout 3000 python bench.py > /root/repo/benchmarks/bench_r4_warm.json 2>>"$Q"
echo "warm bench rc=$? $(date)" >> "$Q"
echo "=== queue C done $(date) ===" >> "$Q"
