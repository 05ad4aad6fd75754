#!/bin/bash
# Follow-on chip queue: shape rooflines after chip_queue_r4.sh finishes.
cd /root/repo || exit 1
Q=/root/repo/experiments/chip_queue_r4.log
if [ -f /tmp/chip_queue.pid ]; then
  P=$(cat /tmp/chip_queue.pid)
  while kill -0 "$P" 2>/dev/null; do sleep 60; done
fi
sleep 15
echo "--- shape roofline f32 $(date) ---" >> "$Q"
timeout 2400 python benchmarks/shape_roofline.py \
  > /root/repo/benchmarks/shape_roofline_r4_f32.json 2>>"$Q"
echo "roofline f32 rc=$? $(date)" >> "$Q"
echo "--- shape roofline bf16 $(date) ---" >> "$Q"
timeout 2400 python benchmarks/shape_roofline.py --bf16 \
  > /root/repo/benchmarks/shape_roofline_r4_bf16.json 2>>"$Q"
echo "roofline bf16 rc=$? $(date)" >> "$Q"
echo "=== queue B done $(date) ===" >> "$Q"
