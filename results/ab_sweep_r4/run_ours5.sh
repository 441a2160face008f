#!/bin/bash
# Round-4 continuation #3b: rerun c4_s0's ours cell. The audit found its
# original run was gracefully preempted at iteration 300/600 (the gauge-30k
# relaunch SIGTERMed it), so its 39.74 dB is a half-trained model, not a
# valid A/B cell. Waits for run_ours4.sh's serial TPU queue to drain first.
set -e
cd /root/repo
while ! grep -q "all done" results/ab_sweep_r4/run_ours4.out 2>/dev/null; do sleep 30; done
rm -rf results/ab_sweep_r4/c4_s0/log/ours
nice -n 15 python tools/reference_ab.py --out results/ab_sweep_r4/c4_s0 --seed 0 \
  --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
  --gauge-start 400 --phase ours --ours-device tpu > results/ab_sweep_r4/c4_s0/ours_tpu.out 2>&1
echo "[ours] c4_s0 rerun done $(date -u +%H:%M)"
