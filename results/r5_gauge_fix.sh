#!/bin/bash
# Round-5 corrected gauge 30k run (see configs/synthetic_triplane_tpu30k_fix.txt
# for the root-cause note). Chains behind the probe script; runs until
# round wind-down — the runner that launches this is responsible for the
# graceful SIGTERM (drained block -> exact resumable checkpoint in the
# committed results/ dir). Dtype is passed by the launcher after the bf16
# cert + rate probe decide it.
set -u
cd /root/repo
G=tools/launch_guard.sh
DTYPE=${1:-float32}

echo "[gauge-fix] waiting for r5_tpu_probes completion marker"
# Anchored marker: the probes log's own "waiting for ... 'all done'" line
# must not satisfy this gate (it did once — launched into a collision).
while ! grep -q "^\[probes\] all done" results/r5_tpu_probes.out 2>/dev/null; do sleep 60; done
echo "[gauge-fix] starting ($DTYPE) $(date -u +%H:%M)"
mkdir -p results/gauge30k_fix_r5
nice -n 10 $G gauge30k_fix results/gauge30k_fix_r5/run -- \
  python main.py --config configs/synthetic_triplane_tpu30k_fix.txt \
    --basedir ./results --expname gauge30k_fix_r5 --save_every 3000 \
    --compute_dtype "$DTYPE"
echo "[gauge-fix] done $(date -u +%H:%M)"
