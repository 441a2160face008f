#!/bin/bash
# Round-4 continuation #3: relaunch the gauge TriPlane 30k certification run
# FROM SCRATCH (the previous preemption checkpoint lived in gitignored log/
# and was wiped by the round restart). Two changes vs the previous attempt:
#   * basedir points into committed results/ so the preemption checkpoint
#     survives round restarts (round 5 resumes with --ckpt; ~150 MB npz is
#     committed once at wind-down),
#   * save_every 3000 bounds crash loss (periodic saves overwrite the same
#     model.npz; only the wind-down state gets committed).
# Gated on the A/B sweep's TPU work draining: the run_ours4.sh serial queue
# (c2 control cells) AND the interactively slotted c4_s0 rerun (which fills
# the TPU idle window while the c2 scene exports wait on two CPU ref runs).
set -e
cd /root/repo
while ! grep -q "all done" results/ab_sweep_r4/run_ours4.out 2>/dev/null; do sleep 30; done
while ! grep -aq "'preempted': False" results/ab_sweep_r4/c4_s0/ours_tpu.out 2>/dev/null; do sleep 30; done
nice -n 10 tools/launch_guard.sh gauge30k_r4b results/gauge30k_r4/run_b -- \
    python main.py --config configs/synthetic_triplane_tpu30k.txt \
    --basedir ./results --expname gauge30k_r4b --save_every 3000
echo "[gauge30k] done $(date -u +%H:%M)"
