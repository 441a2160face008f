#!/bin/bash
# Round-5 lever probes at FULL 30k-scale occupancy (VERDICT weak #2: the
# gauge steady state is 736 ms/step f32 at auto-cap 736 and neither lever
# was ever measured at that scale). Chains behind results/r5_tpu_queue.sh.
# Each probe resumes the COMPLETED 30k checkpoint (post-upsample geometry,
# auto-cap re-derived from the restored occupancy) and runs 256 steps with
# one lever flipped; steady ms/step comes from the scalars rows
# (tools/analyze_run_wall.py). Quality of bf16 is certified separately by
# the 1600-iter cert the queue runs (results/gauge_cert_bf16_r5); cap-512
# at this scale is a RATE probe only (its quality claim would need a long
# run — recorded as such in NOTES.md).
set -u
cd /root/repo
G=tools/launch_guard.sh

echo "[probes] waiting for r5_tpu_queue 'all done'..."
while ! grep -q "all done" results/r5_tpu_queue.out 2>/dev/null; do sleep 60; done
echo "[probes] starting $(date -u +%H:%M)"

probe () {  # probe <expname> <extra args...>
  local name=$1; shift
  nice -n 10 $G r5-tpu-probes "results/$name/run" -- \
    python main.py --config configs/synthetic_triplane_tpu30k.txt \
      --basedir ./results --expname "$name" \
      --ckpt results/gauge30k_r4b/model.npz \
      --n_iters 30256 --save_every 0 --vis_every 0 --N_vis 0 \
      --prewarm_events 0 "$@"
  echo "[probes] $name done $(date -u +%H:%M)"
}
mkdir -p results/gauge30k_probe_bf16 results/gauge30k_probe_cap512
probe gauge30k_probe_bf16 --compute_dtype bfloat16
probe gauge30k_probe_cap512 --masked_sample_cap 512
echo "[probes] all done $(date -u +%H:%M)"
