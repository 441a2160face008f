#!/bin/bash
# Round-4 continuation #4 (post-restart): remaining TPU ours phases (c2
# control cells; c2_s1's previous attempt was killed right after startup by
# the session restart), niced so the concurrent torch ref runs keep the
# single core. When the sweep's TPU queue drains, chain straight into the
# gauge TriPlane 30k certification run (results/gauge30k_r4/run_gauge30k_b.sh
# rationale: checkpoint lands in committed results/gauge30k_r4b/).
set -e
cd /root/repo
run_ours_c2 () {  # run_ours_c2 <dir> <seed>
  local dir=$1 seed=$2
  rm -rf "results/ab_sweep_r4/$dir/log/ours"
  nice -n 15 python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase ours --ours-device tpu \
    > "results/ab_sweep_r4/$dir/ours_tpu.$(date -u +%m%d%H%M).out" 2>&1
  echo "[c2 ours] $dir done $(date -u +%H:%M)"
}
run_ours_c2 c2_s1 1
run_ours_c2 c2_s2 2
echo "[ours6] all done"
mkdir -p results/gauge30k_r4
nice -n 10 tools/launch_guard.sh gauge30k_r4b results/gauge30k_r4/run_b -- \
    python main.py --config configs/synthetic_triplane_tpu30k.txt \
    --basedir ./results --expname gauge30k_r4b --save_every 3000
echo "[gauge30k] done $(date -u +%H:%M)"
