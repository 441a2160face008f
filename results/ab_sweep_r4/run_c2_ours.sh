#!/bin/bash
set -e
cd /root/repo
run_ours () {  # run_ours <dir> <seed>
  local dir=$1 seed=$2
  nice -n 15 python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase ours --ours-device tpu > "results/ab_sweep_r4/$dir/ours_tpu.out" 2>&1
  echo "[c2 ours] $dir done $(date -u +%H:%M)"
}
run_ours c2_s1 1
run_ours c2_s2 2
echo "[c2 ours] all done"
