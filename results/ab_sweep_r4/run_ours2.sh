#!/bin/bash
# Round-4 continuation: remaining TPU ours phases, serial, niced so the
# concurrent torch ref runs keep the single core.
set -e
cd /root/repo
run_ours () {  # run_ours <dir> <seed> <gauge_start>
  local dir=$1 seed=$2 gs=$3
  nice -n 15 python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
    --gauge-start "$gs" --phase ours --ours-device tpu > "results/ab_sweep_r4/$dir/ours_tpu.out" 2>&1
  echo "[ours] $dir done $(date -u +%H:%M)"
}
run_ours c4_s0 0 400
run_ours c4_s1 1 400
run_ours c3_s2 2 1000
run_ours c4_s2 2 400
echo "[ours] all done"
