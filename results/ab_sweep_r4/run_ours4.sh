#!/bin/bash
# Round-4 continuation #3 (post-restart): remaining TPU ours phases, serial,
# niced so the concurrent torch ref runs keep the single core. c4_s2's
# previous ours run was gracefully preempted at iteration 8 by the restart —
# clear its stale log and rerun from scratch (its scene is already exported).
# Then the c2 control cells once run_refs4.sh has exported their scenes.
set -e
cd /root/repo
run_ours_tri () {  # run_ours_tri <dir> <seed> <gauge_start>
  local dir=$1 seed=$2 gs=$3
  rm -rf "results/ab_sweep_r4/$dir/log/ours"
  nice -n 15 python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
    --gauge-start "$gs" --phase ours --ours-device tpu > "results/ab_sweep_r4/$dir/ours_tpu.out" 2>&1
  echo "[ours] $dir done $(date -u +%H:%M)"
}
run_ours_c2 () {  # run_ours_c2 <dir> <seed>
  local dir=$1 seed=$2
  while [ ! -f "results/ab_sweep_r4/$dir/.export_done" ]; do sleep 20; done
  rm -rf "results/ab_sweep_r4/$dir/log/ours"
  nice -n 15 python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase ours --ours-device tpu > "results/ab_sweep_r4/$dir/ours_tpu.out" 2>&1
  echo "[c2 ours] $dir done $(date -u +%H:%M)"
}
run_ours_tri c4_s2 2 400
run_ours_c2 c2_s1 1
run_ours_c2 c2_s2 2
echo "[ours] all done"
