#!/bin/bash
# Round-4 continuation #4 (post-restart): the two remaining CPU ref phases
# (c2 control cells). c2_s1's previous ref was killed at iteration 260 by the
# session restart — rerun from scratch; c2_s2's never started. Exports for
# both cells are already on disk (.export_done). Strictly serial (1-core host).
set -e
cd /root/repo
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
run_c2_ref () {  # run_c2_ref <dir> <seed>
  local dir=$1 seed=$2
  rm -rf "results/ab_sweep_r4/$dir/log/ref"
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase ref > "results/ab_sweep_r4/$dir/ref.out" 2>&1
  echo "[c2 refs] $dir done $(date -u +%H:%M)"
}
run_c2_ref c2_s1 1
run_c2_ref c2_s2 2
echo "[refs5] all done"
