#!/bin/bash
# Round-4 continuation: remaining CPU ref phases, strictly serial (1-core host).
set -e
cd /root/repo
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
run_ref () {  # run_ref <dir> <seed> <gauge_start>
  local dir=$1 seed=$2 gs=$3
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
    --gauge-start "$gs" --phase ref > "results/ab_sweep_r4/$dir/ref.out" 2>&1
  echo "[refs] $dir done $(date -u +%H:%M)"
}
run_ref c4_s1 1 400
run_ref c4_s2 2 400
run_ref c3_s2 2 1000
echo "[refs] all done"
