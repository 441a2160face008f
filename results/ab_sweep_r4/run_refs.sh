#!/bin/bash
# Chained CPU ref phases for the round-4 seeded A/B (single-core host:
# strictly serial). TPU ours phases are driven separately as each ref
# completes (tools/reference_ab.py --ours-device tpu).
set -e
cd /root/repo
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=

run () {  # run <dir> <seed> <gauge_start>
  local dir=$1 seed=$2 gs=$3
  mkdir -p "results/ab_sweep_r4/$dir"
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
    --gauge-start "$gs" --phase export > "results/ab_sweep_r4/$dir/export.out" 2>&1
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
    --gauge-start "$gs" --phase ref > "results/ab_sweep_r4/$dir/ref.out" 2>&1
  echo "[refs] $dir done $(date -u +%H:%M)"
}

run c4_s1 1 400
run c4_s2 2 400
run c3_s2 2 1000
echo "[refs] all done"
