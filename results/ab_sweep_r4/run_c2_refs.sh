#!/bin/bash
# Config #2 (InfoInv) control cells for the seeded noise band. Protocol
# matches the round-3 matrix run exactly (PARITY.md: 24 views @64^2,
# 600 iters, batch 512, nSamples 384, alpha @300); that run (seed
# 20211202, gap +0.08) is the third sample.
set -e
cd /root/repo
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
run_cell () {  # run_cell <dir> <seed>
  local dir=$1 seed=$2
  mkdir -p "results/ab_sweep_r4/$dir"
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase export > "results/ab_sweep_r4/$dir/export.out" 2>&1
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase ref > "results/ab_sweep_r4/$dir/ref.out" 2>&1
  echo "[c2 refs] $dir done $(date -u +%H:%M)"
}
run_cell c2_s1 1
run_cell c2_s2 2
echo "[c2 refs] all done"
