#!/bin/bash
# Round-4 continuation #3 (post-restart): remaining CPU ref phases, strictly
# serial (1-core host). c4_s2's ref was interrupted mid-run by the restart —
# rerun from scratch. c3_s2 ref never ran. Then the c2 (InfoInv) control
# cells: export first (touch .export_done so the TPU ours script can start),
# ref after.
set -e
cd /root/repo
export JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=
run_ref_tri () {  # run_ref_tri <dir> <seed> <gauge_start>
  local dir=$1 seed=$2 gs=$3
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem triplane --iters 600 --alpha-at 300 --upsamp-at 300 \
    --gauge-start "$gs" --phase ref > "results/ab_sweep_r4/$dir/ref.out" 2>&1
  echo "[refs] $dir done $(date -u +%H:%M)"
}
run_c2_export () {  # run_c2_export <dir> <seed>
  local dir=$1 seed=$2
  mkdir -p "results/ab_sweep_r4/$dir"
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase export > "results/ab_sweep_r4/$dir/export.out" 2>&1
  touch "results/ab_sweep_r4/$dir/.export_done"
  echo "[c2 export] $dir done $(date -u +%H:%M)"
}
run_c2_ref () {  # run_c2_ref <dir> <seed>
  local dir=$1 seed=$2
  python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" --seed "$seed" \
    --subsystem infoinv --infoinv 1 --iters 600 --batch 512 --nsamples 384 \
    --alpha-at 300 --phase ref > "results/ab_sweep_r4/$dir/ref.out" 2>&1
  echo "[c2 refs] $dir done $(date -u +%H:%M)"
}
run_ref_tri c4_s2 2 400
run_ref_tri c3_s2 2 1000
run_c2_export c2_s1 1
run_c2_export c2_s2 2
run_c2_ref c2_s1 1
run_c2_ref c2_s2 2
echo "[refs] all done"
