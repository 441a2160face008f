#!/bin/bash
# Round-5 CPU work queue — chains behind the UV-Mapping reference A/B run
# (this host has ONE core: CPU-heavy jobs are serialized, CLAUDE.md).
#   1. UV A/B "ours" phase + report: BASELINE config #5's first measured
#      quality gap (VERDICT round-4 missing item 1).
#   2. Reference torch sides for the new sweep cells (c2_s3 control,
#      c1_s1/c1_s2 config #1 seeds) — VERDICT item 5, n>=3 per config.
#   3. Regenerate BANDS.json (the TPU queue supplies the ours sides).
set -u
cd /root/repo
G=tools/launch_guard.sh

pid=$(cat /tmp/uv_ref.pid 2>/dev/null || echo 0)
echo "[cpu-queue] waiting for UV ref run (pid $pid)..."
while [ "$pid" != 0 ] && kill -0 "$pid" 2>/dev/null; do sleep 60; done
echo "[cpu-queue] UV ref done at $(date -u +%H:%M)"

nice -n 8 $G r5-cpu-queue results/uv_ab_r5/ours -- \
  python tools/reference_uv_ab.py --out results/uv_ab_r5 --phase ours --iters 3000
nice -n 8 $G r5-cpu-queue results/uv_ab_r5/report -- \
  python tools/reference_uv_ab.py --out results/uv_ab_r5 --phase report
echo "[cpu-queue] UV A/B complete $(date -u +%H:%M)"

run_ref () {  # run_ref <dir> <seed> <infoinv>
  local dir=$1 seed=$2 inf=$3
  nice -n 8 $G r5-cpu-queue "results/ab_sweep_r4/$dir/ref" -- \
    python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" \
      --seed "$seed" --subsystem infoinv --infoinv "$inf" --iters 600 \
      --batch 512 --nsamples 384 --alpha-at 300 --phase ref
  echo "[cpu-queue] $dir ref done $(date -u +%H:%M)"
}
run_ref c2_s3 3 1
run_ref c1_s1 1 0
run_ref c1_s2 2 0

python tools/ab_sweep_report.py results/ab_sweep_r4 --json \
  > results/ab_sweep_r4/report_r5.out 2>&1 || true
echo "[cpu-queue] all done $(date -u +%H:%M)"
