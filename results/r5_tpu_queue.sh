#!/bin/bash
# Round-5 TPU work queue — runs the moment the gauge 30k run (PID in
# /tmp/gauge30k_r5.pid, fallback 15581) releases the chip. Serial on the
# one device; every launch goes through tools/launch_guard.sh (flock +
# attempt-numbered logs — the round-4 duplicate-runner fix).
#
#   1. Full-budget test eval of the finished gauge 30k model (the
#      reference TriPlane lego budget has never been completed before —
#      VERDICT round-4 item 1's "done" criterion needs this PSNR row).
#   2. bf16 gauge quality cert at the 1600-iter schedule (VERDICT weak #2
#      lever (a) — bf16 is certified for InfoInv/UV, never for gauge).
#   3. A/B sweep cells on TPU: c2_s1 ours RERUN (round-4 ADVICE: the
#      committed artifact is unreproducible), c2_s3 (third fresh control
#      cell), c1_s1/c1_s2 (config #1 seeds) — VERDICT item 5, n>=3 bands.
set -u
cd /root/repo
G=tools/launch_guard.sh

pid=$(cat /tmp/gauge30k_r5.pid 2>/dev/null || echo 15581)
echo "[queue] waiting for gauge 30k (pid $pid) to finish..."
while kill -0 "$pid" 2>/dev/null; do sleep 60; done
echo "[queue] chip free at $(date -u +%H:%M) — starting"

# 1. full-budget eval (render-only re-entry, InfoInv/main.py:22-58 analog)
nice -n 10 $G r5-tpu-queue results/gauge30k_r4b/eval30k -- \
  python main.py --config configs/synthetic_triplane_tpu30k.txt \
    --basedir ./results --expname gauge30k_r4b \
    --render_only 1 --render_test 1 --ckpt results/gauge30k_r4b/model.npz
echo "[queue] eval done $(date -u +%H:%M)"

# 2. bf16 gauge cert
mkdir -p results/gauge_cert_bf16_r5
nice -n 10 $G r5-tpu-queue results/gauge_cert_bf16_r5/run -- \
  python main.py --config configs/synthetic_triplane_tpu_bf16.txt \
    --basedir ./results --expname gauge_cert_bf16_r5 --render_test 1
echo "[queue] bf16 cert done $(date -u +%H:%M)"

# 3. sweep cells (ours sides, TPU)
run_ours () {  # run_ours <dir> <seed> <infoinv> <tag>
  local dir=$1 seed=$2 inf=$3 tag=$4
  rm -rf "results/ab_sweep_r4/$dir/log/ours"
  nice -n 10 $G r5-tpu-queue "results/ab_sweep_r4/$dir/$tag" -- \
    python tools/reference_ab.py --out "results/ab_sweep_r4/$dir" \
      --seed "$seed" --subsystem infoinv --infoinv "$inf" --iters 600 \
      --batch 512 --nsamples 384 --alpha-at 300 --phase ours \
      --ours-device tpu
  echo "[queue] $dir ours done $(date -u +%H:%M)"
}
run_ours c2_s1 1 1 ours_tpu.rerun_r5
run_ours c2_s3 3 1 ours_tpu
run_ours c1_s1 1 0 ours_tpu
run_ours c1_s2 2 0 ours_tpu
echo "[queue] all done $(date -u +%H:%M)"
