#!/usr/bin/env python3
"""Benchmark: lego-scale InfoInv train-step throughput on the local device.

Runs the flagship hot path at the reference's exact lego workload
(4096 rays/iter, 256^3 grid geometry -> 886 samples/ray, 96-channel planes,
InfoInv encoding on — `InfoInv/configs/lego.txt`, `InfoInv/opt.py:24-25`)
and reports rays/sec through the FULL compiled train step (forward +
backward + Adam).

vs_baseline: the reference publishes no numbers (BASELINE.md); the
comparison point is the documented assumption REF_RAYS_PER_SEC below — a
TensoRF-class PyTorch repo at batch 4096 runs ~25-30 it/s on a modern GPU
(~120k rays/s). The driver's north-star target is 5x that on TPU.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/sec", "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

REF_RAYS_PER_SEC = 120_000.0  # assumed PyTorch-reference lego throughput


def main() -> None:
    import numpy as np
    import jax

    from ngf_tpu.config import TrainArgs
    from ngf_tpu.data import make_synthetic_dataset
    from ngf_tpu.train.loop import TriPlaneTrainer
    from ngf_tpu.utils.grid import cal_n_samples

    n_samples = cal_n_samples([256, 256, 256], 0.5)  # 886, the lego workload

    args = TrainArgs(
        subsystem="infoinv",
        infoinv=True,
        dataset_name="synthetic",
        batch_size=4096,
        n_iters=30000,
        nSamples=n_samples,
        vis_every=0,
        N_vis=0,
        save_every=0,
        upsamp_list=[],
        update_AlphaMask_list=[],
        seed=20211202,
        microbatch=4,
        sample_cap=512,
        steps_per_call=32,
    )

    # Synthetic stand-in scene (same camera geometry as lego); the workload
    # is shape-identical to real lego training.
    train_ds = make_synthetic_dataset("train", n_views=4, wh=(200, 200))
    trainer = TriPlaneTrainer(args, train_ds, None, None)

    # Warmup: compile + first blocks.
    trainer.train_block(args.steps_per_call)
    trainer.train_block(args.steps_per_call)

    n_blocks = 6
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        mses = trainer.train_block(args.steps_per_call)
    jax.block_until_ready(trainer.params["plane_xy"])
    dt = time.perf_counter() - t0

    steps = n_blocks * args.steps_per_call
    rays_per_sec = args.batch_size * steps / dt
    assert np.isfinite(mses).all()

    print(
        json.dumps(
            {
                "metric": "infoinv_lego_train_throughput",
                "value": round(float(rays_per_sec), 1),
                "unit": "rays/sec",
                "vs_baseline": round(float(rays_per_sec / REF_RAYS_PER_SEC), 3),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
