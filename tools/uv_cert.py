#!/usr/bin/env python3
"""On-chip UV-Mapping quality certification.

Trains the NeuTex UV pipeline on the synthetic DTU stand-in at the
reference workload shape (`UV-Mapping/dtu_train.sh`: balanced 24^2 rays,
64 samples, 2500 template points, lr 1e-4), then renders the held-out
novel-view ring offset (SyntheticDtuDataset(use_test_data=True)) and
reports one JSON line: final losses, novel-view color PSNR, and
silhouette IoU ((1 - transmittance) > 0.5 vs the analytic mask).

Used to certify that a compute-dtype (or any trainer change) preserves
quality: run once per configuration and diff the JSON.

    python tools/uv_cert.py --dtype bfloat16 --steps 12000
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--primitive", default="square",
                   choices=["square", "sphere"])
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--wh", type=int, default=64)
    p.add_argument("--steps_per_call", type=int, default=50)
    p.add_argument("--seed", type=int, default=0)
    a = p.parse_args()

    from ngf_tpu.data.dtu import SyntheticDtuDataset
    from ngf_tpu.fields.neutex import NeuTexConfig
    from ngf_tpu.train.uv_loop import UVTrainer

    ds = SyntheticDtuDataset(
        n_views=a.views, wh=(a.wh, a.wh), random_sample="balanced",
        random_sample_size=24, seed=a.seed,
    )
    cfg = NeuTexConfig(
        primitive_type=a.primitive, sample_num=64,
        points_per_primitive=2500, compute_dtype=a.dtype,
    )
    trainer = UVTrainer(cfg, ds, lr=1e-4, niter=a.steps, seed=a.seed)

    t0 = time.time()
    done, last = 0, {}
    while done < a.steps:
        n = min(a.steps_per_call, a.steps - done)
        losses = trainer.train_block([ds.sample() for _ in range(n)])
        done += n
        last = {k: float(np.mean(v)) for k, v in losses.items()}
        if done % 2000 < a.steps_per_call:
            print(f"[{time.time()-t0:6.1f}s] step {done}: "
                  + ", ".join(f"{k}={v:.5f}" for k, v in last.items()),
                  file=sys.stderr, flush=True)
    train_s = time.time() - t0

    test = SyntheticDtuDataset(
        n_views=a.views, wh=(a.wh, a.wh), use_test_data=True, seed=a.seed,
    )
    psnrs, ious = [], []
    for i in test.indexes:
        rgb, trans = trainer.render_view(
            test.campos[i], test.height, test.width, test.focal[i],
            test.extrinsics[i, :3, :3], test.princpt[i], chunk=576,
        )
        mse = float(np.mean((rgb - test.gt_image[i]) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-12)))
        pred = (1.0 - trans) > 0.5
        gt = test.gt_mask[i] > 0.5
        inter = float(np.logical_and(pred, gt).sum())
        union = float(np.logical_or(pred, gt).sum())
        ious.append(inter / max(union, 1.0))

    print(json.dumps({
        "dtype": a.dtype, "primitive": a.primitive, "steps": a.steps,
        "train_s": round(train_s, 1),
        "final_losses": {k: round(v, 5) for k, v in last.items()},
        "novel_color_psnr_db": round(float(np.mean(psnrs)), 2),
        "novel_silhouette_iou": round(float(np.mean(ious)), 4),
        "per_view_psnr": [round(x, 2) for x in psnrs],
    }))


if __name__ == "__main__":
    main()
