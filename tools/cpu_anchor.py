#!/usr/bin/env python3
"""Measured CPU anchor for BENCH `vs_baseline` (BASELINE.md row).

`bench.py` reports `vs_baseline` against BASELINE.json's 120k rays/s
GPU-class *assumption* — unmeasurable here (no GPU, no reference data).
This tool records the one measurable endpoint this host offers: the
reference's own torch train step (`/root/reference/InfoInv/main.py:262-299`,
run unmodified via the `reference_ab` shims) at the HEADLINE lego workload
shape — batch_size 4096 (`InfoInv/opt.py:24`), 256^3 grid, nSamples =
cal_n_samples(reso, step_ratio=0.5) (`InfoInv/main.py:218-219`) — on this
host's single CPU core. Image content is the bundled synthetic blender
export (step cost is workload-shape-, not content-, dependent at a fixed
occupancy = none: no alpha mask, all in-aabb samples evaluated densely,
which is exactly the reference's state for iterations 0..2000).

Output: one JSON line + results/cpu_anchor_r5.json with
  ref_cpu_s_per_step, ref_cpu_rays_per_s  (median of N timed steps)

Usage:  JAX not involved. ~10-20 min on this host.
  python tools/cpu_anchor.py [--scene results/ab_sweep_r4/c2_s1/scene]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--scene", default="results/ab_sweep_r4/c2_s1/scene",
                   help="blender-format scene dir (reference loader input)")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--steps", type=int, default=10)
    p.add_argument("--infoinv", type=int, default=1)
    p.add_argument("--out", default="results/cpu_anchor_r5.json")
    a = p.parse_args()

    import reference_ab
    reference_ab._install_shims()
    ref_dir = reference_ab.REF_DIRS["infoinv"]
    sys.path.insert(0, ref_dir)

    import torch
    torch.manual_seed(20211202)
    np.random.seed(20211202)

    from dataLoader import dataset_dict
    from models.Field import TriPlane  # noqa: F401 (reference model)
    from utils import SimpleSampler, N_to_reso, cal_n_samples

    ds = dataset_dict["blender"](a.scene, split="train",
                                 downsample=800.0 / 64, is_stack=False)
    device = "cpu"
    aabb = ds.scene_bbox.to(device)
    reso = N_to_reso(256 ** 3, aabb)
    n_samples = int(cal_n_samples(reso, 0.5))
    field = TriPlane(aabb, reso, device, near_far=ds.near_far,
                     alphaMask_thres=1e-4, distance_scale=25,
                     step_ratio=0.5)
    grad_vars = field.get_optparam_groups(0.02, 1e-3)
    optimizer = torch.optim.Adam(grad_vars, betas=(0.9, 0.99))

    allrays, allrgbs = field.filtering_rays(ds.all_rays, ds.all_rgbs,
                                            bbox_only=True)
    sampler = SimpleSampler(allrays.shape[0], a.batch)

    def step() -> float:
        t0 = time.time()
        idx = sampler.nextids()
        rays, rgbs = allrays[idx], allrgbs[idx]
        out = field(rays, is_train=True, white_bg=ds.white_bg,
                    N_samples=n_samples, infoinv=bool(a.infoinv))
        loss = torch.mean((out["rgb_map"] - rgbs) ** 2)
        loss = loss + 8e-5 * field.density_L1()
        optimizer.zero_grad()
        loss.backward()
        optimizer.step()
        return time.time() - t0

    for _ in range(a.warmup):
        step()
    times = [step() for _ in range(a.steps)]
    med = float(np.median(times))
    result = {
        "what": "reference InfoInv torch train step, unmodified, this host CPU",
        "workload": {"batch_size": a.batch, "grid": "256^3",
                     "n_samples": n_samples, "infoinv": bool(a.infoinv),
                     "occupancy_mask": None},
        "host": "1-core CPU (nproc=1)",
        "ref_cpu_s_per_step": round(med, 3),
        "ref_cpu_rays_per_s": round(a.batch / med, 1),
        "steps_timed": a.steps,
        "per_step_s": [round(t, 3) for t in times],
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, a.out), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
