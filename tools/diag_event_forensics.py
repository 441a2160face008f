#!/usr/bin/env python3
"""Round-5 @2500-collapse forensics (CPU).

Loads the pre-event checkpoint (diag E4: the corrected gauge config stopped
at iteration 2496, four steps before the second mask event) and renders a
held-out view under each ingredient the @2500 event changes, isolating
which one causes the measured INSTANT 50x train-MSE jump
(results/diag_e1/scalars.jsonl: 6.8e-6 @2500 -> 3.4e-4 @2516):

  A  grid@2000 (from the ckpt) + cap 704      == the pre-event stage
  B  chained rebuild grid      + cap 640      == the post-event stage (E1)
  C  chained rebuild grid      + cap 704      == E6's stage (grid-only delta)
  D  fresh rebuild (prev=None) + cap 704      == chaining's own contribution
  E  grid@2000 + cap 0 (dense, no compaction) == capacity's contribution

Run: JAX_PLATFORMS=cpu python tools/diag_event_forensics.py [ckpt]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "results/diag_e4/model.npz"
    from ngf_tpu.data import make_synthetic_dataset
    from ngf_tpu.fields.triplane import TriPlaneConfig
    from ngf_tpu.render.volume import RenderConfig, render_rays
    from ngf_tpu.train.occupancy import AlphaGrid, update_alpha_mask
    from ngf_tpu.utils.checkpoint import load_checkpoint

    params, meta, vol, vaabb = load_checkpoint(ckpt)
    params = jax.tree.map(jnp.asarray, params)
    cfg = TriPlaneConfig(**meta["model_cfg"])
    aabb = np.asarray(meta["aabb"], np.float32)
    step = float(meta["step_size"])
    n_samples = int(meta["n_samples"])
    print(f"ckpt it={meta['iteration']} step={step:.6f} n={n_samples} "
          f"grid_size={meta['grid_size']}")

    grid_2000 = AlphaGrid(
        jnp.asarray(vol), jnp.asarray(vaabb)
    ).build_table()
    r = 128
    grid_chained, _ = update_alpha_mask(
        params, cfg, aabb, step, grid_size=(r, r, r), alpha_thres=1e-4,
        prev=grid_2000)
    grid_fresh, _ = update_alpha_mask(
        params, cfg, aabb, step, grid_size=(r, r, r), alpha_thres=1e-4,
        prev=None)
    for name, g in [("grid@2000", grid_2000), ("chained", grid_chained),
                    ("fresh", grid_fresh)]:
        print(f"  occupancy[{name}] = {float(jnp.mean(g.volume > 0.5)):.4f}")

    test = make_synthetic_dataset("test", n_views=2, wh=(128, 128))
    view = 0
    rays = np.asarray(test.all_rays[view].reshape(-1, 6), np.float32)
    gt = np.asarray(test.all_rgbs[view].reshape(-1, 3), np.float32)

    base = RenderConfig(
        aabb=tuple(map(tuple, aabb.tolist())),
        near=float(meta["near_far"][0]), far=float(meta["near_far"][1]),
        n_samples=n_samples, step_size=step,
        distance_scale=25.0, ray_march_weight_thres=1e-4, white_bg=True,
        sample_cap=704, rgb_cap=0, mask_stride=1, group_size=8,
        fused_fetch=True,
    )  # knobs mirror the 30k config's shipped defaults (config.py)

    cases = [
        ("A grid@2000 cap704  (pre-event stage)", grid_2000, 704),
        ("B chained   cap640  (post-event stage)", grid_chained, 640),
        ("C chained   cap704  (grid-only delta)", grid_chained, 704),
        ("D fresh     cap704  (chain vs fresh)", grid_fresh, 704),
        ("E grid@2000 dense   (no compaction)", grid_2000, 0),
    ]
    results = {}
    for label, grid, cap in cases:
        rcfg = dataclasses.replace(
            base, sample_cap=cap, group_size=0 if cap == 0 else 8)

        @jax.jit
        def render(p, rays_in, vol_, vaabb_, vtable_, _rcfg=rcfg):
            out = render_rays(p, cfg, _rcfg, rays_in, None, is_train=False,
                              iteration=jnp.int32(10 ** 6),
                              alpha_volume=vol_, alpha_aabb=vaabb_,
                              alpha_table=vtable_)
            return out["rgb_map"]

        chunks = []
        for i in range(0, rays.shape[0], 4096):
            part = jnp.asarray(rays[i:i + 4096])
            chunks.append(np.asarray(
                render(params, part, grid.volume, grid.aabb, grid.table)))
        rgb = np.concatenate(chunks)
        mse = float(np.mean((rgb - gt) ** 2))
        psnr = -10 * np.log10(mse)
        results[label] = round(psnr, 2)
        print(f"  {label}: {psnr:.2f} dB")
    out_path = os.path.join(os.path.dirname(ckpt), "forensics.json")
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
