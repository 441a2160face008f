#!/usr/bin/env python3
"""Isolate the duo-backward VJP cost vs plain blocks autodiff at step shape.

bench showed duo_bwd REGRESSING end-to-end (126 vs 106 ms/step at cap 192)
while the raw scatter probe says duo rows save 5.5 ms/plane. This measures
the full VJP of one plane sample in isolation:

  blocks_grad      autodiff through _grid_sample_2d_blocks (plane grad only)
  duobwd_grad      custom VJP (plane grad only — coord branch should DCE)
  duobwd_grad_xy   custom VJP, grad wrt plane AND coords (coord branch live)
  blocks_grad_xy   autodiff, grad wrt plane AND coords

Run on the real chip: python tools/probe_duobwd.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ngf_tpu.ops.grid_sample import (  # noqa: E402
    _grid_sample_2d_blocks,
    grid_sample_2d_blocks_duobwd,
)

REPS = 8


def timeit(name, fn, *args):
    out = fn(*args)
    float(jnp.ravel(jax.tree.leaves(out)[0])[0])
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(jax.tree.leaves(out)[0])[0])
        best = min(best, (time.perf_counter() - t0) / REPS)
    print(json.dumps({"probe": name, "ms": round(best * 1e3, 2)}), flush=True)


def main():
    dt = jnp.bfloat16
    res, C = 256, 24
    n_rays, cap = 4096, int(os.environ.get("PROBE_CAP", "192"))
    rng = np.random.default_rng(0)
    plane = jnp.asarray(rng.normal(size=(res, res, C)), dt)

    # ray-consecutive pair coords (<= 0.5 texel/step)
    base = rng.uniform(-0.98, 0.98, (n_rays, cap // 2, 2)).astype(np.float32)
    step = 0.5 * (2.0 / (res - 1))
    delta = rng.uniform(-1, 1, (n_rays, cap // 2, 2)).astype(np.float32) * step
    coords = jnp.asarray(
        np.stack([base, base + delta], axis=2).reshape(n_rays, cap, 2)
    )
    # REPS distinct cotangents: a loop-INVARIANT grad body gets hoisted out
    # of the scan by XLA (measured: an 8x underestimate), so every rep must
    # consume different data.
    cots = jnp.asarray(rng.normal(size=(REPS, n_rays, cap, C)), dt)

    def make(fn, wrt_coords):
        def loss(p, c, cot):
            return jnp.sum((fn(p, c) * cot).astype(jnp.float32))

        g = jax.grad(loss, argnums=(0, 1) if wrt_coords else 0)

        @jax.jit
        def run(p, c, cots):
            def step(acc, cot):
                out = g(p, c, cot)
                leaf = jax.tree.leaves(out)[0]
                return acc + leaf.astype(jnp.float32).sum(), 0.0

            out, _ = jax.lax.scan(step, jnp.float32(0.0), cots)
            return out

        return run

    print(f"res={res} C={C} N={n_rays*cap}", file=sys.stderr, flush=True)
    timeit("blocks_grad", make(_grid_sample_2d_blocks, False), plane, coords, cots)
    timeit("duobwd_grad", make(grid_sample_2d_blocks_duobwd, False), plane, coords, cots)
    timeit("blocks_grad_xy", make(_grid_sample_2d_blocks, True), plane, coords, cots)
    timeit("duobwd_grad_xy", make(grid_sample_2d_blocks_duobwd, True), plane, coords, cots)


if __name__ == "__main__":
    main()
