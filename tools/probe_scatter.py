#!/usr/bin/env python3
"""Scatter-wall measurement probes (VERDICT round-2 item 5).

The training step is bound by the backward scatter-add of plane gradients
(~41M descriptors/s measured round 2, half the 75M/s gather rate). Round 2
reasoned about — but did not measure — the remaining cheap alternatives.
This tool measures them directly on the real chip at the exact shapes of
the certified masked step (4096 rays x 224-cap, 24-ch density planes,
256^2 resolution -> 65536 block-table rows of 96 elements):

  gather        the forward row-gather (rate reference)
  scatter       plain .at[idx].add — what autodiff emits today
  scatter_srt   same with indices_are_sorted=True (hint only, host-sorted)
  scatter_uniq  unique_indices=True (UNSAFE for real grads — rate probe only)
  scatter_duo   half the descriptors, 4x the row bytes (16C duo rows): the
                "blocks-forward / duo-backward" custom-VJP candidate
  sortseg       one argsort + take + segment_sum transpose instead of scatter

Each probe is one small jitted program (scan of 8 reps inside one call, so
the ~30 ms dispatch round-trip amortizes); results print as one JSON line
per probe. Run on the real chip: `python tools/probe_scatter.py`.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

REPS = 8


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def timeit(name, fn, *args, per_desc=None):
    out = fn(*args)
    float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])  # sync
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jnp.ravel(out[0] if isinstance(out, tuple) else out)[0])
        best = min(best, (time.perf_counter() - t0) / REPS)
    rec = {"probe": name, "ms": round(best * 1e3, 2)}
    if per_desc:
        rec["Mdesc_per_s"] = round(per_desc / best / 1e6, 1)
    print(json.dumps(rec), flush=True)
    return best


def main():
    dt = jnp.bfloat16 if os.environ.get("PROBE_DTYPE", "bfloat16") == "bfloat16" else jnp.float32
    M = int(os.environ.get("PROBE_M", str(4096 * 224)))  # descriptors/step/plane
    ROWS = 65536  # 128*128*4 parity-shifted block rows (256^2 plane)
    C = 96  # 4 * 24 density channels per block row
    rng = np.random.default_rng(0)

    # Ray-structured indices: 4096 rays of 224 consecutive-ish rows each,
    # mimicking the real per-ray monotone-but-interleaved row pattern.
    starts = rng.integers(0, ROWS - 512, 4096)
    walk = np.cumsum(rng.integers(0, 3, (4096, M // 4096)), axis=1)
    idx = np.minimum(starts[:, None] + walk, ROWS - 1).astype(np.int32).ravel()
    idx_j = jnp.asarray(idx)
    idx_sorted_j = jnp.asarray(np.sort(idx))
    vals = jnp.asarray(rng.normal(size=(M, C)), dt)
    table = jnp.zeros((ROWS, C), dt)

    log(f"M={M} rows={ROWS} C={C} dtype={dt.__name__}; compiling probes...")

    # Per-rep distinct index arrays: a loop-invariant body gets hoisted out
    # of the scan by XLA (the scatter probes are immune — their carried
    # table forms a per-rep dependency chain).
    idx_reps = jnp.asarray(
        (idx[None, :] + np.arange(REPS)[:, None] * 17) % ROWS, jnp.int32
    )

    # gather rate reference
    @jax.jit
    def gather(tbl, ixs):
        def step(acc, ix):
            return acc + jnp.take(tbl, ix, axis=0).sum(0), 0.0
        out, _ = jax.lax.scan(step, jnp.zeros((C,), dt), ixs)
        return out

    timeit("gather", gather, jnp.asarray(rng.normal(size=(ROWS, C)), dt),
           idx_reps, per_desc=M)

    def make_scatter(**kw):
        @jax.jit
        def scatter(tbl, ix, v):
            def step(carry, _):
                return carry.at[ix].add(v, **kw), 0.0
            out, _ = jax.lax.scan(step, tbl, None, length=REPS)
            return out
        return scatter

    timeit("scatter", make_scatter(), table, idx_j, vals, per_desc=M)
    timeit("scatter_srt", make_scatter(indices_are_sorted=True), table,
           idx_sorted_j, vals, per_desc=M)
    timeit("scatter_uniq", make_scatter(unique_indices=True), table,
           idx_j, vals, per_desc=M)

    # duo-backward shape: half the descriptors, 16C rows, quarter the table rows
    vals_duo = jnp.asarray(rng.normal(size=(M // 2, 4 * C)), dt)
    idx_duo = jnp.asarray(idx[::2] // 4)
    table_duo = jnp.zeros((ROWS // 4, 4 * C), dt)
    timeit("scatter_duo", make_scatter(), table_duo, idx_duo, vals_duo,
           per_desc=M // 2)

    # quad-backward shape: quarter the descriptors, 6x6-tile rows (36C)
    vals_quad = jnp.asarray(rng.normal(size=(M // 4, 36 * (C // 4))), dt)
    idx_quad = jnp.asarray(idx[::4] // 4)
    table_quad = jnp.zeros((ROWS // 4, 36 * (C // 4)), dt)
    timeit("scatter_quad", make_scatter(), table_quad, idx_quad, vals_quad,
           per_desc=M // 4)

    # one-sort segment-sum transpose
    @jax.jit
    def sortseg(ixs, v):
        def step(acc, ix):
            order = jnp.argsort(ix)
            sv = jnp.take(v, order, axis=0)
            si = jnp.take(ix, order)
            seg = jax.ops.segment_sum(sv, si, num_segments=ROWS,
                                      indices_are_sorted=True)
            return acc + seg, 0.0
        out, _ = jax.lax.scan(step, jnp.zeros((ROWS, C), dt), ixs)
        return out

    timeit("sortseg", sortseg, idx_reps, vals, per_desc=M)


if __name__ == "__main__":
    main()
