"""Run-amortized tiled plane gathers: one descriptor serves R samples.

TPU XLA gathers are descriptor-rate bound (~75M rows/s on v5e, measured;
see NOTES.md): the round-1 'blocks' formulation (ngf_tpu/ops/grid_sample.py)
already fetches a whole 2x2 bilinear stencil as ONE table row. This module
generalizes the idea along the *ray* axis: consecutive samples along a ray
move by a STATICALLY KNOWN texel distance per step (step_size / unit_axis,
all static floats in RenderConfig), so a T x T texel tile anchored at the
first sample of a run of R consecutive samples provably contains the 2x2
stencils of all R samples. Fetching that tile as one table row divides the
plane-gather (and backward scatter) descriptor count by R.

Geometry (per axis, texel units u = (c+1)/2*(size-1)):
- per-step movement delta <= step_world / unit_axis  (direction component
  <= 1 in magnitude), so a run of R samples spans at most D = (R-1)*delta
  texels from its anchor (both signs possible).
- tile origins lie on multiples of Q; the anchor's texel a0 = floor(u0)
  selects origin o = Q*floor(a0/Q) - pad with pad = ceil(D).
- any run sample's stencil [floor(u), floor(u)+1] lies in
  [a0 - ceil(D), a0 + ceil(D) + 1] subset of [o, o + T - 1] when
  T = 2*ceil(D) + Q + 1.
- anchors may be out-of-bbox (invalid neighbors of valid samples are still
  on the ray line, at most D texels away), so the table is built over the
  padded index range [-pad - Q, size + pad + Q) and row indices are computed
  with that offset; contributions of invalid samples are masked to zero by
  the caller exactly like the dense path.

Everything is jnp.take + reshapes: differentiable, and the backward pass is
one scatter-add over the SAME (divided-by-R) descriptor count plus a dense
fold (the VJP of the strided table build).

Hot-op lineage: replaces the per-point `F.grid_sample` calls of the
reference (`InfoInv/models/Field.py:59-61,79-81`).
"""

from __future__ import annotations

import dataclasses
import math

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class TileSpec:
    """Static tile-table geometry for one plane.

    Attributes:
      h, w: plane spatial shape.
      q: tile-origin stride (texels).
      th, tw: tile extent (texels) per axis.
      pad_h, pad_w: anchor-to-origin back-off per axis (= ceil(span)).
      lo_h, lo_w: lowest representable tile origin (texels, negative).
      rows_h, rows_w: number of tile rows/cols in the table.
    """

    h: int
    w: int
    q: int
    th: int
    tw: int
    pad_h: int
    pad_w: int
    lo_h: int
    lo_w: int
    rows_h: int
    rows_w: int

    @property
    def row_len(self) -> int:
        return self.th * self.tw


def make_tile_spec(
    h: int, w: int, delta_h: float, delta_w: float, r: int, q: int = 2
) -> TileSpec:
    """Compute the static tile geometry.

    Args:
      h, w: plane shape.
      delta_h/delta_w: max texel movement per ray step along each plane axis
        (static: step_size_world / unit_axis).
      r: run length (samples served per descriptor).
      q: tile-origin stride; larger q -> fewer table rows but bigger tiles.
    """
    span_h = max(0, int(math.ceil((r - 1) * float(delta_h))))
    span_w = max(0, int(math.ceil((r - 1) * float(delta_w))))
    # pad = span + 1: the +1 covers the boundary clip of the stencil start
    # (s = clip(floor(u), 0, size-2) moves one texel below floor(u) at the
    # top edge). T = 2*span + q + 2 then covers [s_min, s_max + 1] for every
    # sample of the run regardless of anchor parity (derivation in module
    # docstring + test_edge_exactness).
    pad_h = span_h + 1
    pad_w = span_w + 1
    th = 2 * span_h + q + 2
    tw = 2 * span_w + q + 2
    # Anchor texel range: valid samples give a0 in [0, size-1]; invalid run
    # members can stray up to span+1 texels outside. Tile index for anchor
    # a0 is floor(a0/q) - i0; origin o = q*floor(a0/q) - pad.
    i0_h = math.floor((-span_h - 1) / q)
    i0_w = math.floor((-span_w - 1) / q)
    imax_h = math.floor((h - 1 + span_h + 1) / q)
    imax_w = math.floor((w - 1 + span_w + 1) / q)
    return TileSpec(
        h=h, w=w, q=q, th=th, tw=tw,
        pad_h=pad_h, pad_w=pad_w,
        lo_h=q * i0_h - pad_h, lo_w=q * i0_w - pad_w,
        rows_h=imax_h - i0_h + 1, rows_w=imax_w - i0_w + 1,
    )


def make_tile_table(plane: jnp.ndarray, spec: TileSpec) -> jnp.ndarray:
    """Build the (rows_h * rows_w, th * tw * C) tile table.

    Tile (i, j) holds plane texels [lo_h + q*i, lo_h + q*i + th) x
    [lo_w + q*j, ...), zero outside the plane. Built from th*tw shifted
    stride-q slices (cheap strided reads; XLA fuses the concat).
    """
    H, W, C = plane.shape
    q = spec.q
    # Padded so that index 0 corresponds to texel lo_h / lo_w and the last
    # tile fits entirely.
    pad_top = -spec.lo_h
    pad_left = -spec.lo_w
    pad_bot = (spec.lo_h + (spec.rows_h - 1) * q + spec.th) - H
    pad_right = (spec.lo_w + (spec.rows_w - 1) * q + spec.tw) - W
    padded = jnp.pad(
        plane, ((pad_top, max(0, pad_bot)), (pad_left, max(0, pad_right)), (0, 0))
    )
    slabs = []
    for dy in range(spec.th):
        row = []
        for dx in range(spec.tw):
            sub = padded[dy : dy + q * spec.rows_h : q, dx : dx + q * spec.rows_w : q]
            row.append(sub)
        slabs.append(jnp.stack(row, axis=2))  # (rows_h, rows_w, tw, C)
    tiles = jnp.stack(slabs, axis=2)  # (rows_h, rows_w, th, tw, C)
    return tiles.reshape(spec.rows_h * spec.rows_w, spec.th * spec.tw * C)


def _unnormalize(c: jnp.ndarray, size: int) -> jnp.ndarray:
    return (c + 1.0) * 0.5 * (size - 1)


def grid_sample_2d_runs(
    table: jnp.ndarray,
    spec: TileSpec,
    channels: int,
    coords: jnp.ndarray,
    r: int,
) -> jnp.ndarray:
    """Bilinear-sample runs of R consecutive samples with one gather per run.

    Semantics identical to grid_sample_2d (align_corners=True, zero padding)
    PROVIDED each length-R run along the second-to-last axis consists of
    ray-consecutive samples whose per-step texel movement satisfies the
    deltas baked into ``spec`` (the caller guarantees this by grouping).

    Args:
      table: make_tile_table output.
      spec: matching TileSpec.
      channels: C of the original plane.
      coords: (N, M, 2) sample coords in [-1, 1], x -> W axis, y -> H axis;
        M must be a multiple of r, and samples [k*r, (k+1)*r) of each row
        must be consecutive along one ray.
      r: run length.

    Returns:
      (N, M, C) interpolated features (zero outside [-1, 1]).
    """
    N, M, _ = coords.shape
    assert M % r == 0, (M, r)
    nruns = M // r
    q = spec.q
    dt = table.dtype

    x = _unnormalize(coords[..., 0], spec.w)  # (N, M)
    y = _unnormalize(coords[..., 1], spec.h)

    # Anchor = first sample of each run.
    ax = jnp.floor(x.reshape(N, nruns, r)[:, :, 0]).astype(jnp.int32)
    ay = jnp.floor(y.reshape(N, nruns, r)[:, :, 0]).astype(jnp.int32)
    # Tile row/col indices (clipped for padded/garbage runs; their samples
    # carry zero weight downstream). i0 = (lo + pad)/q by construction;
    # jnp // is floor division, correct for negative anchors.
    i0_h = (spec.lo_h + spec.pad_h) // q
    i0_w = (spec.lo_w + spec.pad_w) // q
    ti = jnp.clip(ay // q - i0_h, 0, spec.rows_h - 1)
    tj = jnp.clip(ax // q - i0_w, 0, spec.rows_w - 1)
    oy = ti * q + spec.lo_h  # tile origin in texels
    ox = tj * q + spec.lo_w

    row = ti * spec.rows_w + tj  # (N, nruns)
    tiles = jnp.take(table, row, axis=0)  # (N, nruns, th*tw*C)
    tiles = tiles.reshape(N, nruns, spec.th, spec.tw, channels)

    # Per-sample stencil: start texel + 2-tap weights (exact zero-padding
    # parity with _axis_patch_weights in grid_sample.py).
    def taps(u, size):
        u0f = jnp.floor(u)
        frac = u - u0f
        u0 = u0f.astype(jnp.int32)
        start = jnp.clip(u0, 0, size - 2)
        w0 = jnp.where(start == u0, 1.0 - frac, 0.0) + jnp.where(
            start == u0 + 1, frac, 0.0
        )
        w1 = jnp.where(start + 1 == u0, 1.0 - frac, 0.0) + jnp.where(
            start + 1 == u0 + 1, frac, 0.0
        )
        return start, w0, w1

    ys, wy0, wy1 = taps(y, spec.h)  # (N, M)
    xs, wx0, wx1 = taps(x, spec.w)

    # Stencil positions inside the tile. NOT clamped: the one-hot selection
    # below drops taps outside [0, t-1], and for genuine runs every such
    # dropped tap provably has zero bilinear weight (coverage derivation in
    # make_tile_spec); for padded/garbage runs the output is masked upstream.
    offy = ys.reshape(N, nruns, r) - oy[..., None]
    offx = xs.reshape(N, nruns, r) - ox[..., None]

    # Tap selection from the tile. The per-axis weight vector over the
    # th (resp. tw) tile positions has exactly 2 nonzeros; expressing the
    # contraction as a STATIC loop of masked multiply-adds keeps it on the
    # VPU as one fused elementwise kernel. (An einsum formulation lowers to
    # per-run batched GEMMs with dims ~(r x th x tw*C) that get padded to
    # 128-tiles on the MXU — measured 468 ms/step vs 102 ms without tiles.)
    wy0r = wy0.reshape(N, nruns, r)
    wy1r = wy1.reshape(N, nruns, r)
    wx0r = wx0.reshape(N, nruns, r)
    wx1r = wx1.reshape(N, nruns, r)

    # Row stage: (N, nruns, r, tw, C) = sum_s coeff_y(s) * tiles[:, :, s].
    tmp = None
    for s in range(spec.th):
        cy = wy0r * (offy == s) + wy1r * (offy == s - 1)
        term = cy[..., None, None].astype(dt) * tiles[:, :, None, s]
        tmp = term if tmp is None else tmp + term
    # Column stage: (N, nruns, r, C) = sum_t coeff_x(t) * tmp[..., t, :].
    out = None
    for t in range(spec.tw):
        cx = wx0r * (offx == t) + wx1r * (offx == t - 1)
        term = cx[..., None].astype(dt) * tmp[:, :, :, t]
        out = term if out is None else out + term
    return out.reshape(N, M, channels)
