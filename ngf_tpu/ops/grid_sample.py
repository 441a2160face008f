"""Bilinear/trilinear grid sampling with torch `F.grid_sample` parity.

These are the hot gather ops of the whole framework (the reference calls
`F.grid_sample` 6+ times per point batch: `InfoInv/models/Field.py:59-61,
79-81`, `TriPlane/models/Field.py:59-61,79-101`, alpha-mask 3D lookup
`InfoInv/models/FieldBase.py:35`). Semantics reproduced exactly:

- ``align_corners=True``: coordinate c in [-1, 1] maps to pixel
  (c + 1)/2 * (size - 1); -1 hits the center of the first texel and +1 the
  center of the last.
- ``padding_mode='zeros'``: corner taps outside the grid contribute zero
  (their bilinear weight is masked, the index is clamped only to keep the
  gather in-bounds).
- Grid coordinate order matches torch: ``coords[..., 0]`` indexes the
  fastest-varying (width) axis, ``coords[..., 1]`` the height axis,
  ``coords[..., 2]`` the depth axis.

Layout is TPU-native channels-last: planes are (H, W, C) and volumes
(D, H, W, C), so a gather pulls C contiguous lanes per tap. The gathers are
expressed as `jnp.take` on a flattened spatial axis, which XLA lowers to a
TPU-supported dynamic-gather; the fused Pallas path lives in
`ngf_tpu/ops/pallas/` and falls back to these for correctness tests.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _unnormalize(c: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=True mapping from [-1, 1] to [0, size-1].
    return (c + 1.0) * 0.5 * (size - 1)


def _axis_patch_weights(c: jnp.ndarray, size: int):
    """Per-axis (start, w0, w1) for a clipped 2-texel patch.

    The 2x2 patch starts at clip(floor(c), 0, size-2); patch slot j holds
    texel start+j. Its weight is the bilinear weight that texel would get as
    a corner of the *unclipped* stencil, or 0 if it isn't one — reproducing
    torch's zero padding exactly while letting the whole stencil be fetched
    with one gather index.
    """
    c0f = jnp.floor(c)
    frac = c - c0f
    c0 = c0f.astype(jnp.int32)
    start = jnp.clip(c0, 0, size - 2)
    w = []
    for j in (0, 1):
        cj = start + j
        w.append(
            jnp.where(cj == c0, 1.0 - frac, 0.0) + jnp.where(cj == c0 + 1, frac, 0.0)
        )
    return start, w[0], w[1]


def _patch_gather_2d(plane: jnp.ndarray, ys: jnp.ndarray, xs: jnp.ndarray) -> jnp.ndarray:
    """Gather (2, 2, C) patches at integer starts: one descriptor per point.

    XLA TPU gathers are index-rate-bound; fetching the whole bilinear stencil
    per index is ~4x fewer descriptors than four row gathers.
    """
    H, W, C = plane.shape
    starts = jnp.stack([ys, xs], axis=-1)  # (N, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(),
        start_index_map=(0, 1),
    )
    return jax.lax.gather(
        plane,
        starts,
        dnums,
        slice_sizes=(2, 2, C),
        mode=jax.lax.GatherScatterMode.CLIP,
    )  # (N, 2, 2, C)


# Gather implementation selector. TPU gathers are descriptor-rate bound
# (~75M rows/s on v5e regardless of row bytes), so the implementations trade
# descriptor count against memory/simplicity:
#   'blocks' — parity-shifted 2x2-block tables: ONE plain row-gather per
#              point (see make_block_table). 4x plane memory. Default: it is
#              4x fewer descriptors than 'rows' and uses only jnp.take
#              (measured 4.2x step speedup on v5e).
#   'rows'   — four plain row gathers; the conservative fallback.
#   'patch'/'pairs' — multi-element-slice lax.gather variants; fastest in
#              theory but hit compiler/runtime faults on the axon TPU
#              backend (worker crash / compile hang); fine on CPU.
_GATHER_IMPL = os.environ.get("NGF_GATHER_IMPL", "blocks")


def set_gather_impl(name: str) -> None:
    global _GATHER_IMPL
    if name not in ("patch", "rows", "pairs", "blocks"):
        raise ValueError(f"unknown gather impl {name!r}")
    _GATHER_IMPL = name


def _grid_sample_2d_pairs(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Two (2, C) slice-gathers from the flattened (H*W, C) table: texels
    (x, y) and (x+1, y) are adjacent rows, so each y-row of the bilinear
    stencil is one descriptor."""
    H, W, C = plane.shape
    flat = plane.reshape(H * W, C)
    batch_shape = coords.shape[:-1]
    coords = coords.reshape(-1, 2)

    x = _unnormalize(coords[:, 0], W)
    y = _unnormalize(coords[:, 1], H)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)

    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(), start_index_map=(0,)
    )

    def row_pair(row):
        starts = (row * W + xs)[:, None]
        return jax.lax.gather(
            flat, starts, dnums, slice_sizes=(2, C),
            mode=jax.lax.GatherScatterMode.CLIP,
        )  # (N, 2, C)

    p0 = row_pair(ys)
    p1 = row_pair(ys + 1)
    wx0 = wx0[:, None].astype(plane.dtype)
    wx1 = wx1[:, None].astype(plane.dtype)
    out = (
        wy0[:, None].astype(plane.dtype) * (wx0 * p0[:, 0] + wx1 * p0[:, 1])
        + wy1[:, None].astype(plane.dtype) * (wx0 * p1[:, 0] + wx1 * p1[:, 1])
    )
    return out.reshape(*batch_shape, C)


def _grid_sample_2d_rows(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    H, W, C = plane.shape
    flat = plane.reshape(H * W, C)
    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    out = None
    for dx, dy, w in (
        (0, 0, (1.0 - wx1) * (1.0 - wy1)),
        (1, 0, wx1 * (1.0 - wy1)),
        (0, 1, (1.0 - wx1) * wy1),
        (1, 1, wx1 * wy1),
    ):
        xi = x0 + dx
        yi = y0 + dy
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        idx = jnp.clip(yi, 0, H - 1) * W + jnp.clip(xi, 0, W - 1)
        tap = jnp.take(flat, idx, axis=0) * (w * inb.astype(w.dtype))[..., None]
        out = tap if out is None else out + tap
    return out


def make_block_table(plane: jnp.ndarray) -> jnp.ndarray:
    """Shifted 2x2-block tables: every bilinear stencil as ONE table row.

    TPU gathers are descriptor-rate bound; fetching the 4 stencil texels with
    one plain row-gather needs them contiguous. Trick: build 4 shifted copies
    of the plane, blocked 2x2 — copy (p, q) holds blocks starting at odd/even
    (y, x) parities — so the stencil starting at any (ys, xs) lives intact in
    copy (ys&1, xs&1) at block (ys>>1, xs>>1). 4x plane memory, 4x fewer
    gather descriptors, all ops plain slicing/reshape/take (differentiable;
    the backward is one scatter-add into the big table + a dense fold).

    Returns (4 * Hb * Wb, 4C) with Hb=(H+1)//2, Wb=(W+1)//2; row layout
    [y-in-block, x-in-block, C] flattened.
    """
    H, W, C = plane.shape
    hb, wb = (H + 1) // 2, (W + 1) // 2
    padded = jnp.pad(plane, ((0, 2), (0, 2), (0, 0)))
    tables = []
    for p in (0, 1):
        for q in (0, 1):
            sub = padded[p : p + 2 * hb, q : q + 2 * wb]
            blk = sub.reshape(hb, 2, wb, 2, C).transpose(0, 2, 1, 3, 4)
            tables.append(blk.reshape(hb * wb, 4 * C))
    return jnp.concatenate(tables, axis=0)


# NOTE (measured 2026-08-16): a custom_vjp variant of the block-row sample
# that pins exactly one gather fwd + one scatter bwd benched identical to
# this plain formulation (125 ms/step either way) — XLA already emits the
# minimal gather/scatter pair, so the simpler autodiff version stays.
def _grid_sample_2d_blocks(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    H, W, C = plane.shape
    hb, wb = (H + 1) // 2, (W + 1) // 2
    table = make_block_table(plane)
    batch_shape = coords.shape[:-1]
    coords = coords.reshape(-1, 2)

    x = _unnormalize(coords[:, 0], W)
    y = _unnormalize(coords[:, 1], H)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)

    table_id = (ys & 1) * 2 + (xs & 1)
    row = table_id * (hb * wb) + (ys >> 1) * wb + (xs >> 1)
    patch = jnp.take(table, row, axis=0).reshape(-1, 4, C)
    wgt = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1)
    out = jnp.sum(patch * wgt[..., None].astype(patch.dtype), axis=1)
    return out.reshape(*batch_shape, C)


def grid_sample_2d(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample of a (H, W, C) plane at (..., 2) coords in [-1, 1].

    Equivalent to ``F.grid_sample(plane[None].permute(0,3,1,2),
    coords.view(1,-1,1,2), align_corners=True)`` in the reference.

    Args:
      plane: (H, W, C) feature plane.
      coords: (..., 2) with coords[..., 0] -> W axis, coords[..., 1] -> H axis.

    Returns:
      (..., C) interpolated features; zero outside [-1, 1].
    """
    if _GATHER_IMPL == "rows":
        return _grid_sample_2d_rows(plane, coords)
    if _GATHER_IMPL == "pairs":
        return _grid_sample_2d_pairs(plane, coords)
    if _GATHER_IMPL == "blocks":
        return _grid_sample_2d_blocks(plane, coords)

    H, W, C = plane.shape
    batch_shape = coords.shape[:-1]
    coords = coords.reshape(-1, 2)

    x = _unnormalize(coords[:, 0], W)
    y = _unnormalize(coords[:, 1], H)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)

    patch = _patch_gather_2d(plane, ys, xs)  # (N, 2, 2, C)
    wgt = jnp.stack(
        [wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1], axis=-1
    ).astype(plane.dtype)  # (N, 4)
    out = jnp.einsum(
        "npc,np->nc", patch.reshape(-1, 4, C), wgt,
        preferred_element_type=jnp.float32,
    ).astype(plane.dtype)
    return out.reshape(*batch_shape, C)


def make_duo_table(plane: jnp.ndarray) -> jnp.ndarray:
    """Overlapping 4x4 tiles at stride-2 origins: ONE table row contains the
    bilinear stencils of any TWO samples whose stencil starts differ by at
    most 1 texel per axis.

    Coverage: for a pair with per-axis stencil starts s_a, s_b
    (|s_a - s_b| <= 1), the union of taps is the 3-texel window
    [s_min, s_min + 2]. With the even origin o = s_min & ~1 we have
    s_min - o in {0, 1}, so the window sits inside [o, o + 3] — a 4x4 tile
    anchored at even coordinates always covers both stencils. The start
    difference bound holds whenever consecutive samples move <= 1 texel per
    step, which the trainer guarantees structurally: the plane resolution
    tracks the voxel grid and step_size = step_ratio voxels with
    step_ratio <= 1 (`ngf_tpu/train/loop.py:117-119`, matching
    `InfoInv/main.py:218`).

    Same 4x memory as :func:`make_block_table` (one overlapping-tile copy
    instead of four parity copies), but HALF the gather/scatter descriptors
    of the render step: one row serves two consecutive samples.

    Returns (hb * wb, 16 * C) with hb = (H + 1) // 2, wb = (W + 1) // 2;
    row (i, j) holds texels [2i, 2i + 3] x [2j, 2j + 3], zero-padded.
    """
    H, W, C = plane.shape
    hb, wb = (H + 1) // 2, (W + 1) // 2
    padded = jnp.pad(
        plane, ((0, 2 * hb + 2 - H), (0, 2 * wb + 2 - W), (0, 0))
    )
    slabs = []
    for dy in range(4):
        row = []
        for dx in range(4):
            row.append(padded[dy : dy + 2 * hb : 2, dx : dx + 2 * wb : 2])
        slabs.append(jnp.stack(row, axis=2))  # (hb, wb, 4, C)
    tiles = jnp.stack(slabs, axis=2)  # (hb, wb, 4, 4, C)
    return tiles.reshape(hb * wb, 16 * C)


def grid_sample_2d_duo(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with one gather per PAIR of consecutive samples.

    Semantics identical to :func:`grid_sample_2d` (align_corners=True, zero
    padding) PROVIDED samples (2k, 2k+1) along the last sample axis are
    ray-consecutive with <= 1 texel movement per axis per step (see
    :func:`make_duo_table`). Pairs violating the bound get the offending
    taps zeroed (they would be garbage reads otherwise); the structural
    guarantee makes that path unreachable in the shipped configs.

    Args:
      plane: (H, W, C).
      coords: (..., M, 2) with M even; x -> W axis, y -> H axis.
    """
    H, W, C = plane.shape
    hb, wb = (H + 1) // 2, (W + 1) // 2
    table = make_duo_table(plane)
    batch_shape = coords.shape[:-2]
    M = coords.shape[-2]
    assert M % 2 == 0, M
    P = M // 2
    coords = coords.reshape(-1, M, 2)
    N = coords.shape[0]
    dt = plane.dtype

    # Index/weight math in f32 regardless of compute dtype: bf16 coord
    # rounding (~0.5 texel at 256-res planes) could push a pair's stencil
    # starts > 1 texel apart, and the 4x4 tile has no slack for that.
    coords = coords.astype(jnp.float32)
    x = _unnormalize(coords[..., 0], W)  # (N, M)
    y = _unnormalize(coords[..., 1], H)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)

    # pair-min stencil start -> even tile origin
    ox = jnp.min(xs.reshape(N, P, 2), -1) & ~1  # (N, P)
    oy = jnp.min(ys.reshape(N, P, 2), -1) & ~1
    row = (oy >> 1) * wb + (ox >> 1)
    tile = jnp.take(table, row, axis=0).reshape(N, P, 4, 4, C)

    # per-sample tap offsets inside the tile, in {0, 1, 2} for honest pairs
    offy = ys - jnp.repeat(oy, 2, axis=-1)
    offx = xs - jnp.repeat(ox, 2, axis=-1)

    # Static masked multiply-add chain (stays on the VPU; an einsum over the
    # 16 tile texels lowers to padded per-pair GEMMs, the measured tile
    # regression — see ops/tiled_sample.py note).
    tmp = None
    for dy in range(4):
        cy = (wy0 * (offy == dy) + wy1 * (offy == dy - 1)).reshape(N, P, 2)
        term = cy[..., None, None].astype(dt) * tile[:, :, None, dy]
        tmp = term if tmp is None else tmp + term  # (N, P, 2, 4, C)
    out = None
    for dx in range(4):
        cx = (wx0 * (offx == dx) + wx1 * (offx == dx - 1)).reshape(N, P, 2)
        term = cx[..., None].astype(dt) * tmp[:, :, :, dx]
        out = term if out is None else out + term  # (N, P, 2, C)
    return out.reshape(*batch_shape, M, C)


def _axis_weight_grads(c: jnp.ndarray, size: int):
    """d(w0)/dc, d(w1)/dc for the clipped 2-texel patch weights of
    :func:`_axis_patch_weights` (piecewise-linear; derivative a.e.)."""
    c0 = jnp.floor(c).astype(jnp.int32)
    start = jnp.clip(c0, 0, size - 2)
    dw0 = -(start == c0).astype(jnp.float32) + (start == c0 + 1).astype(jnp.float32)
    dw1 = -(start + 1 == c0).astype(jnp.float32) + (start + 1 == c0 + 1).astype(
        jnp.float32
    )
    return dw0, dw1


from functools import partial as _partial


@_partial(jax.custom_vjp, nondiff_argnums=(2,))
def _blocks_duobwd_impl(plane, coords, coord_grads: bool):
    return _grid_sample_2d_blocks(plane, coords)


def grid_sample_2d_blocks_duobwd(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Blocks-forward / duo-backward bilinear sampling.

    Forward: EXACTLY :func:`grid_sample_2d` via the blocks gather (one
    descriptor per sample, small 4C rows — the measured-fastest forward).
    Backward: the plane-gradient scatter uses overlapping 4x4 stride-2 duo
    rows — ONE scatter descriptor per PAIR of consecutive samples — then a
    dense fold back to the plane (the transpose of :func:`make_duo_table`,
    all static slices). TPU scatters trade descriptor count against row
    bytes at ~2/3 efficiency (NOTES.md round-3 probes), so the pair rows
    cut ~1/3 of the dominant backward cost without touching the forward.

    Precondition (same as :func:`grid_sample_2d_duo`, guaranteed by the
    trainer's sampling geometry): coords[..., 2k, :] and coords[..., 2k+1, :]
    are ray-consecutive samples moving <= 1 texel per axis per step, and the
    sample axis length is even. Violating pairs would get their gradient
    taps dropped (the forward stays exact).

    Args:
      plane: (H, W, C).
      coords: (..., M, 2) with M even; x -> W axis, y -> H axis, [-1, 1].
    """
    return _blocks_duobwd_impl(plane, coords, True)


def grid_sample_2d_blocks_duobwd_nocoord(
    plane: jnp.ndarray, coords: jnp.ndarray
) -> jnp.ndarray:
    """:func:`grid_sample_2d_blocks_duobwd` with the coordinate-gradient
    branch statically removed (coords cotangent = 0).

    Use ONLY where the sample coordinates are not a function of any
    differentiated parameter — true at every shipped duo_bwd call site: the
    tri-plane lookups' coords are ray projections (InfoInv) and the
    gauge-GRID lookups' coords are the undeformed projections (gauge
    variant; the deformed-coord plane lookups there use plain autodiff).
    Dropping the branch statically removes a full-size patch re-gather +
    contraction from the backward instead of trusting XLA DCE to do it.
    """
    return _blocks_duobwd_impl(plane, coords, False)


def _duobwd_fwd(plane, coords, coord_grads):
    out = _grid_sample_2d_blocks(plane, coords)
    return out, (plane, coords)


def _duobwd_bwd(coord_grads, res, g):
    plane, coords = res
    H, W, C = plane.shape
    hb, wb = (H + 1) // 2, (W + 1) // 2
    M = coords.shape[-2]
    c32 = coords.reshape(-1, M, 2).astype(jnp.float32)
    N = c32.shape[0]
    x = _unnormalize(c32[..., 0], W)  # (N, M)
    y = _unnormalize(c32[..., 1], H)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)
    g = g.reshape(N, M, C)

    if coord_grads:
        # ---- coordinate gradients: need the forward patch; ONE re-gather
        # of the block rows (same descriptor count as the forward). The
        # _nocoord variant removes this statically — do not rely on XLA DCE.
        table = make_block_table(plane)
        table_id = (ys & 1) * 2 + (xs & 1)
        row4 = table_id * (hb * wb) + (ys >> 1) * wb + (xs >> 1)
        patch = jnp.take(table, row4, axis=0).reshape(N, M, 4, C).astype(jnp.float32)
        t = jnp.einsum("nmjc,nmc->nmj", patch, g.astype(jnp.float32))  # (N, M, 4)
        dwx0, dwx1 = _axis_weight_grads(x, W)
        dwy0, dwy1 = _axis_weight_grads(y, H)
        gx = (
            t[..., 0] * wy0 * dwx0 + t[..., 1] * wy0 * dwx1
            + t[..., 2] * wy1 * dwx0 + t[..., 3] * wy1 * dwx1
        ) * (0.5 * (W - 1))
        gy = (
            t[..., 0] * dwy0 * wx0 + t[..., 1] * dwy0 * wx1
            + t[..., 2] * dwy1 * wx0 + t[..., 3] * dwy1 * wx1
        ) * (0.5 * (H - 1))
        coords_cot = jnp.stack([gx, gy], axis=-1).reshape(coords.shape).astype(
            coords.dtype
        )
    else:
        coords_cot = jnp.zeros_like(coords)

    # ---- plane gradient via duo rows: one descriptor per sample PAIR.
    P = M // 2
    oy = jnp.min(ys.reshape(N, P, 2), -1) & ~1  # (N, P) even tile origins
    ox = jnp.min(xs.reshape(N, P, 2), -1) & ~1
    offy = ys.reshape(N, P, 2) - oy[..., None]  # in {0, 1, 2} for honest pairs
    offx = xs.reshape(N, P, 2) - ox[..., None]

    a4 = jnp.arange(4)
    # ty[n,p,s,a] = wy0*(offy==a) + wy1*(offy==a-1); taps falling outside
    # the 4x4 tile (violating pairs only) drop out of both one-hots.
    wy0p = wy0.reshape(N, P, 2)
    wy1p = wy1.reshape(N, P, 2)
    wx0p = wx0.reshape(N, P, 2)
    wx1p = wx1.reshape(N, P, 2)
    ty = (
        wy0p[..., None] * (offy[..., None] == a4)
        + wy1p[..., None] * (offy[..., None] == a4 - 1)
    )  # (N, P, 2, 4)
    tx = (
        wx0p[..., None] * (offx[..., None] == a4)
        + wx1p[..., None] * (offx[..., None] == a4 - 1)
    )
    # Accumulate in the plane's own dtype — identical precision behavior to
    # the autodiff scatter this replaces (the bf16 compute copy's cotangent
    # is scattered in bf16 there too), and half the scatter bytes under bf16.
    dt = plane.dtype
    tyc = ty.astype(dt)
    txc = tx.astype(dt)
    gp = g.reshape(N, P, 2, C).astype(dt)
    tile_cot = (
        tyc[:, :, 0, :, None, None] * txc[:, :, 0, None, :, None] * gp[:, :, 0, None, None, :]
        + tyc[:, :, 1, :, None, None] * txc[:, :, 1, None, :, None] * gp[:, :, 1, None, None, :]
    )  # (N, P, 4, 4, C)

    row = ((oy >> 1) * wb + (ox >> 1)).reshape(-1)  # (N*P,)
    duo_cot = jnp.zeros((hb * wb, 16 * C), dt).at[row].add(
        tile_cot.reshape(N * P, 16 * C)
    )
    # Dense fold duo-table cotangent -> plane cotangent: the linear
    # transpose of make_duo_table (static slices only, no scatter).
    _, fold = jax.vjp(make_duo_table, jnp.zeros((H, W, C), dt))
    plane_cot = fold(duo_cot)[0].astype(plane.dtype)
    return plane_cot, coords_cot


_blocks_duobwd_impl.defvjp(_duobwd_fwd, _duobwd_bwd)


def make_block_table_3d(volume: jnp.ndarray) -> jnp.ndarray:
    """3D analogue of :func:`make_block_table`: 8 parity-shifted copies of
    the volume in 2x2x2 blocks, so a trilinear stencil is one table row.

    Returns (8 * Db * Hb * Wb, 8C).
    """
    D, H, W, C = volume.shape
    db, hb, wb = (D + 1) // 2, (H + 1) // 2, (W + 1) // 2
    padded = jnp.pad(volume, ((0, 2), (0, 2), (0, 2), (0, 0)))
    tables = []
    for r in (0, 1):
        for p in (0, 1):
            for q in (0, 1):
                sub = padded[r : r + 2 * db, p : p + 2 * hb, q : q + 2 * wb]
                blk = sub.reshape(db, 2, hb, 2, wb, 2, C).transpose(0, 2, 4, 1, 3, 5, 6)
                tables.append(blk.reshape(db * hb * wb, 8 * C))
    return jnp.concatenate(tables, axis=0)


def grid_sample_3d_blocks(
    table: jnp.ndarray, shape: tuple[int, int, int, int], coords: jnp.ndarray
) -> jnp.ndarray:
    """Trilinear sample using a prebuilt 3D block table (1 gather/point).

    Args:
      table: output of :func:`make_block_table_3d`.
      shape: the original (D, H, W, C).
      coords: (..., 3) torch-order (x->W, y->H, z->D) in [-1, 1].
    """
    D, H, W, C = shape
    db, hb, wb = (D + 1) // 2, (H + 1) // 2, (W + 1) // 2
    batch_shape = coords.shape[:-1]
    coords = coords.reshape(-1, 3)

    x = _unnormalize(coords[:, 0], W)
    y = _unnormalize(coords[:, 1], H)
    z = _unnormalize(coords[:, 2], D)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)
    zs, wz0, wz1 = _axis_patch_weights(z, D)

    table_id = (zs & 1) * 4 + (ys & 1) * 2 + (xs & 1)
    row = table_id * (db * hb * wb) + (zs >> 1) * (hb * wb) + (ys >> 1) * wb + (xs >> 1)
    patch = jnp.take(table, row, axis=0).reshape(-1, 8, C)
    wz = jnp.stack([wz0, wz1], -1)
    wy = jnp.stack([wy0, wy1], -1)
    wx = jnp.stack([wx0, wx1], -1)
    wgt = (wz[:, :, None, None] * wy[:, None, :, None] * wx[:, None, None, :]).reshape(-1, 8)
    out = jnp.sum(patch * wgt[..., None].astype(patch.dtype), axis=1)
    return out.reshape(*batch_shape, C)


def grid_sample_3d(volume: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Trilinear sample of a (D, H, W, C) volume at (..., 3) coords in [-1, 1].

    Matches torch 5D grid_sample with align_corners=True / zero padding
    (the alpha-mask lookup, `InfoInv/models/FieldBase.py:33-37`):
    coords[..., 0] -> W, coords[..., 1] -> H, coords[..., 2] -> D.

    Args:
      volume: (D, H, W, C).
      coords: (..., 3).

    Returns:
      (..., C).
    """
    # Conservative 8-tap row-gather formulation: multi-element-slice
    # lax.gather intermediates get lane-padded to (2,128) tiles on TPU (a
    # (N,2,2,2,1) patch inflates 128x and OOMs); the fast path for repeated
    # lookups is make_block_table_3d + grid_sample_3d_blocks instead.
    D, H, W, C = volume.shape
    flat = volume.reshape(D * H * W, C)

    x = _unnormalize(coords[..., 0], W)
    y = _unnormalize(coords[..., 1], H)
    z = _unnormalize(coords[..., 2], D)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    z0 = jnp.floor(z).astype(jnp.int32)
    wx1 = x - jnp.floor(x)
    wy1 = y - jnp.floor(y)
    wz1 = z - jnp.floor(z)

    out = None
    for dz in (0, 1):
        wz = wz1 if dz else (1.0 - wz1)
        zi = z0 + dz
        for dy in (0, 1):
            wy = wy1 if dy else (1.0 - wy1)
            yi = y0 + dy
            for dx in (0, 1):
                wx = wx1 if dx else (1.0 - wx1)
                xi = x0 + dx
                inb = (
                    (xi >= 0) & (xi <= W - 1)
                    & (yi >= 0) & (yi <= H - 1)
                    & (zi >= 0) & (zi <= D - 1)
                )
                idx = (
                    jnp.clip(zi, 0, D - 1) * (H * W)
                    + jnp.clip(yi, 0, H - 1) * W
                    + jnp.clip(xi, 0, W - 1)
                )
                w = wx * wy * wz * inb.astype(wx.dtype)
                tap = jnp.take(flat, idx, axis=0) * w[..., None]
                out = tap if out is None else out + tap
    return out


def grid_sample_2d_border(plane: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sample with ``align_corners=False`` + border padding.

    The texture-sampling variant used for edited-texture lookup
    (`UV-Mapping/util.py:228-236,280-281`): coordinate c maps to pixel
    ((c + 1) * size - 1) / 2 and out-of-range taps clamp to the border.

    Args:
      plane: (H, W, C); coords: (..., 2), x -> W, y -> H.
    """
    H, W, C = plane.shape
    flat = plane.reshape(H * W, C)
    x = ((coords[..., 0] + 1.0) * W - 1.0) * 0.5
    y = ((coords[..., 1] + 1.0) * H - 1.0) * 0.5
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    wx1 = x - x0f
    wy1 = y - y0f
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)

    out = None
    for dx, dy, w in (
        (0, 0, (1.0 - wx1) * (1.0 - wy1)),
        (1, 0, wx1 * (1.0 - wy1)),
        (0, 1, (1.0 - wx1) * wy1),
        (1, 1, wx1 * wy1),
    ):
        xi = jnp.clip(x0 + dx, 0, W - 1)
        yi = jnp.clip(y0 + dy, 0, H - 1)
        tap = jnp.take(flat, yi * W + xi, axis=0) * w[..., None]
        out = tap if out is None else out + tap
    return out


def resize_bilinear_2d(plane: jnp.ndarray, new_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of (H, W, C) with align_corners=True semantics.

    Equivalent to ``F.interpolate(..., mode='bilinear', align_corners=True)``
    used for tri-plane grid upsampling (`TriPlane/models/Field.py:110-112`).
    Separable: resize H then W with 1D index-space interpolation.
    """
    H, W, _ = plane.shape
    new_h, new_w = new_hw

    def axis_weights(n_in: int, n_out: int):
        if n_out == 1:
            pos = jnp.zeros((1,), dtype=plane.dtype)
        else:
            pos = jnp.arange(n_out, dtype=plane.dtype) * ((n_in - 1) / (n_out - 1))
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in - 1)
        i1 = jnp.clip(i0 + 1, 0, n_in - 1)
        w1 = pos - i0.astype(plane.dtype)
        return i0, i1, w1

    i0, i1, w1 = axis_weights(H, new_h)
    plane = plane[i0] * (1.0 - w1)[:, None, None] + plane[i1] * w1[:, None, None]
    j0, j1, v1 = axis_weights(W, new_w)
    plane = plane[:, j0] * (1.0 - v1)[None, :, None] + plane[:, j1] * v1[None, :, None]
    return plane


def max_pool_3d(volume: jnp.ndarray, kernel: int = 3) -> jnp.ndarray:
    """3D max pool, stride 1, 'same' padding of kernel//2.

    Matches `F.max_pool3d(alpha, kernel_size=3, padding=1, stride=1)` used to
    dilate the occupancy grid (`InfoInv/models/FieldBase.py:188`).

    Args:
      volume: (D, H, W).
    """
    pad = kernel // 2
    return jax.lax.reduce_window(
        volume,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(kernel, kernel, kernel),
        window_strides=(1, 1, 1),
        padding=[(pad, pad)] * 3,
    )
