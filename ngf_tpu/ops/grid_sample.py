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

import jax
import jax.numpy as jnp


def _unnormalize(c: jnp.ndarray, size: int) -> jnp.ndarray:
    # align_corners=True mapping from [-1, 1] to [0, size-1].
    return (c + 1.0) * 0.5 * (size - 1)


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
