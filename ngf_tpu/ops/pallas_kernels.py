"""Pallas TPU kernels for the hot gather path.

The tri-plane feature gather is the framework's dominant op (SURVEY.md §2.4
"hot ops"). XLA's TPU gather runs far below HBM speed (index-rate bound),
and the multi-element-slice gather variants fault on some backends, so this
module provides a Pallas kernel that keeps the feature plane VMEM-resident
and performs the bilinear gather with Mosaic's dynamic-gather, fused with
the bilinear weighting.

Layout contract: plane (H, W, C) with H*W*C*itemsize <= ~12MB (fits VMEM:
the 256x256x24 f32 density plane is 6.3MB; the 72-channel rgb plane in bf16
is 9.4MB). Larger planes fall back to the XLA path.

Status: correctness-tested in interpreter mode (tests/test_pallas_kernels.py
pins parity vs grid_sample_2d + corner/padding goldens); guarded behind
``pallas_supported()`` for compiled use because Mosaic gather support varies
by backend/jax version. Probed on the axon v5e backend (2026-08-16):
``jnp.take`` inside a kernel fails shape validation ("Shape mismatch in
input, indices and output" — Mosaic's dynamic_gather wants indices shaped
like the table), and the shape-conforming ``take_along_axis`` form dies in
the remote Mosaic compile (HTTP 500). The XLA 'blocks' formulation in
grid_sample.py is the production fast path; revisit when Mosaic gather
lands in a newer libtpu.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .grid_sample import _axis_patch_weights, _unnormalize

_BLOCK = 1024


def _bilinear_kernel(plane_ref, idx_ref, wgt_ref, out_ref):
    """One block of points: 4 VMEM row-gathers + weighted sum.

    plane_ref: (H*W, C) VMEM-resident flattened plane.
    idx_ref: (4, B) int32 flat row indices (the 4 stencil taps).
    wgt_ref: (4, B) float32 tap weights (zero-padding already folded in).
    out_ref: (B, C).
    """
    flat = plane_ref[:]
    acc = None
    for tap in range(4):
        rows = jnp.take(flat, idx_ref[tap, :], axis=0)  # (B, C)
        term = rows * wgt_ref[tap, :][:, None]
        acc = term if acc is None else acc + term
    out_ref[:] = acc


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_grid_sample_2d(
    plane: jnp.ndarray, coords: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Bilinear grid sample with torch align_corners=True / zero padding,
    computed by a Pallas kernel with the plane held in VMEM.

    Args:
      plane: (H, W, C); coords (N, 2) with N a multiple of the block size
        handled by padding internally.
    """
    H, W, C = plane.shape
    batch_shape = coords.shape[:-1]
    coords = coords.reshape(-1, 2)
    n = coords.shape[0]

    x = _unnormalize(coords[:, 0], W)
    y = _unnormalize(coords[:, 1], H)
    xs, wx0, wx1 = _axis_patch_weights(x, W)
    ys, wy0, wy1 = _axis_patch_weights(y, H)

    idx = jnp.stack(
        [
            ys * W + xs,
            ys * W + xs + 1,
            (ys + 1) * W + xs,
            (ys + 1) * W + xs + 1,
        ]
    ).astype(jnp.int32)  # (4, N)
    wgt = jnp.stack([wy0 * wx0, wy0 * wx1, wy1 * wx0, wy1 * wx1]).astype(
        jnp.float32
    )  # (4, N)

    pad = (-n) % _BLOCK
    if pad:
        idx = jnp.pad(idx, ((0, 0), (0, pad)))
        wgt = jnp.pad(wgt, ((0, 0), (0, pad)))
    n_pad = n + pad

    out = pl.pallas_call(
        _bilinear_kernel,
        grid=(n_pad // _BLOCK,),
        in_specs=[
            pl.BlockSpec((H * W, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, _BLOCK), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, C), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, C), plane.dtype),
        interpret=interpret,
    )(plane.reshape(H * W, C), idx, wgt)

    if pad:
        out = out[:n]
    return out.reshape(*batch_shape, C)


def pallas_supported() -> bool:
    """Whether the compiled Pallas gather works on the current backend.

    Probed lazily: compiles and runs the kernel on a tiny input once.
    """
    global _SUPPORTED
    if _SUPPORTED is not None:
        return _SUPPORTED
    try:
        plane = jnp.zeros((8, 8, 8), jnp.float32)
        coords = jnp.zeros((4, 2), jnp.float32)
        jax.block_until_ready(pallas_grid_sample_2d(plane, coords))
        _SUPPORTED = True
    except Exception:
        _SUPPORTED = False
    return _SUPPORTED


_SUPPORTED: bool | None = None
