"""Tri-plane fields with pluggable gauge transformations.

Covers both reference tri-plane variants:

- **InfoInv** (`InfoInv/models/Field.py`): 96-channel planes split 24
  density / 72 appearance; fixed orthogonal projection; optional InfoInv
  multiply of plane features by PE(xyz) (4 freqs density, 12 freqs rgb);
  3-layer density MLP; rgb_decoder(view_pe=2, mid=64).
- **Learned gauge** (`TriPlane/models/Field.py`): 64-channel planes split
  16/48; zero-init learnable 2-channel offset grids per plane sampled at the
  orthogonal projection and added with cross-plane coupling once
  ``iteration >= gauge_start``; Linear(48->1) density head;
  rgb_decoder(view_pe=2, mid=64).

TPU-first design decisions:
- Planes are channels-last (H, W, C); sampling gathers C contiguous lanes.
- Points are processed densely with static shapes; ragged boolean-mask
  compute from the reference becomes masked math in the renderer.
- The gauge on/off schedule (`Field.py:58`) becomes a multiplicative flag on
  the offsets so a single compiled step covers both phases (the offsets are
  zero-init, so the inactive phase is exact).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..ops.encoding import infoinv_modulate
from ..ops.grid_sample import grid_sample_2d, resize_bilinear_2d
from .decoders import (
    Params,
    apply_density_decoder,
    apply_linear,
    apply_rgb_decoder,
    init_density_decoder,
    init_linear,
    init_rgb_decoder,
)


@dataclasses.dataclass(frozen=True)
class TriPlaneConfig:
    """Static model configuration (hashable; safe to close over in jit)."""

    variant: str = "infoinv"  # 'infoinv' | 'gauge'
    plane_res: int = 256
    plane_dim: int = 96
    density_dim: int = 24
    gauge_res: int = 256
    gauge_start: int = 0
    infoinv: bool = False  # InfoInv PE multiply (the --infoinv flag)
    density_pe: int = 4  # InfoInv/models/Field.py:55
    rgb_pe: int = 12  # InfoInv/models/Field.py:75
    view_pe: int = 2
    rgb_mid: int = 64
    density_mid: int = 32
    density_shift: float = -10.0
    distance_scale: float = 25.0
    init_scale: float = 0.1
    # 'bfloat16' halves plane-gather bytes and runs decoder matmuls on the
    # MXU in bf16 (f32 accumulation); params stay f32 masters. 'float32' for
    # strict parity.
    compute_dtype: str = "float32"

    @property
    def rgb_dim(self) -> int:
        return self.plane_dim - self.density_dim

    @staticmethod
    def infoinv_preset(infoinv: bool = False) -> "TriPlaneConfig":
        """InfoInv subsystem defaults (`InfoInv/models/Field.py:14-24`)."""
        return TriPlaneConfig(
            variant="infoinv", plane_dim=96, density_dim=24, infoinv=infoinv
        )

    @staticmethod
    def gauge_preset(gauge_start: int = 0) -> "TriPlaneConfig":
        """TriPlane subsystem defaults (`TriPlane/models/Field.py:17-32`)."""
        return TriPlaneConfig(
            variant="gauge",
            plane_dim=64,
            density_dim=16,
            gauge_start=gauge_start,
            infoinv=False,
        )


def init_triplane(key: jax.Array, cfg: TriPlaneConfig) -> Params:
    """Build the parameter pytree.

    Planes ~ scale * N(0,1) as in the reference (`InfoInv/models/Field.py:16-18`);
    gauge grids zero-init (`TriPlane/models/Field.py:24-26`).
    """
    k = jax.random.split(key, 8)
    res, dim = cfg.plane_res, cfg.plane_dim
    params: Params = {
        "plane_xy": cfg.init_scale * jax.random.normal(k[0], (res, res, dim)),
        "plane_yz": cfg.init_scale * jax.random.normal(k[1], (res, res, dim)),
        "plane_xz": cfg.init_scale * jax.random.normal(k[2], (res, res, dim)),
    }
    if cfg.variant == "gauge":
        g = cfg.gauge_res
        params["gauge_xy"] = jnp.zeros((g, g, 2))
        params["gauge_yz"] = jnp.zeros((g, g, 2))
        params["gauge_xz"] = jnp.zeros((g, g, 2))
        # TriPlane/models/Field.py:29-30 — a single xavier-uniform linear.
        params["density_decoder"] = init_linear(
            k[3], cfg.density_dim * 3, 1, init="xavier_uniform", zero_bias=True
        )
    else:
        params["density_decoder"] = init_density_decoder(
            k[3], cfg.density_dim * 3, cfg.density_mid
        )
    params["rgb_decoder"] = init_rgb_decoder(
        k[4], cfg.rgb_dim * 3, view_pe=cfg.view_pe, middle_dim=cfg.rgb_mid
    )
    return params


def feature2density(feat: jnp.ndarray, density_shift: float = -10.0) -> jnp.ndarray:
    """softplus(feat + shift) (`InfoInv/models/Field.py:39-40`)."""
    return jax.nn.softplus(feat + density_shift)


def triplane_project(xyz: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Orthogonal 3D->2D projections (`InfoInv/models/Field.py:43-50`).

    Args:
      xyz: (..., 3) normalized coordinates in [-1, 1].

    Returns:
      xy, yz, xz each (..., 2) — note xz = (x, z) via the reference's ::2
      slicing.
    """
    return xyz[..., 0:2], xyz[..., 1:3], xyz[..., 0::2]


def triplane_gauge(
    params: Params,
    cfg: TriPlaneConfig,
    xy: jnp.ndarray,
    yz: jnp.ndarray,
    xz: jnp.ndarray,
    iteration: jnp.ndarray | int,
    sample_fn=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Learned gauge deformation with cross-plane coupling
    (`TriPlane/models/Field.py:53-75`).

    The iteration >= gauge_start branch becomes a multiplicative activation
    flag: offsets are exactly zero before any training anyway, and zeroing
    them reproduces the identity branch bit-for-bit.

    ``sample_fn(plane, coords, name)`` optionally overrides the gauge-grid
    lookup (the coords here are the *undeformed* orthogonal projections, so
    run-consecutive tiled sampling is always safe for them).
    """
    if cfg.variant != "gauge":
        return xy, yz, xz
    smp = (lambda p, c, name: grid_sample_2d(p, c)) if sample_fn is None else sample_fn
    active = (jnp.asarray(iteration) >= cfg.gauge_start).astype(xy.dtype)
    dxy = smp(params["gauge_xy"], xy, "gauge_xy") * active
    dyz = smp(params["gauge_yz"], yz, "gauge_yz") * active
    dxz = smp(params["gauge_xz"], xz, "gauge_xz") * active
    target_xy = jnp.stack(
        [
            xy[..., 0] + dxy[..., 0] + dxz[..., 0],
            xy[..., 1] + dxy[..., 1] + dyz[..., 0],
        ],
        axis=-1,
    )
    target_yz = jnp.stack(
        [
            yz[..., 0] + dyz[..., 0] + dxy[..., 1],
            yz[..., 1] + dyz[..., 1] + dxz[..., 1],
        ],
        axis=-1,
    )
    target_xz = jnp.stack(
        [
            xz[..., 0] + dxz[..., 0] + dxy[..., 0],
            xz[..., 1] + dxz[..., 1] + dyz[..., 1],
        ],
        axis=-1,
    )
    return target_xy, target_yz, target_xz


def _plane_feats(
    params: Params, cfg: TriPlaneConfig, xy, yz, xz, channels: slice,
    sample_fn=None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    dt = jnp.dtype(cfg.compute_dtype)
    base = (lambda p, c, name: grid_sample_2d(p, c)) if sample_fn is None else sample_fn

    def sample(plane, c, name):
        # Coords stay float32 through the sampler: a bf16 coord quantizes by
        # ~0.5 texel at 256-res planes, which breaks the duo sampler's
        # pair-consecutiveness precondition and shifts every stencil
        # (advisor finding, round 2). Only the gathered plane values (and
        # the interpolation weights, cast at the multiply inside each
        # sampler) run in the compute dtype.
        return base(plane[..., channels].astype(dt), c, name)

    fxy = sample(params["plane_xy"], xy, "plane_xy")
    fyz = sample(params["plane_yz"], yz, "plane_yz")
    fxz = sample(params["plane_xz"], xz, "plane_xz")
    return fxy, fyz, fxz


def _pe_coords(xy: jnp.ndarray, yz: jnp.ndarray) -> jnp.ndarray:
    # InfoInv/models/Field.py:54 — xyz reassembled from the projections; with
    # the identity transform this equals the normalized point.
    return jnp.concatenate([xy, yz[..., 1:]], axis=-1)


def triplane_density(
    params: Params, cfg: TriPlaneConfig, xy, yz, xz, sample_fn=None
) -> jnp.ndarray:
    """Density at projected coords (`InfoInv/models/Field.py:52-70`,
    `TriPlane/models/Field.py:77-91`).

    Returns (...,) density (post softplus-shift).
    """
    ch = slice(0, cfg.density_dim)
    fxy, fyz, fxz = _plane_feats(params, cfg, xy, yz, xz, ch, sample_fn)
    if cfg.infoinv:
        xyz = _pe_coords(xy, yz)
        fxy = infoinv_modulate(fxy, xyz, cfg.density_pe)
        fyz = infoinv_modulate(fyz, xyz, cfg.density_pe)
        fxz = infoinv_modulate(fxz, xyz, cfg.density_pe)
    feat = jnp.concatenate([fxy, fyz, fxz], axis=-1)
    if cfg.variant == "gauge":
        raw = apply_linear(_cast(params["density_decoder"], cfg), feat)[..., 0]
    else:
        raw = apply_density_decoder(_cast(params["density_decoder"], cfg), feat)[..., 0]
    return feature2density(raw.astype(jnp.float32), cfg.density_shift)


def triplane_rgb(
    params: Params, cfg: TriPlaneConfig, xy, yz, xz, viewdirs, sample_fn=None
) -> jnp.ndarray:
    """RGB at projected coords (`InfoInv/models/Field.py:72-89`,
    `TriPlane/models/Field.py:93-105`)."""
    ch = slice(cfg.density_dim, cfg.plane_dim)
    fxy, fyz, fxz = _plane_feats(params, cfg, xy, yz, xz, ch, sample_fn)
    if cfg.infoinv:
        xyz = _pe_coords(xy, yz)
        fxy = infoinv_modulate(fxy, xyz, cfg.rgb_pe)
        fyz = infoinv_modulate(fyz, xyz, cfg.rgb_pe)
        fxz = infoinv_modulate(fxz, xyz, cfg.rgb_pe)
    feat = jnp.concatenate([fxy, fyz, fxz], axis=-1)
    rgb = apply_rgb_decoder(
        _cast(params["rgb_decoder"], cfg), feat, viewdirs.astype(feat.dtype), cfg.view_pe
    )
    return rgb.astype(jnp.float32)


def triplane_density_and_rgbfeat(
    params: Params, cfg: TriPlaneConfig, xy, yz, xz, sample_fn=None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused fetch: ONE gather of all plane channels per (point, plane).

    Fetching density (0:density_dim) and appearance (density_dim:) channels
    separately costs two descriptor sets; TPU gathers are descriptor-rate
    bound, so fetching the full row once and slicing is cheaper whenever the
    appearance features of (a subset of) the same points are needed anyway —
    the renderer shades the top blend-weight samples, a subset of the
    density samples. Returns (density (...,), rgb_feat (..., 3*rgb_dim)
    already InfoInv-modulated); decode the subset with
    :func:`triplane_rgb_from_feats`.
    """
    fxy, fyz, fxz = _plane_feats(
        params, cfg, xy, yz, xz, slice(0, cfg.plane_dim), sample_fn
    )
    dd = cfg.density_dim
    dparts = [fxy[..., :dd], fyz[..., :dd], fxz[..., :dd]]
    rparts = [fxy[..., dd:], fyz[..., dd:], fxz[..., dd:]]
    if cfg.infoinv:
        xyz = _pe_coords(xy, yz)
        dparts = [infoinv_modulate(f, xyz, cfg.density_pe) for f in dparts]
        rparts = [infoinv_modulate(f, xyz, cfg.rgb_pe) for f in rparts]
    dfeat = jnp.concatenate(dparts, axis=-1)
    if cfg.variant == "gauge":
        raw = apply_linear(_cast(params["density_decoder"], cfg), dfeat)[..., 0]
    else:
        raw = apply_density_decoder(_cast(params["density_decoder"], cfg), dfeat)[..., 0]
    sigma = feature2density(raw.astype(jnp.float32), cfg.density_shift)
    return sigma, jnp.concatenate(rparts, axis=-1)


def triplane_rgb_from_feats(
    params: Params, cfg: TriPlaneConfig, feats, viewdirs
) -> jnp.ndarray:
    """Decode rgb from pre-fetched (already modulated) appearance features."""
    rgb = apply_rgb_decoder(
        _cast(params["rgb_decoder"], cfg), feats, viewdirs.astype(feats.dtype),
        cfg.view_pe,
    )
    return rgb.astype(jnp.float32)


def _cast(tree: Params, cfg: TriPlaneConfig) -> Params:
    if cfg.compute_dtype == "float32":
        return tree
    dt = jnp.dtype(cfg.compute_dtype)
    return jax.tree.map(lambda a: a.astype(dt), tree)


def density_l1(params: Params) -> jnp.ndarray:
    """L1 regularizer over all three planes (`InfoInv/models/Field.py:107-110`)."""
    return (
        jnp.mean(jnp.abs(params["plane_xy"]))
        + jnp.mean(jnp.abs(params["plane_yz"]))
        + jnp.mean(jnp.abs(params["plane_xz"]))
    )


def upsample_planes(params: Params, res: tuple[int, int, int]) -> Params:
    """Bilinear-resize planes to a new per-axis resolution
    (`TriPlane/models/Field.py:108-114`).

    res = (rx, ry, rz); plane_xy becomes (ry, rx, C), plane_yz (rz, ry, C),
    plane_xz (rz, rx, C) — H is the second projected coordinate, W the first,
    matching torch's (H, W) = (res[1], res[0]) etc.
    """
    rx, ry, rz = res
    out = dict(params)
    out["plane_xy"] = resize_bilinear_2d(params["plane_xy"], (ry, rx))
    out["plane_yz"] = resize_bilinear_2d(params["plane_yz"], (rz, ry))
    out["plane_xz"] = resize_bilinear_2d(params["plane_xz"], (rz, rx))
    return out


def shrink_planes(
    params: Params, t_l: jnp.ndarray, b_r: jnp.ndarray
) -> Params:
    """Crop planes to voxel box [t_l, b_r) (`TriPlane/models/Field.py:117-132`).

    t_l/b_r are integer voxel coords per axis (x, y, z), host-side values
    (this runs between training stages, not inside jit).
    """
    t_l = [int(v) for v in t_l]
    b_r = [int(v) for v in b_r]
    out = dict(params)
    out["plane_xy"] = params["plane_xy"][t_l[1] : b_r[1], t_l[0] : b_r[0]]
    out["plane_yz"] = params["plane_yz"][t_l[2] : b_r[2], t_l[1] : b_r[1]]
    out["plane_xz"] = params["plane_xz"][t_l[2] : b_r[2], t_l[0] : b_r[0]]
    return out
