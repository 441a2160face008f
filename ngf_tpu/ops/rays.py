"""Ray generation and point sampling along rays.

Static-shape, key-threaded JAX equivalents of:
- TensoRF-style AABB clip + stratified jittered sampling
  (`InfoInv/models/FieldBase.py:118-137`),
- NeuTex cube ray generation with jittered fixed-step segments and midpoint
  samples (`UV-Mapping/model/renderer.py:79-141`),
- hierarchical inverse-CDF sampling (`InfoInv/dataLoader/ray_utils.py:129-171`,
  `UV-Mapping/model/renderer.py:27-76`),
- NDC projection for LLFF (`InfoInv/dataLoader/ray_utils.py:90-107`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ray_aabb_tmin(
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    near: float,
    far: float,
) -> jnp.ndarray:
    """Entry distance of each ray into the AABB, clamped to [near, far].

    Mirrors `InfoInv/models/FieldBase.py:122-125` including the 1e-6
    substitution for exactly-zero direction components.

    Args:
      rays_o, rays_d: (N, 3).
      aabb: (2, 3) [min, max].

    Returns:
      (N,) t_min.
    """
    vec = jnp.where(rays_d == 0, jnp.full_like(rays_d, 1e-6), rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.max(jnp.minimum(rate_a, rate_b), axis=-1)
    return jnp.clip(t_min, near, far)


def ray_aabb_range(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, aabb: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Unclamped (t_min, t_max) slab test, as used by bbox-only ray filtering
    (`InfoInv/models/FieldBase.py:208-213`). A ray hits the box iff
    t_max > t_min."""
    vec = jnp.where(rays_d == 0, jnp.full_like(rays_d, 1e-6), rays_d)
    rate_a = (aabb[1] - rays_o) / vec
    rate_b = (aabb[0] - rays_o) / vec
    t_min = jnp.max(jnp.minimum(rate_a, rate_b), axis=-1)
    t_max = jnp.min(jnp.maximum(rate_a, rate_b), axis=-1)
    return t_min, t_max


def stratified_sample(
    key: jax.Array | None,
    rays_o: jnp.ndarray,
    rays_d: jnp.ndarray,
    aabb: jnp.ndarray,
    near: float,
    far: float,
    n_samples: int,
    step_size: float,
    is_train: bool,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Uniform fixed-step sampling from the AABB entry point.

    Mirrors `Base.sample_ray` (`InfoInv/models/FieldBase.py:118-137`): the
    sample positions are t_min + step_size * (arange(S) + u) with a single
    uniform jitter u per ray at train time (not per sample), and none at eval.

    Args:
      key: PRNG key (required when is_train).
      rays_o, rays_d: (N, 3).
      n_samples: static sample count S.
      is_train: static; controls jitter.

    Returns:
      pts (N, S, 3), z_vals (N, S), inbbox mask (N, S) — True where the point
      lies inside the AABB (the complement of the reference's mask_outbbox).
    """
    n = rays_o.shape[0]
    t_min = ray_aabb_tmin(rays_o, rays_d, aabb, near, far)
    rng = jnp.arange(n_samples, dtype=rays_o.dtype)[None, :]
    if is_train:
        rng = rng + jax.random.uniform(key, (n, 1), dtype=rays_o.dtype)
    z_vals = t_min[:, None] + step_size * rng
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    inbbox = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
    return pts, z_vals, inbbox


def cube_ray_generation(
    key: jax.Array | None,
    campos: jnp.ndarray,
    raydir: jnp.ndarray,
    point_count: int,
    domain_size: float = 1.0,
    jitter: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NeuTex cube ray generation (`UV-Mapping/model/renderer.py:79-141`).

    Slab-tests rays against the [-domain, domain]^3 cube, then marches from
    the (clamped-at-zero) entry with fixed steps dt = 2*domain/S whose lengths
    are jittered by +-jitter/2 * dt, sampling segment midpoints.

    Args:
      campos: (B, 3) camera positions.
      raydir: (B, R, 3) normalized ray directions.
      point_count: static sample count S.

    Returns:
      raypos (B, R, S, 3), segment_length (B, R, S), valid (B, R, S) bool,
      mid_ts (B, R, S).
    """
    t1 = (-domain_size - campos[:, None, :]) / raydir
    t2 = (domain_size - campos[:, None, :]) / raydir
    tmin = jnp.maximum(
        jnp.minimum(t1[..., 0], t2[..., 0]),
        jnp.maximum(jnp.minimum(t1[..., 1], t2[..., 1]), jnp.minimum(t1[..., 2], t2[..., 2])),
    )
    tmax = jnp.minimum(
        jnp.maximum(t1[..., 0], t2[..., 0]),
        jnp.minimum(jnp.maximum(t1[..., 1], t2[..., 1]), jnp.maximum(t1[..., 2], t2[..., 2])),
    )
    intersects = tmin < tmax
    t_start = jnp.clip(jnp.where(intersects, tmin, 0.0), a_min=0.0)

    dt = domain_size * 2.0 / point_count
    shape = (raydir.shape[0], raydir.shape[1], point_count)
    if jitter > 0.0:
        u = jax.random.uniform(key, shape, dtype=raydir.dtype)
        segment_length = dt + dt * jitter * (u - 0.5)
    else:
        segment_length = jnp.full(shape, dt, dtype=raydir.dtype)

    end_ts = jnp.cumsum(segment_length, axis=2)
    end_ts = jnp.concatenate([jnp.zeros_like(end_ts[..., :1]), end_ts], axis=2)
    end_ts = t_start[:, :, None] + end_ts
    mid_ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * mid_ts[..., None]
    valid = jnp.all((raypos > -domain_size) & (raypos < domain_size), axis=-1)
    return raypos, segment_length, valid, mid_ts


def cube_ray_generation_with_end(
    key: jax.Array | None,
    campos: jnp.ndarray,
    raydir: jnp.ndarray,
    end: jnp.ndarray,
    point_count: int,
    domain_size: float = 1.0,
    jitter: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Cube ray generation bounded by per-ray end points
    (`UV-Mapping/model/renderer.py:271-345`): like
    :func:`cube_ray_generation` but samples past the end surface are marked
    invalid (used for depth-supervised rendering).

    Args:
      end: (B, R, 3) end positions per ray.
    """
    raypos, segment_length, valid, mid_ts = cube_ray_generation(
        key, campos, raydir, point_count, domain_size, jitter
    )
    # Zero direction components contribute no constraint (the reference's
    # raw division would yield NaN there and invalidate the whole ray).
    ratio = jnp.where(
        jnp.abs(raydir) < 1e-12,
        jnp.inf,
        (end - campos[:, None, :]) / jnp.where(raydir == 0, 1.0, raydir),
    )
    t_end = jnp.min(ratio, axis=-1)  # (B, R)
    valid = valid & (mid_ts < t_end[:, :, None])
    return raypos, segment_length, valid, mid_ts


def refine_cube_ray_generation(
    key: jax.Array | None,
    campos: jnp.ndarray,
    raydir: jnp.ndarray,
    point_count: int,
    prev_ts: jnp.ndarray,
    prev_weights: jnp.ndarray,
    domain_size: float = 1.0,
    det: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Importance-refined cube sampling (`UV-Mapping/model/renderer.py:
    144-173` + its numpy `sample_pdf`, here in JAX): draw new segment
    endpoints from the inverse CDF of previous blend weights, then sample
    segment midpoints.

    Args:
      prev_ts: (B, R, S0) previous sample positions.
      prev_weights: (B, R, S0) previous blend weights.

    Returns:
      raypos (B, R, S), segment_length (B, R, S), valid (B, R, S), mid_ts.
    """
    # Reference preprocessing (`renderer.py:33-45`): bins = midpoints of
    # prev_ts (S0-1), weights trimmed to the interior (S0-2).
    bins = 0.5 * (prev_ts[..., 1:] + prev_ts[..., :-1])
    weights = prev_weights[..., 1:-1]
    new_ts = sample_pdf(key, bins, weights, point_count + 1, det=det)
    end_ts = jnp.sort(
        jnp.concatenate([new_ts, jax.lax.stop_gradient(prev_ts)], axis=-1), axis=-1
    )[..., : point_count + 1]
    segment_length = end_ts[..., 1:] - end_ts[..., :-1]
    mid_ts = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
    raypos = campos[:, None, None, :] + raydir[:, :, None, :] * mid_ts[..., None]
    valid = jnp.all((raypos > -domain_size) & (raypos < domain_size), axis=-1)
    return raypos, segment_length, valid, mid_ts


def sample_pdf(
    key: jax.Array | None,
    bins: jnp.ndarray,
    weights: jnp.ndarray,
    n_samples: int,
    det: bool = False,
) -> jnp.ndarray:
    """Inverse-CDF sampling along rays (hierarchical sampling).

    JAX port of `InfoInv/dataLoader/ray_utils.py:129-171` (itself the
    original NeRF helper): builds a CDF over ``bins`` from ``weights`` and
    draws ``n_samples`` by inverse transform.

    Args:
      bins: (..., B+1) bin positions (one more than weights, matching the
        reference where cdf = [0, cumsum(pdf)] is gathered with the same
        indices as bins).
      weights: (..., B) unnormalized weights.
      det: deterministic (linspace) vs uniform-random draws.

    Returns:
      (..., n_samples) sample positions.
    """
    if bins.shape[-1] != weights.shape[-1] + 1:
        raise ValueError(
            f"bins must have one more entry than weights: {bins.shape[-1]} vs {weights.shape[-1]}"
        )
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (..., B+1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=bins.dtype)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,), dtype=bins.dtype)

    inds = jax.vmap(lambda c, uu: jnp.searchsorted(c, uu, side="right"))(
        cdf.reshape(-1, cdf.shape[-1]), u.reshape(-1, n_samples)
    ).reshape(u.shape)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)


def depth2dist(z_vals: jnp.ndarray, cos_angle: jnp.ndarray) -> jnp.ndarray:
    """Depth samples -> segment lengths scaled by ray angle
    (`InfoInv/dataLoader/ray_utils.py:9-15`)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    return dists * cos_angle[..., None]


def ndc2dist(ndc_pts: jnp.ndarray, cos_angle: jnp.ndarray) -> jnp.ndarray:
    """Segment lengths in NDC space (`ray_utils.py:18-21`)."""
    dists = jnp.linalg.norm(ndc_pts[:, 1:] - ndc_pts[:, :-1], axis=-1)
    return jnp.concatenate([dists, 1e10 * cos_angle[..., None]], axis=-1)


def ndc_bbox(all_rays: jnp.ndarray) -> jnp.ndarray:
    """Bounding box of NDC rays' near and far endpoints
    (`ray_utils.py:269-275`)."""
    near = all_rays[..., :3].reshape(-1, 3)
    far = (all_rays[..., :3] + all_rays[..., 3:6]).reshape(-1, 3)
    lo = jnp.minimum(near.min(0), far.min(0))
    hi = jnp.maximum(near.max(0), far.max(0))
    return jnp.stack([lo, hi])


def find_ray_generation_method(name: str):
    """Raygen registry (`UV-Mapping/model/renderer.py:13-24`)."""
    if name == "cube":
        return cube_ray_generation
    raise RuntimeError(f"No such ray generation method: {name}")


def find_refined_ray_generation_method(name: str):
    if name == "cube":
        return refine_cube_ray_generation
    raise RuntimeError(f"No such refined ray generation method: {name}")


def ndc_rays_blender(
    h: int, w: int, focal: float, near: float, rays_o: jnp.ndarray, rays_d: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """NDC transform for forward-facing (LLFF) scenes
    (`InfoInv/dataLoader/ray_utils.py:90-107`)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (w / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (h / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (w / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (h / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
