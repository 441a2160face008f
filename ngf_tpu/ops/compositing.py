"""Alpha compositing along rays (volume rendering weights).

JAX equivalents of the two reference composite paths:
- `raw2alpha` (`InfoInv/models/FieldBase.py:12-19`): density+distance to
  per-sample weights via exclusive-cumprod transmittance, with the
  reference's exact 1e-10 stabilizer inside the cumprod.
- `ray_march` (`UV-Mapping/model/renderer.py:176-247`): NeuTex variant where
  the first feature channel is density, the rest radiance, and the
  background transmission is the full cumprod.
"""

from __future__ import annotations

import jax.numpy as jnp


def exclusive_transmittance(alpha: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Exclusive-cumprod transmittance T_i = prod_{j<i} (1 - alpha_j + 1e-10).

    Returns:
      (T, T_total) where T has the same trailing dim as alpha (T_0 = 1) and
      T_total (..., 1) is the transmittance past the final sample (the
      background weight).
    """
    t = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1),
        axis=-1,
    )
    return t[..., :-1], t[..., -1:]


def raw2alpha(
    sigma: jnp.ndarray, dist: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """TensoRF-style density -> (alpha, blend weights, background weight).

    Args:
      sigma: (..., S) density (already scaled by distance_scale upstream).
      dist: (..., S) per-sample segment lengths.

    Returns:
      alpha (..., S), weights (..., S), bg_weight (..., 1).
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    t, t_total = exclusive_transmittance(alpha)
    return alpha, alpha * t, t_total


def ray_march(
    ray_dist: jnp.ndarray,
    ray_valid: jnp.ndarray,
    ray_features: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """NeuTex ray march: features -> color + blend weights.

    `ray_features[..., 0]` is density (zeroed where invalid), channels 1:4
    are radiance (`radiance_render`, `UV-Mapping/model/renderer.py:10-11`).

    Args:
      ray_dist: (B, R, S) segment lengths.
      ray_valid: (B, R, S) validity mask (bool or {0,1}).
      ray_features: (B, R, S, F>=4).

    Returns:
      ray_color (B, R, 3), opacity (B, R, S), acc_transmission (B, R, S),
      blend_weight (B, R, S), background_blend_weight (B, R).
    """
    point_color = ray_features[..., 1:4]
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)
    acc_transmission, t_total = exclusive_transmittance(opacity)
    blend_weight = opacity * acc_transmission
    ray_color = jnp.sum(point_color * blend_weight[..., None], axis=-2)
    background_blend_weight = t_total[..., 0]
    return ray_color, opacity, acc_transmission, blend_weight, background_blend_weight


def simple_tone_map(color: jnp.ndarray, gamma: float = 2.2, exposure: float = 1.0) -> jnp.ndarray:
    """Gamma tone map (`UV-Mapping/model/renderer.py:7-8`)."""
    return jnp.clip((color * exposure + 1e-5) ** (1.0 / gamma), 0.0, 1.0)


def alpha_ray_march(
    ray_dist: jnp.ndarray, ray_valid: jnp.ndarray, ray_features: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Density-only march (`UV-Mapping/model/renderer.py:250-268`): the
    color-free variant used for opacity/transmittance queries.

    Returns (opacity, acc_transmission, blend_weight, background_blend_weight).
    """
    sigma = ray_features[..., 0] * ray_valid.astype(ray_features.dtype)
    opacity = 1.0 - jnp.exp(-sigma * ray_dist)
    acc_transmission, t_total = exclusive_transmittance(opacity)
    blend_weight = opacity * acc_transmission
    return opacity, acc_transmission, blend_weight, t_total[..., 0]
