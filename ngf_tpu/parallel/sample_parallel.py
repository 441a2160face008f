"""Sample-axis (sequence) parallelism for the volume renderer.

The reference's only scaling axes are ray chunking and sample masking
(SURVEY.md §5); the TPU-native design shards BOTH: rays over the mesh's
'data' axis (ngf_tpu/parallel/mesh.py) and samples-per-ray over a 'sample'
axis — the direct analog of sequence parallelism for a volume renderer.

The cross-shard dependency is the exclusive-cumprod transmittance
(`raw2alpha`, reference `InfoInv/models/FieldBase.py:12-19`):

    T_i = prod_{j<i} (1 - a_j + eps)
        = [prod over all samples on PREVIOUS shards] * local_exclusive_i

so each shard renders its sample slice locally, one `all_gather` over the
'sample' axis exchanges a single scalar per ray (each shard's total
transmittance factor), an exclusive product over shard index gives the
prefix, and the per-ray rgb/acc/depth partial sums reduce with one `psum`.
All collectives ride ICI within `shard_map`; everything is differentiable
(JAX transposes all_gather/psum automatically), so the same function sits
inside a `jax.grad` train step.

Kept dense-masked (no fixed-capacity compaction) — this path is for
scaling samples-per-ray beyond one chip's appetite, where compaction
capacities would be per-shard anyway.
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fields.triplane import (
    TriPlaneConfig,
    triplane_density,
    triplane_gauge,
    triplane_project,
    triplane_rgb,
)
from ..ops.rays import ray_aabb_tmin
from ..render.volume import RenderConfig, normalize_coord


def render_rays_sp(
    params: Any,
    model_cfg: TriPlaneConfig,
    rcfg: RenderConfig,
    rays: jnp.ndarray,
    key: jax.Array | None,
    mesh: Mesh,
    *,
    is_train: bool = False,
    iteration: jnp.ndarray | int = 0,
) -> dict[str, jnp.ndarray]:
    """Dense-masked render with rays sharded over 'data' and samples over
    'sample'. Numerically identical to the dense `render_rays` path.

    Args:
      rays: (N, 6), N divisible by the 'data' axis size; rcfg.n_samples
        divisible by the 'sample' axis size.
    """
    n_sample = mesh.shape["sample"]
    s_total = rcfg.n_samples
    assert s_total % n_sample == 0, (s_total, n_sample)
    s_local = s_total // n_sample
    aabb = rcfg.aabb_array

    def shard_fn(params, rays, key):
        sidx = jax.lax.axis_index("sample")
        rays_o, viewdirs = rays[:, 0:3], rays[:, 3:6]
        n = rays.shape[0]

        t_min = ray_aabb_tmin(rays_o, viewdirs, aabb, rcfg.near, rcfg.far)
        idx = sidx * s_local + jnp.arange(s_local, dtype=rays.dtype)
        jitter = 0.0
        k_bg = None
        if is_train and key is not None:
            k_jit, k_bg = jax.random.split(key)
            # one jitter per ray (FieldBase.py:129), identical on every
            # sample shard because the key is replicated.
            jitter = jax.random.uniform(k_jit, (n, 1), dtype=rays.dtype)
        z = t_min[:, None] + rcfg.step_size * (idx[None, :] + jitter)
        pts = rays_o[:, None, :] + viewdirs[:, None, :] * z[..., None]
        valid = jnp.all((pts >= aabb[0]) & (pts <= aabb[1]), axis=-1)
        # trailing-zero dist of the LAST global sample == invalid.
        valid = valid & (idx[None, :] < s_total - 1)

        xyz_n = normalize_coord(pts, aabb)
        xy, yz, xz = triplane_project(xyz_n)
        xy, yz, xz = triplane_gauge(params, model_cfg, xy, yz, xz, iteration)
        sigma = triplane_density(params, model_cfg, xy, yz, xz)
        sigma = sigma * valid.astype(sigma.dtype)

        eps = 1e-10
        alpha = 1.0 - jnp.exp(-sigma * (rcfg.step_size * rcfg.distance_scale))
        one_m = 1.0 - alpha + eps
        local_excl = jnp.cumprod(
            jnp.concatenate([jnp.ones_like(one_m[:, :1]), one_m[:, :-1]], -1), -1
        )
        local_total = local_excl[:, -1] * one_m[:, -1]  # (n,)

        totals = jax.lax.all_gather(local_total, "sample")  # (m, n)
        # exclusive product of the shards before this one
        m = totals.shape[0]
        mask = (jnp.arange(m) < sidx)[:, None].astype(totals.dtype)
        prefix = jnp.prod(totals * mask + (1.0 - mask), axis=0)  # (n,)

        weight = alpha * local_excl * prefix[:, None]
        rgb_mask = (weight > rcfg.ray_march_weight_thres).astype(weight.dtype)
        views = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
        rgb = triplane_rgb(params, model_cfg, xy, yz, xz, views)
        rgb = rgb * rgb_mask[..., None]

        rgb_map = jax.lax.psum(jnp.sum(weight[..., None] * rgb, -2), "sample")
        acc_map = jax.lax.psum(jnp.sum(weight, -1), "sample")
        depth_map = jax.lax.psum(jnp.sum(weight * z, -1), "sample")

        if rcfg.white_bg:
            rgb_map = rgb_map + (1.0 - acc_map[..., None])
        elif is_train:
            mix = (jax.random.uniform(k_bg, ()) < 0.5).astype(rgb_map.dtype)
            rgb_map = rgb_map + mix * (1.0 - acc_map[..., None])
        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)
        depth_map = jax.lax.stop_gradient(
            depth_map + (1.0 - acc_map) * rays[:, -1]
        )
        return {"rgb_map": rgb_map, "depth_map": depth_map, "acc_map": acc_map}

    fn = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P("data", None), P()),
        out_specs=P("data"),
        check_vma=False,
    )
    return fn(params, rays, key if key is not None else jax.random.PRNGKey(0))
