"""Round-2 grouped/tiled render formulation: parity with the round-1 path.

The grouped renderer (`ngf_tpu/render/volume.py:_render_rays_grouped`) and
its building blocks (tiled run gathers, cumsum compaction) are descriptor-
count optimizations that must not change the rendered values. These tests
pin them against the dense/blocks implementations, which are themselves
torch-oracle-verified in test_forward_parity.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngf_tpu.fields import TriPlaneConfig, init_triplane
from ngf_tpu.ops.compaction import gather_groups, group_compact_indices
from ngf_tpu.ops.grid_sample import grid_sample_2d
from ngf_tpu.ops.tiled_sample import (
    grid_sample_2d_runs,
    make_tile_spec,
    make_tile_table,
)
from ngf_tpu.render import RenderConfig, render_rays


def _run_coords(key, n, nruns, r, delta_h, delta_w, lo=-1.3, hi=1.3):
    """Synthetic run-structured coords: each run starts anywhere (including
    out of bounds) and moves by at most (delta_w, delta_h) texel-equivalents
    per step in a fixed direction, mimicking ray marching."""
    k1, k2 = jax.random.split(key)
    start = jax.random.uniform(k1, (n, nruns, 1, 2), minval=lo, maxval=hi)
    step = jax.random.uniform(k2, (n, nruns, 1, 2), minval=-1.0, maxval=1.0)
    # scale: delta (texels) -> normalized coords is 2*delta/(size-1); the
    # caller passes the normalized-step equivalent directly.
    step = step * jnp.asarray([delta_w, delta_h])
    idx = jnp.arange(r, dtype=jnp.float32)[None, None, :, None]
    return (start + idx * step).reshape(n, nruns * r, 2)


class TestTiledSample:
    @pytest.mark.parametrize("r,q", [(1, 2), (2, 2), (4, 2), (4, 4), (8, 2)])
    def test_matches_grid_sample_2d(self, r, q):
        H, W, C = 37, 53, 6
        key = jax.random.PRNGKey(0)
        plane = jax.random.normal(key, (H, W, C))
        # texel deltas per step
        dh, dw = 0.6, 0.45
        spec = make_tile_spec(H, W, dh, dw, r, q)
        table = make_tile_table(plane, spec)
        coords = _run_coords(
            jax.random.PRNGKey(1), 16, 9, r,
            delta_h=2 * dh / (H - 1),  # y step in normalized units
            delta_w=2 * dw / (W - 1),  # x step in normalized units
        )
        out = grid_sample_2d_runs(table, spec, C, coords, r)
        ref = grid_sample_2d(plane, coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_match(self):
        H, W, C = 33, 33, 4
        r, q = 4, 2
        dh = dw = 0.55
        plane = jax.random.normal(jax.random.PRNGKey(2), (H, W, C))
        coords = _run_coords(
            jax.random.PRNGKey(3), 8, 6, r,
            delta_h=2 * dh / (H - 1), delta_w=2 * dw / (W - 1),
        )

        def loss_tiled(p):
            spec = make_tile_spec(H, W, dh, dw, r, q)
            t = make_tile_table(p, spec)
            o = grid_sample_2d_runs(t, spec, C, coords, r)
            return jnp.sum(jnp.sin(o) * o)

        def loss_ref(p):
            return jnp.sum(jnp.sin(grid_sample_2d(p, coords)) * grid_sample_2d(p, coords))

        g1 = jax.grad(loss_tiled)(plane)
        g2 = jax.grad(loss_ref)(plane)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-4)

    def test_edge_exactness(self):
        """Coords exactly at -1/+1 and just outside (zero padding)."""
        H, W, C = 9, 9, 2
        plane = jax.random.normal(jax.random.PRNGKey(4), (H, W, C))
        r, q = 2, 2
        spec = make_tile_spec(H, W, 0.5, 0.5, r, q)
        table = make_tile_table(plane, spec)
        coords = jnp.asarray(
            [[[-1.0, -1.0], [-1.0 + 0.01, -1.0]],
             [[1.0, 1.0], [1.0, 1.0 - 0.01]],
             [[-1.05, 0.0], [-1.0, 0.0]],
             [[1.0, 1.05], [1.0, 1.0]]],
        )  # (4, 2, 2) -> runs of 2
        out = grid_sample_2d_runs(table, spec, C, coords, r)
        ref = grid_sample_2d(plane, coords)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


class TestGroupCompaction:
    def test_indices_match_numpy(self):
        rng = np.random.default_rng(0)
        gvalid = rng.random((32, 17)) < 0.4
        capg = 6
        idx, got = group_compact_indices(jnp.asarray(gvalid), capg)
        idx, got = np.asarray(idx), np.asarray(got)
        for n in range(32):
            ref = np.nonzero(gvalid[n])[0][:capg]
            assert (idx[n, : len(ref)] == ref).all()
            assert got[n, : len(ref)].all()
            assert not got[n, len(ref) :].any()

    def test_gather_groups(self):
        x = jnp.arange(2 * 12 * 3, dtype=jnp.float32).reshape(2, 12, 3)
        idx = jnp.asarray([[0, 2], [1, 1]], dtype=jnp.int32)
        out = np.asarray(gather_groups(x, idx, 4))
        ref0 = np.concatenate([np.asarray(x)[0, 0:4], np.asarray(x)[0, 8:12]])
        np.testing.assert_array_equal(out[0], ref0)
        np.testing.assert_array_equal(out[1][:4], np.asarray(x)[1, 4:8])


def _setup_scene(variant="infoinv", infoinv=True, res=48):
    if variant == "gauge":
        cfg = TriPlaneConfig.gauge_preset(gauge_start=0)
    else:
        cfg = TriPlaneConfig.infoinv_preset(infoinv=infoinv)
    cfg = TriPlaneConfig(**{**cfg.__dict__, "plane_res": res, "gauge_res": res})
    params = init_triplane(jax.random.PRNGKey(0), cfg)
    rays_o = jnp.tile(jnp.asarray([[0.0, 0.0, -4.0]]), (64, 1))
    d = jax.random.normal(jax.random.PRNGKey(5), (64, 3)) * 0.2 + jnp.asarray(
        [0.0, 0.0, 1.0]
    )
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate([rays_o, d], axis=-1)
    return cfg, params, rays


class TestGroupedRenderer:
    @pytest.mark.parametrize("variant,infoinv", [
        ("infoinv", True), ("infoinv", False), ("gauge", False),
    ])
    def test_matches_dense_no_caps(self, variant, infoinv):
        cfg, params, rays = _setup_scene(variant, infoinv)
        base = dict(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=97, step_size=0.033, white_bg=True,
        )
        dense = RenderConfig(**base)
        grouped = RenderConfig(**base, group_size=8, run_len=4)
        o1 = render_rays(params, cfg, dense, rays, None, is_train=False, iteration=5)
        o2 = render_rays(params, cfg, grouped, rays, None, is_train=False, iteration=5)
        np.testing.assert_allclose(
            np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(o1["depth_map"]), np.asarray(o2["depth_map"]), atol=2e-4
        )

    def test_matches_dense_with_alpha_and_caps(self):
        cfg, params, rays = _setup_scene("infoinv", True)
        # occupancy: everything occupied -> masks agree exactly; caps ample.
        vol = jnp.ones((16, 16, 16))
        aabb_j = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]])
        base = dict(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=96, step_size=0.033, white_bg=True,
        )
        dense = RenderConfig(**base)
        grouped = RenderConfig(
            **base, group_size=8, run_len=4, sample_cap=96, rgb_cap=0
        )
        o1 = render_rays(
            params, cfg, dense, rays, None, is_train=False,
            alpha_volume=vol, alpha_aabb=aabb_j,
        )
        o2 = render_rays(
            params, cfg, grouped, rays, None, is_train=False,
            alpha_volume=vol, alpha_aabb=aabb_j,
        )
        np.testing.assert_allclose(
            np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]), atol=2e-5
        )

    def test_truncation_and_rgb_groups_reasonable(self):
        """With tight caps the grouped render must stay close to dense (the
        dropped contributions are sub-threshold by construction)."""
        cfg, params, rays = _setup_scene("infoinv", True)
        base = dict(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=96, step_size=0.033, white_bg=True,
        )
        dense = RenderConfig(**base)
        grouped = RenderConfig(
            **base, group_size=8, run_len=4, sample_cap=96, rgb_cap=32
        )
        o1 = render_rays(params, cfg, dense, rays, None, is_train=False)
        o2 = render_rays(params, cfg, grouped, rays, None, is_train=False)
        err = np.abs(np.asarray(o1["rgb_map"]) - np.asarray(o2["rgb_map"])).max()
        assert err < 5e-2, err

    def test_grad_matches_dense(self):
        cfg, params, rays = _setup_scene("infoinv", True)
        base = dict(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=64, step_size=0.05, white_bg=True,
        )
        dense = RenderConfig(**base)
        grouped = RenderConfig(**base, group_size=8, run_len=4)
        target = jnp.zeros((rays.shape[0], 3))

        def loss(p, rc):
            out = render_rays(p, cfg, rc, rays, None, is_train=False)
            return jnp.mean((out["rgb_map"] - target) ** 2)

        g1 = jax.grad(loss)(params, dense)
        g2 = jax.grad(loss)(params, grouped)
        for k in g1:
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(g1[k])[0]),
                np.asarray(jax.tree.leaves(g2[k])[0]),
                atol=1e-5, err_msg=k,
            )


class TestFusedFetch:
    @pytest.mark.parametrize("variant,infoinv,rgb_cap", [
        ("infoinv", True, 32), ("infoinv", True, 0),
        ("infoinv", False, 32), ("gauge", False, 32),
    ])
    def test_matches_unfused(self, variant, infoinv, rgb_cap):
        cfg, params, rays = _setup_scene(variant, infoinv)
        base = dict(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=96, step_size=0.033, white_bg=True,
            group_size=8, run_len=4, sample_cap=96, rgb_cap=rgb_cap,
        )
        o1 = render_rays(
            params, cfg, RenderConfig(**base, fused_fetch=False), rays, None,
            is_train=False, iteration=5,
        )
        o2 = render_rays(
            params, cfg, RenderConfig(**base, fused_fetch=True), rays, None,
            is_train=False, iteration=5,
        )
        np.testing.assert_allclose(
            np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]), atol=2e-5
        )


class TestSampleParallel:
    def test_sp_matches_dense_and_trains(self):
        from ngf_tpu.parallel.mesh import make_mesh_2d
        from ngf_tpu.parallel.sample_parallel import render_rays_sp

        cfg, params, rays = _setup_scene("infoinv", True)
        rcfg = RenderConfig(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=96, step_size=0.033, white_bg=True,
        )
        mesh = make_mesh_2d(2, 4)

        o1 = render_rays(params, cfg, rcfg, rays, None, is_train=False)
        o2 = jax.jit(
            lambda p, r: render_rays_sp(p, cfg, rcfg, r, None, mesh)
        )(params, rays)
        np.testing.assert_allclose(
            np.asarray(o1["rgb_map"]), np.asarray(o2["rgb_map"]), atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(o1["acc_map"]), np.asarray(o2["acc_map"]), atol=1e-4
        )

        # differentiable: one train-style grad through the sharded renderer
        target = jnp.zeros((rays.shape[0], 3))

        def loss(p):
            out = render_rays_sp(p, cfg, rcfg, rays, None, mesh)
            return jnp.mean((out["rgb_map"] - target) ** 2)

        def loss_dense(p):
            out = render_rays(p, cfg, rcfg, rays, None, is_train=False)
            return jnp.mean((out["rgb_map"] - target) ** 2)

        g1 = jax.jit(jax.grad(loss))(params)
        g2 = jax.grad(loss_dense)(params)
        np.testing.assert_allclose(
            np.asarray(g1["plane_xy"]), np.asarray(g2["plane_xy"]), atol=1e-4
        )


class TestFusedDenseGrads:
    def test_fused_dense_shading_grads_match_unfused(self):
        """The shipped quality config (rgb_cap=0 + fused_fetch=1) must
        produce the same parameter gradients as the unfused dense-shaded
        grouped path (round-3 quality defaults, PARITY.md A/B)."""
        cfg, params, rays = _setup_scene("infoinv", True)
        base = dict(
            aabb=((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5)),
            near=2.0, far=6.0, n_samples=96, step_size=0.033, white_bg=True,
            group_size=8, sample_cap=96, rgb_cap=0,
        )
        tgt = jnp.zeros((rays.shape[0], 3))

        def loss(p, rc):
            out = render_rays(p, cfg, rc, rays, None, is_train=False)
            return jnp.mean((out["rgb_map"] - tgt) ** 2)

        g0 = jax.grad(loss)(params, RenderConfig(**base, fused_fetch=False))
        g1 = jax.grad(loss)(params, RenderConfig(**base, fused_fetch=True))
        for k in g0:
            np.testing.assert_allclose(
                np.asarray(jax.tree.leaves(g1[k])[0]),
                np.asarray(jax.tree.leaves(g0[k])[0]),
                atol=1e-5, err_msg=k,
            )
