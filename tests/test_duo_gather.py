"""Parity tests for the duo (pair-serving) plane gather.

grid_sample_2d_duo must equal grid_sample_2d exactly whenever consecutive
sample pairs move <= 1 texel per axis per step — the structural guarantee
of the trainer's sampling geometry (step_ratio <= 1 texel voxels).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_2d_duo


def _pair_coords(rng, n, m, size, max_step_texels=1.0):
    """(n, m, 2) coords where samples (2k, 2k+1) are <= max_step texels apart,
    spanning in/near/out-of-range positions."""
    base = rng.uniform(-1.3, 1.3, (n, m // 2, 2)).astype(np.float32)
    texel = 2.0 / (size - 1)
    delta = rng.uniform(-1, 1, (n, m // 2, 2)).astype(np.float32)
    delta *= max_step_texels * texel
    pairs = np.stack([base, base + delta], axis=2)  # (n, P, 2, 2)
    return pairs.reshape(n, m, 2)


class TestDuoGather:
    @pytest.mark.parametrize("size", [8, 33, 64])
    def test_matches_reference_sampler(self, size):
        rng = np.random.default_rng(0)
        plane = rng.normal(size=(size, size, 6)).astype(np.float32)
        coords = _pair_coords(rng, 5, 32, size)
        want = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))
        got = np.asarray(grid_sample_2d_duo(jnp.asarray(plane), jnp.asarray(coords)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_identical_pair_members(self):
        # degenerate pairs (edge-padded compaction) are valid inputs
        rng = np.random.default_rng(1)
        plane = rng.normal(size=(16, 16, 3)).astype(np.float32)
        c = rng.uniform(-1, 1, (2, 8, 1, 2)).astype(np.float32)
        coords = np.repeat(c, 2, axis=2).reshape(2, 16, 2)
        want = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))
        got = np.asarray(grid_sample_2d_duo(jnp.asarray(plane), jnp.asarray(coords)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_gradients_match(self):
        rng = np.random.default_rng(2)
        plane = rng.normal(size=(12, 12, 4)).astype(np.float32)
        coords = jnp.asarray(_pair_coords(rng, 3, 8, 12))

        def loss(fn, p):
            return jnp.sum(fn(p, coords) ** 2)

        g_ref = jax.grad(lambda p: loss(grid_sample_2d, p))(jnp.asarray(plane))
        g_duo = jax.grad(lambda p: loss(grid_sample_2d_duo, p))(jnp.asarray(plane))
        np.testing.assert_allclose(
            np.asarray(g_duo), np.asarray(g_ref), rtol=1e-5, atol=1e-5
        )

    def test_render_rays_pair_gather_matches_default(self):
        """Full grouped render step: pair_gather on == off (f32, CPU)."""
        import dataclasses

        from ngf_tpu.fields import TriPlaneConfig, init_triplane
        from ngf_tpu.render import RenderConfig, render_rays

        cfg = TriPlaneConfig(
            **{**TriPlaneConfig.infoinv_preset(infoinv=True).__dict__,
               "plane_res": 48, "gauge_res": 48}
        )
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        # perturb planes so features are non-trivial
        params["plane_xy"] = params["plane_xy"] + 0.1

        rng = np.random.default_rng(3)
        d = rng.normal(size=(64, 3)).astype(np.float32) * 0.1 + [0, 0, 1]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(
            np.concatenate([np.tile([[0.0, 0.0, -4.0]], (64, 1)), d], -1),
            jnp.float32,
        )
        base = RenderConfig(
            aabb=((-1.5,) * 3, (1.5,) * 3), near=2.0, far=6.0,
            # step <= 1 texel: 3.0 extent / (48-1) texels
            n_samples=64, step_size=0.06, white_bg=True,
            sample_cap=32, rgb_cap=16, group_size=8,
        )
        out0 = render_rays(params, cfg, base, rays, None, is_train=False)
        out1 = render_rays(
            params, cfg, dataclasses.replace(base, pair_gather=True),
            rays, None, is_train=False,
        )
        np.testing.assert_allclose(
            np.asarray(out1["rgb_map"]), np.asarray(out0["rgb_map"]),
            rtol=1e-5, atol=1e-5,
        )

    @pytest.mark.parametrize("size", [8, 33, 64])
    def test_duobwd_forward_exact(self, size):
        """blocks-fwd/duo-bwd: forward must be bit-identical to the blocks
        sampler (it IS the blocks sampler)."""
        from ngf_tpu.ops.grid_sample import grid_sample_2d_blocks_duobwd

        rng = np.random.default_rng(4)
        plane = rng.normal(size=(size, size, 5)).astype(np.float32)
        coords = _pair_coords(rng, 4, 24, size)
        want = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))
        got = np.asarray(
            grid_sample_2d_blocks_duobwd(jnp.asarray(plane), jnp.asarray(coords))
        )
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("size", [8, 33, 64])
    def test_duobwd_plane_grads_match_autodiff(self, size):
        from ngf_tpu.ops.grid_sample import grid_sample_2d_blocks_duobwd

        rng = np.random.default_rng(5)
        plane = jnp.asarray(rng.normal(size=(size, size, 5)).astype(np.float32))
        coords = jnp.asarray(_pair_coords(rng, 4, 24, size))
        cot = jnp.asarray(rng.normal(size=(4, 24, 5)).astype(np.float32))

        def loss(fn, p):
            return jnp.sum(fn(p, coords) * cot)

        g_ref = jax.grad(lambda p: loss(grid_sample_2d, p))(plane)
        g_duo = jax.grad(lambda p: loss(grid_sample_2d_blocks_duobwd, p))(plane)
        np.testing.assert_allclose(
            np.asarray(g_duo), np.asarray(g_ref), rtol=1e-5, atol=1e-5
        )

    def test_duobwd_coord_grads_match_autodiff(self):
        """Coordinate gradients (the gauge-grid chain) from the analytic
        patch-weight derivative vs plain autodiff of the blocks sampler."""
        from ngf_tpu.ops.grid_sample import grid_sample_2d_blocks_duobwd

        rng = np.random.default_rng(6)
        size = 32
        plane = jnp.asarray(rng.normal(size=(size, size, 4)).astype(np.float32))
        # strictly interior coords: the weight derivative is discontinuous
        # exactly at texel borders, where autodiff picks one side arbitrarily
        base = rng.uniform(-0.9, 0.9, (3, 8, 2)).astype(np.float32)
        base = np.floor((base + 1) / 2 * (size - 1) + 0.37) + 0.41
        base = (base / (size - 1)) * 2 - 1
        delta = rng.uniform(0.1, 0.6, (3, 8, 2)).astype(np.float32) * (
            2.0 / (size - 1)
        )
        coords = jnp.asarray(
            np.stack([base, base + delta * 0.2], axis=2).reshape(3, 16, 2)
        )
        cot = jnp.asarray(rng.normal(size=(3, 16, 4)).astype(np.float32))

        def loss(fn, c):
            return jnp.sum(fn(plane, c) * cot)

        g_ref = jax.grad(lambda c: loss(grid_sample_2d, c))(coords)
        g_duo = jax.grad(lambda c: loss(grid_sample_2d_blocks_duobwd, c))(coords)
        np.testing.assert_allclose(
            np.asarray(g_duo), np.asarray(g_ref), rtol=1e-4, atol=1e-4
        )

    def test_bf16_field_path_keeps_coords_f32(self):
        """With compute_dtype=bfloat16 the duo sampler must see float32
        coords: a bf16-quantized coordinate (~0.5 texel at 256 res) can push
        a pair's stencil starts > 1 texel apart and silently zero taps
        (advisor finding, round 2). The f32-coord pipeline keeps pair_gather
        within bf16 feature noise of the blocks path."""
        import dataclasses

        from ngf_tpu.fields import TriPlaneConfig, init_triplane
        from ngf_tpu.render import RenderConfig, render_rays

        cfg = TriPlaneConfig(
            **{**TriPlaneConfig.infoinv_preset(infoinv=True).__dict__,
               "plane_res": 256, "compute_dtype": "bfloat16"}
        )
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        params["plane_xy"] = params["plane_xy"] + 0.1

        rng = np.random.default_rng(7)
        d = rng.normal(size=(48, 3)).astype(np.float32) * 0.1 + [0, 0, 1]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(
            np.concatenate([np.tile([[0.0, 0.0, -4.0]], (48, 1)), d], -1),
            jnp.float32,
        )
        base = RenderConfig(
            aabb=((-1.5,) * 3, (1.5,) * 3), near=2.0, far=6.0,
            # ~0.5 texel/step at 256 res: the regime where bf16 coords break
            n_samples=96, step_size=0.006, white_bg=True,
            sample_cap=64, rgb_cap=32, group_size=8,
        )
        out0 = render_rays(params, cfg, base, rays, None, is_train=False)
        out1 = render_rays(
            params, cfg, dataclasses.replace(base, pair_gather=True),
            rays, None, is_train=False,
        )
        np.testing.assert_allclose(
            np.asarray(out1["rgb_map"]), np.asarray(out0["rgb_map"]),
            rtol=0, atol=2e-2,
        )

    def test_render_rays_duo_bwd_grads_match_default(self):
        """Full grouped train-style gradient: duo_bwd on == off (f32, CPU).
        The forward is shared (blocks); this pins the custom backward
        through compaction, InfoInv modulation, decoders and compositing."""
        import dataclasses

        from ngf_tpu.fields import TriPlaneConfig, init_triplane
        from ngf_tpu.render import RenderConfig, render_rays

        cfg = TriPlaneConfig(
            **{**TriPlaneConfig.infoinv_preset(infoinv=True).__dict__,
               "plane_res": 48}
        )
        params = init_triplane(jax.random.PRNGKey(1), cfg)
        params["plane_xy"] = params["plane_xy"] + 0.1

        rng = np.random.default_rng(8)
        d = rng.normal(size=(32, 3)).astype(np.float32) * 0.1 + [0, 0, 1]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(
            np.concatenate([np.tile([[0.0, 0.0, -4.0]], (32, 1)), d], -1),
            jnp.float32,
        )
        tgt = jnp.asarray(rng.uniform(0, 1, (32, 3)).astype(np.float32))
        base = RenderConfig(
            aabb=((-1.5,) * 3, (1.5,) * 3), near=2.0, far=6.0,
            n_samples=64, step_size=0.06, white_bg=True,
            sample_cap=32, rgb_cap=16, group_size=8,
        )

        def loss(p, rc):
            out = render_rays(p, cfg, rc, rays, None, is_train=False)
            return jnp.mean((out["rgb_map"] - tgt) ** 2)

        g0 = jax.grad(loss)(params, base)
        g1 = jax.grad(loss)(params, dataclasses.replace(base, duo_bwd=True))
        for k in g0:
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
                ),
                g0[k], g1[k],
            )

    def test_render_rays_duo_bwd_gauge_grads_match_default(self):
        """Gauge variant: duo_bwd applies to the gauge-GRID lookups (their
        coords are the undeformed projections — always pair-consecutive)
        while plane gathers at deformed coords keep plain autodiff. Gauge
        grid + plane gradients must match the default path exactly."""
        import dataclasses

        from ngf_tpu.fields import TriPlaneConfig, init_triplane
        from ngf_tpu.render import RenderConfig, render_rays

        cfg = TriPlaneConfig(
            **{**TriPlaneConfig.gauge_preset(gauge_start=0).__dict__,
               "plane_res": 48, "gauge_res": 48}
        )
        params = init_triplane(jax.random.PRNGKey(2), cfg)
        params["plane_xy"] = params["plane_xy"] + 0.1
        # nonzero smooth gauge offsets so their gradient path is non-trivial
        rng = np.random.default_rng(9)
        for k in ("gauge_xy", "gauge_yz", "gauge_xz"):
            params[k] = params[k] + 0.01 * jnp.asarray(
                rng.normal(size=params[k].shape).astype(np.float32)
            )

        d = rng.normal(size=(24, 3)).astype(np.float32) * 0.1 + [0, 0, 1]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = jnp.asarray(
            np.concatenate([np.tile([[0.0, 0.0, -4.0]], (24, 1)), d], -1),
            jnp.float32,
        )
        tgt = jnp.asarray(rng.uniform(0, 1, (24, 3)).astype(np.float32))
        base = RenderConfig(
            aabb=((-1.5,) * 3, (1.5,) * 3), near=2.0, far=6.0,
            n_samples=64, step_size=0.06, white_bg=True,
            sample_cap=32, rgb_cap=16, group_size=8,
        )

        def loss(p, rc):
            out = render_rays(p, cfg, rc, rays, None, is_train=False,
                              iteration=10)
            return jnp.mean((out["rgb_map"] - tgt) ** 2)

        g0 = jax.grad(loss)(params, base)
        g1 = jax.grad(loss)(params, dataclasses.replace(base, duo_bwd=True))
        for k in ("gauge_xy", "gauge_yz", "gauge_xz", "plane_xy", "plane_yz"):
            np.testing.assert_allclose(
                np.asarray(g1[k]), np.asarray(g0[k]), rtol=1e-5, atol=1e-6,
                err_msg=k,
            )

    def test_odd_group_size_rejected(self):
        from ngf_tpu.fields import TriPlaneConfig, init_triplane
        from ngf_tpu.render import RenderConfig, render_rays

        cfg = TriPlaneConfig.infoinv_preset(infoinv=True)
        cfg = TriPlaneConfig(**{**cfg.__dict__, "plane_res": 16, "gauge_res": 16})
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        rays = jnp.zeros((4, 6)).at[:, 5].set(1.0)
        rcfg = RenderConfig(
            aabb=((-1.5,) * 3, (1.5,) * 3), n_samples=16, step_size=0.1,
            group_size=3, pair_gather=True,
        )
        with pytest.raises(ValueError, match="even group_size"):
            render_rays(params, cfg, rcfg, rays, None, is_train=False)
