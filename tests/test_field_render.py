"""Field + renderer behavior tests (shapes, gauge schedule, compaction)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngf_tpu.fields import TriPlaneConfig, init_triplane, triplane_project, triplane_gauge
from ngf_tpu.render import RenderConfig, render_rays

AABB = ((-1.5, -1.5, -1.5), (1.5, 1.5, 1.5))


def small_rcfg(**kw):
    base = dict(
        aabb=AABB, near=2.0, far=6.0, n_samples=64, step_size=0.08,
        distance_scale=25.0, white_bg=True,
    )
    base.update(kw)
    return RenderConfig(**base)


def make_rays(n=32, seed=0):
    rng = np.random.default_rng(seed)
    o = np.tile(np.array([[0, 0, -4.0]], np.float32), (n, 1))
    d = rng.normal(size=(n, 3)).astype(np.float32) * 0.15 + np.array([0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(np.concatenate([o, d], -1))


class TestTriPlaneField:
    def test_projection_matches_reference_slicing(self):
        # InfoInv/models/Field.py:46 — xy=[:, :2], yz=[:, 1:], xz=[:, ::2]
        xyz = jnp.asarray(np.random.default_rng(0).normal(size=(5, 3)).astype(np.float32))
        xy, yz, xz = triplane_project(xyz)
        np.testing.assert_array_equal(np.asarray(xy), np.asarray(xyz[:, :2]))
        np.testing.assert_array_equal(np.asarray(yz), np.asarray(xyz[:, 1:]))
        np.testing.assert_array_equal(np.asarray(xz), np.asarray(xyz[:, ::2]))

    def test_infoinv_param_shapes(self):
        cfg = TriPlaneConfig.infoinv_preset(infoinv=True)
        cfg = TriPlaneConfig(**{**cfg.__dict__, "plane_res": 16})
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        assert params["plane_xy"].shape == (16, 16, 96)
        assert "gauge_xy" not in params
        assert params["density_decoder"]["mlp"]["layers"][0]["w"].shape == (72, 32)
        # rgb decoder input: 216 feat + 3 view + 2*2*3 PE = 231
        assert params["rgb_decoder"]["mlp"]["layers"][0]["w"].shape == (231, 64)

    def test_gauge_param_shapes(self):
        cfg = TriPlaneConfig.gauge_preset(gauge_start=4000)
        cfg = TriPlaneConfig(**{**cfg.__dict__, "plane_res": 16, "gauge_res": 16})
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        assert params["plane_xy"].shape == (16, 16, 64)
        assert params["gauge_xy"].shape == (16, 16, 2)
        assert float(jnp.abs(params["gauge_xy"]).sum()) == 0.0
        # TriPlane/models/Field.py:29 — single linear 48 -> 1
        assert params["density_decoder"]["w"].shape == (48, 1)

    def test_gauge_schedule(self):
        cfg = TriPlaneConfig.gauge_preset(gauge_start=10)
        cfg = TriPlaneConfig(**{**cfg.__dict__, "plane_res": 8, "gauge_res": 8})
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        # Perturb offsets so active vs inactive actually differ.
        params["gauge_xy"] = params["gauge_xy"] + 0.1
        params["gauge_yz"] = params["gauge_yz"] - 0.05
        params["gauge_xz"] = params["gauge_xz"] + 0.02
        xyz = jnp.asarray(
            np.random.default_rng(1).uniform(-1, 1, (20, 3)).astype(np.float32)
        )
        xy, yz, xz = triplane_project(xyz)
        off = triplane_gauge(params, cfg, xy, yz, xz, iteration=5)
        on = triplane_gauge(params, cfg, xy, yz, xz, iteration=10)
        np.testing.assert_allclose(np.asarray(off[0]), np.asarray(xy), atol=0)
        assert np.abs(np.asarray(on[0]) - np.asarray(xy)).max() > 1e-3

    def test_gauge_cross_coupling(self):
        # Verify the exact coupling pattern of TriPlane/models/Field.py:62-71
        # with constant offset grids so grid_sample returns the constants.
        cfg = TriPlaneConfig.gauge_preset(gauge_start=0)
        cfg = TriPlaneConfig(**{**cfg.__dict__, "plane_res": 8, "gauge_res": 8})
        params = init_triplane(jax.random.PRNGKey(0), cfg)
        dxy = np.array([0.01, 0.02], np.float32)
        dyz = np.array([0.03, 0.04], np.float32)
        dxz = np.array([0.05, 0.06], np.float32)
        params["gauge_xy"] = jnp.broadcast_to(dxy, (8, 8, 2))
        params["gauge_yz"] = jnp.broadcast_to(dyz, (8, 8, 2))
        params["gauge_xz"] = jnp.broadcast_to(dxz, (8, 8, 2))
        xyz = jnp.asarray([[0.1, -0.2, 0.3]], dtype=jnp.float32)
        xy, yz, xz = triplane_project(xyz)
        txy, tyz, txz = triplane_gauge(params, cfg, xy, yz, xz, iteration=0)
        x, y, z = 0.1, -0.2, 0.3
        np.testing.assert_allclose(
            np.asarray(txy)[0], [x + dxy[0] + dxz[0], y + dxy[1] + dyz[0]], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(tyz)[0], [y + dyz[0] + dxy[1], z + dyz[1] + dxz[1]], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(txz)[0], [x + dxz[0] + dxy[0], z + dxz[1] + dyz[1]], atol=1e-6
        )


class TestRenderer:
    @pytest.fixture(scope="class")
    def setup(self):
        cfg = TriPlaneConfig(
            variant="infoinv", plane_res=32, plane_dim=24, density_dim=8, infoinv=False
        )
        params = init_triplane(jax.random.PRNGKey(42), cfg)
        return params, cfg

    def test_shapes_and_white_bg(self, setup):
        params, cfg = setup
        rays = make_rays(16)
        out = render_rays(
            params, cfg, small_rcfg(), rays, None, is_train=False
        )
        assert out["rgb_map"].shape == (16, 3)
        assert out["depth_map"].shape == (16,)
        # near-empty field (softplus(feat - 10) ~ 0) -> white background
        assert float(out["rgb_map"].min()) > 0.95

    def test_train_eval_and_key(self, setup):
        params, cfg = setup
        rays = make_rays(8)
        out1 = render_rays(
            params, cfg, small_rcfg(), rays, jax.random.PRNGKey(0), is_train=True
        )
        out2 = render_rays(
            params, cfg, small_rcfg(), rays, jax.random.PRNGKey(0), is_train=True
        )
        np.testing.assert_allclose(
            np.asarray(out1["rgb_map"]), np.asarray(out2["rgb_map"]), atol=0
        )

    def test_compaction_matches_dense(self, setup):
        params, cfg = setup
        # Make the field non-trivial so compositing is exercised.
        params = dict(params)
        params["plane_xy"] = params["plane_xy"] + 3.0
        rays = make_rays(16, seed=3)
        dense = render_rays(params, cfg, small_rcfg(), rays, None, is_train=False)
        capped = render_rays(
            params, cfg, small_rcfg(sample_cap=48), rays, None, is_train=False
        )
        # cap=48 of 64: rays keep at most ~38 in-bbox samples here, so the
        # compaction must be exact.
        np.testing.assert_allclose(
            np.asarray(dense["rgb_map"]), np.asarray(capped["rgb_map"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(dense["depth_map"]), np.asarray(capped["depth_map"]), atol=2e-4
        )

    def test_rgb_topk_matches_dense(self, setup):
        params, cfg = setup
        params = dict(params)
        params["plane_xy"] = params["plane_xy"] + 3.0  # non-trivial density
        rays = make_rays(16, seed=5)
        dense = render_rays(params, cfg, small_rcfg(), rays, None, is_train=False)
        capped = render_rays(
            params, cfg, small_rcfg(rgb_cap=48), rays, None, is_train=False
        )
        # K=48 of 64 samples covers every above-threshold weight here.
        np.testing.assert_allclose(
            np.asarray(dense["rgb_map"]), np.asarray(capped["rgb_map"]), atol=3e-3
        )

    def test_alpha_mask_culling(self, setup):
        params, cfg = setup
        rays = make_rays(8)
        vol = jnp.zeros((16, 16, 16))  # everything culled
        out = render_rays(
            params, cfg, small_rcfg(), rays, None, is_train=False,
            alpha_volume=vol, alpha_aabb=jnp.asarray(AABB),
        )
        # all samples culled -> empty -> pure white bg, zero acc
        np.testing.assert_allclose(np.asarray(out["acc_map"]), 0.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out["rgb_map"]), 1.0, atol=1e-6)

    def test_odd_group_size_with_occupancy(self, setup):
        """Odd G >= 5 must use the single-center occupancy query (the
        half-stride two-query path only covers even G — advisor finding)."""
        params, cfg = setup
        params = dict(params)
        params["plane_xy"] = params["plane_xy"] + 3.0
        rays = make_rays(8, seed=11)
        vol = jnp.ones((16, 16, 16))
        for G in (5, 7):
            out = render_rays(
                params, cfg, small_rcfg(sample_cap=50, group_size=G, tile_q=0),
                rays, None, is_train=False,
                alpha_volume=vol, alpha_aabb=jnp.asarray(AABB),
            )
            assert np.isfinite(np.asarray(out["rgb_map"])).all()

    def test_gather_impls_agree_on_full_render(self, setup):
        from ngf_tpu.ops import grid_sample as gs

        params, cfg = setup
        params = dict(params)
        params["plane_xz"] = params["plane_xz"] + 3.0
        rays = make_rays(12, seed=9)
        vol = jnp.ones((16, 16, 16))  # permissive mask, exercises 3D lookup
        outs = {}
        for impl in ("rows", "blocks"):
            gs.set_gather_impl(impl)
            outs[impl] = render_rays(
                params, cfg, small_rcfg(sample_cap=48, rgb_cap=24), rays, None,
                is_train=False, alpha_volume=vol, alpha_aabb=jnp.asarray(AABB),
            )
        gs.set_gather_impl("rows")
        np.testing.assert_allclose(
            np.asarray(outs["rows"]["rgb_map"]),
            np.asarray(outs["blocks"]["rgb_map"]),
            atol=1e-5,
        )
