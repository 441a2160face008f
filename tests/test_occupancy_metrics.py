"""Occupancy subsystem + metrics unit tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngf_tpu.fields import TriPlaneConfig, init_triplane
from ngf_tpu.train.occupancy import (
    AlphaGrid,
    dense_grid_points,
    filter_rays_bbox,
    shrink_box_voxels,
    update_alpha_mask,
)
from ngf_tpu.utils.metrics import mse2psnr, rgb_ssim
from ngf_tpu.train.uv_loop import lambda_lr, step_lr


class TestOccupancy:
    def test_update_alpha_mask_finds_dense_region(self):
        # A field with strongly positive density-plane features everywhere
        # should produce a fully occupied (dilated) mask; near-zero features
        # (softplus(x-10)) should produce an empty one.
        cfg = TriPlaneConfig(variant="infoinv", plane_res=16, plane_dim=24,
                             density_dim=8, infoinv=False)
        aabb = np.array([[-1.5] * 3, [1.5] * 3], np.float32)

        params = init_triplane(jax.random.PRNGKey(0), cfg)
        grid, new_aabb = update_alpha_mask(
            params, cfg, aabb, step_size=0.2, grid_size=(16, 16, 16)
        )
        assert np.asarray(grid.volume).sum() == 0  # empty field
        np.testing.assert_allclose(new_aabb, aabb)  # fallback bbox

        # Push raw density positive via the decoder's final bias: softplus
        # (raw - 10) turns +20 into density ~10 everywhere.
        params["density_decoder"]["mlp"]["layers"][-1]["b"] = (
            params["density_decoder"]["mlp"]["layers"][-1]["b"] + 20.0
        )
        grid2, new_aabb2 = update_alpha_mask(
            params, cfg, aabb, step_size=0.2, grid_size=(16, 16, 16)
        )
        assert np.asarray(grid2.volume).mean() > 0.9
        assert grid2.table is not None
        # tight bbox of a full volume spans the aabb
        np.testing.assert_allclose(new_aabb2, aabb, atol=1e-5)

    def test_dense_grid_points_span(self):
        aabb = np.array([[-1, -2, -3], [1, 2, 3]], np.float32)
        pts = dense_grid_points(aabb, (4, 5, 6))
        assert pts.shape == (4, 5, 6, 3)
        np.testing.assert_allclose(pts[0, 0, 0], aabb[0])
        np.testing.assert_allclose(pts[-1, -1, -1], aabb[1])

    def test_filter_rays_bbox(self):
        aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
        rays = np.array(
            [
                [0, 0, -5, 0, 0, 1],     # hits
                [5, 5, -5, 0, 0, 1],     # misses (parallel offset)
                [0, 0, -5, 0, 0, -1],    # points away -> t_max < t_min? (still
                                         # intersects the infinite line: kept)
            ],
            np.float32,
        )
        keep = filter_rays_bbox(rays, aabb)
        assert keep[0] and not keep[1]

    def test_shrink_box_voxels(self):
        aabb = np.array([[-1.5] * 3, [1.5] * 3])
        new_aabb = np.array([[-0.75, -0.3, 0.0], [0.75, 0.3, 1.5]])
        t_l, b_r = shrink_box_voxels(aabb, new_aabb, (256, 256, 256))
        assert (t_l >= 0).all() and (b_r <= 256).all() and (b_r > t_l).all()
        units = 3.0 / 255
        np.testing.assert_allclose(t_l, np.round((new_aabb[0] + 1.5) / units))

    def test_alpha_grid_sample_matches_volume(self):
        rng = np.random.default_rng(0)
        vol = (rng.uniform(size=(8, 8, 8)) > 0.5).astype(np.float32)
        aabb = jnp.asarray([[-1, -1, -1], [1, 1, 1]], dtype=jnp.float32)
        grid = AlphaGrid(volume=jnp.asarray(vol), aabb=aabb).build_table()
        # sample exactly at voxel centers: expect the stored values
        lin = np.linspace(-1, 1, 8)
        xs, ys, zs = np.meshgrid(lin, lin, lin, indexing="ij")
        pts = np.stack([xs, ys, zs], -1).reshape(-1, 3).astype(np.float32)
        vals = np.asarray(grid.sample(jnp.asarray(pts))).reshape(8, 8, 8)
        # volume layout is z-major: value at (x, y, z) = vol[z, y, x]
        np.testing.assert_allclose(vals, vol.transpose(2, 1, 0), atol=1e-5)


class TestMetrics:
    def test_psnr(self):
        assert mse2psnr(0.01) == pytest.approx(20.0)

    def test_ssim_identity_and_noise(self):
        rng = np.random.default_rng(0)
        img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
        assert rgb_ssim(img, img, 1.0) == pytest.approx(1.0, abs=1e-6)
        noisy = np.clip(img + rng.normal(0, 0.3, img.shape), 0, 1)
        s = rgb_ssim(img, noisy, 1.0)
        assert 0.0 < s < 0.9


class TestUVSchedules:
    def test_lambda_policy(self):
        # constant through niter, linear decay over niter_decay (util.py:317-323)
        assert float(lambda_lr(0, 100, 50)) == 1.0
        assert float(lambda_lr(100, 100, 50)) == 1.0
        assert float(lambda_lr(125, 100, 50)) == pytest.approx(1 - 25 / 51)

    def test_step_policy(self):
        assert float(step_lr(0, 10)) == 1.0
        assert float(step_lr(10, 10)) == pytest.approx(0.1)
        assert float(step_lr(25, 10)) == pytest.approx(0.01)


class TestLpipsPlumbing:
    """The LPIPS forward is validated with synthetic weights (real weights
    cannot exist in this zero-egress image; see ngf_tpu/utils/lpips.py)."""

    def _fake_alex_npz(self, path):
        import numpy as np

        rng = np.random.default_rng(0)
        arch = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
        data = {}
        for i, (o, c, k) in enumerate(arch):
            data[f"conv{i}_w"] = rng.normal(0, 0.05, (o, c, k, k)).astype("float32")
            data[f"conv{i}_b"] = np.zeros(o, "float32")
        for i, (o, _, _) in enumerate(arch):
            data[f"lin{i}_w"] = np.abs(
                rng.normal(0, 0.01, (1, o, 1, 1))
            ).astype("float32")
        np.savez(path, **data)

    def test_npz_forward(self, tmp_path, monkeypatch):
        import numpy as np

        from ngf_tpu.utils import lpips as L

        monkeypatch.setenv("NGF_LPIPS_WEIGHTS_DIR", str(tmp_path))
        L._models.clear()
        self._fake_alex_npz(tmp_path / "lpips_alex.npz")
        rng = np.random.default_rng(1)
        a = rng.random((64, 64, 3)).astype("float32")
        b = rng.random((64, 64, 3)).astype("float32")
        d_same = L.rgb_lpips(a, a, "alex")
        d_diff = L.rgb_lpips(a, b, "alex")
        assert d_same == 0.0
        assert np.isfinite(d_diff) and d_diff > 0

    def test_unavailable_returns_nan_with_marker(self, tmp_path, monkeypatch):
        import numpy as np

        from ngf_tpu.utils import lpips as L

        monkeypatch.setenv("NGF_LPIPS_WEIGHTS_DIR", str(tmp_path / "empty"))
        L._models.clear()
        L._warned.clear()
        a = np.zeros((16, 16, 3), "float32")
        with pytest.warns(UserWarning, match="lpips_unavailable"):
            assert np.isnan(L.rgb_lpips(a, a, "vgg"))
