"""Unit tests for the dataset-layer utilities: sampler epochs, background
prefetch, camera-path generators, and the synthetic ground-truth field."""

import numpy as np
import pytest

from ngf_tpu.data.geometry import (
    circle_path,
    get_ray_directions,
    get_ray_directions_blender,
    get_rays,
    get_spiral,
    ndc_rays_blender,
    pose_spherical,
    spherical_path,
)
from ngf_tpu.data.prefetch import BlockPrefetcher
from ngf_tpu.data.sampler import SimpleSampler
from ngf_tpu.data.synthetic import _field, make_synthetic_dataset


class TestSimpleSampler:
    def test_epoch_covers_all_ids(self):
        s = SimpleSampler(100, 10, seed=0)
        seen = np.concatenate([s.nextids() for _ in range(10)])
        assert sorted(seen.tolist()) == list(range(100))

    def test_reshuffles_between_epochs(self):
        s = SimpleSampler(64, 64, seed=0)
        a, b = s.nextids().copy(), s.nextids().copy()
        assert not np.array_equal(a, b)
        assert sorted(a.tolist()) == sorted(b.tolist())

    def test_seed_determinism(self):
        a = SimpleSampler(50, 7, seed=3)
        b = SimpleSampler(50, 7, seed=3)
        for _ in range(5):
            np.testing.assert_array_equal(a.nextids(), b.nextids())

    def test_small_dataset_tiles_to_batch(self):
        s = SimpleSampler(3, 8, seed=0)
        ids = s.nextids()
        assert ids.shape == (8,)
        assert set(ids.tolist()).issubset({0, 1, 2})


class TestBlockPrefetcher:
    def test_produces_blocks_in_order(self):
        counter = iter(range(100))
        p = BlockPrefetcher(lambda: next(counter))
        got = [p.next() for _ in range(5)]
        assert got == sorted(got)
        p.close()

    def test_error_propagates(self):
        def boom():
            raise ValueError("worker error")

        p = BlockPrefetcher(boom)
        with pytest.raises(ValueError, match="worker error"):
            p.next()

    def test_close_joins_worker(self):
        p = BlockPrefetcher(lambda: np.zeros(4))
        p.next()
        p.close()
        assert not p._thread.is_alive()


class TestCameraPaths:
    def test_spherical_poses_look_at_origin(self):
        path = spherical_path(40, phi=-30.0, radius=4.0)
        assert path.shape == (40, 4, 4)
        for c2w in path[::7]:
            # camera sits at radius 4 and its -z axis points at the origin
            assert np.linalg.norm(c2w[:3, 3]) == pytest.approx(4.0, abs=1e-5)
            fwd = -c2w[:3, 2]
            to_origin = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
            assert fwd @ to_origin == pytest.approx(1.0, abs=1e-5)

    def test_circle_path_looks_at_center(self):
        path = circle_path(radius=3.0, h=0.5, frames=20)
        assert path.shape == (20, 4, 4)
        for c2w in path[::5]:
            fwd = c2w[:3, :3] @ np.array([0, 0, 1.0])  # camera +z column
            to_c = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
            assert fwd @ to_c == pytest.approx(1.0, abs=1e-5)

    def test_spiral_shape(self):
        poses = np.stack(
            [np.concatenate([np.eye(3), [[0.2 * i], [0], [0.5]]], 1) for i in range(5)]
        )
        nf = np.tile([[1.0, 5.0]], (5, 1))
        path = get_spiral(poses, nf, n_views=120)
        assert path.shape == (120, 4, 4)
        assert np.isfinite(path).all()

    def test_direction_grids(self):
        d_cv = get_ray_directions(4, 6, [10.0, 10.0])
        d_bl = get_ray_directions_blender(4, 6, [10.0, 10.0])
        assert d_cv.shape == (4, 6, 3)
        # conventions: z sign flips, y sign flips
        np.testing.assert_allclose(d_cv[..., 2], 1.0)
        np.testing.assert_allclose(d_bl[..., 2], -1.0)
        np.testing.assert_allclose(d_cv[..., 1], -d_bl[..., 1], atol=1e-6)

    def test_ndc_near_plane_origin(self):
        # rays starting behind the near plane land on o_z = -1 after shift
        o = np.array([[0.0, 0.0, -0.5]], np.float32)
        d = np.array([[0.0, 0.0, -1.0]], np.float32)
        no, nd = ndc_rays_blender(8, 8, 10.0, 1.0, o, d)
        assert no[0, 2] == pytest.approx(-1.0, abs=1e-6)
        assert np.isfinite(nd).all()


class TestSyntheticScene:
    def test_field_contract(self):
        pts = np.random.default_rng(0).uniform(-1.5, 1.5, (100, 3)).astype(np.float32)
        sigma, rgb = _field(pts)
        assert sigma.shape == (100,) and rgb.shape == (100, 3)
        assert (sigma >= 0).all()
        assert (rgb >= 0).all() and (rgb <= 1).all()

    def test_field_compact_occupancy(self):
        # the sigma>1 region (what the alpha mask keeps) must be a compact
        # minority of the bbox, so masked-stage compaction is exercised
        lin = np.linspace(-1.5, 1.5, 64, dtype=np.float32)
        pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1).reshape(-1, 3)
        sigma, _ = _field(pts)
        frac = float((sigma > 1.0).mean())
        assert 0.001 < frac < 0.15, frac

    def test_train_test_views_differ(self):
        tr = make_synthetic_dataset("train", n_views=4, wh=(16, 16))
        te = make_synthetic_dataset("test", n_views=2, wh=(16, 16))
        assert tr.all_rays.shape == (4 * 256, 6)
        assert te.is_stack and te.all_rays.shape == (2, 256, 6)
        # no test camera coincides with a train camera
        tr_pos = tr.poses[:, :3, 3]
        te_pos = te.poses[:, :3, 3]
        d = np.linalg.norm(tr_pos[:, None] - te_pos[None], axis=-1)
        assert d.min() > 0.1

    def test_gt_images_have_signal(self):
        ds = make_synthetic_dataset("train", n_views=2, wh=(24, 24))
        imgs = ds.all_rgbs.reshape(2, 24 * 24, 3)
        assert imgs.std() > 0.05  # not all-white
        assert imgs.max() <= 1.0 and imgs.min() >= 0.0


class TestOrbaxCheckpointBackend:
    def test_roundtrip_matches_npz(self, tmp_path):
        import os

        from ngf_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

        rng = np.random.default_rng(0)
        params = {
            "plane": rng.normal(size=(8, 8, 3)).astype(np.float32),
            "mlp": {"layers": [{"w": rng.normal(size=(4, 4)).astype(np.float32),
                                "b": np.zeros(4, np.float32)}]},
        }
        vol = (rng.uniform(size=(5, 6, 7)) > 0.5).astype(np.float32)
        aabb = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)

        p_npz = os.path.join(tmp_path, "m.npz")
        p_orb = os.path.join(tmp_path, "m_orbax")
        save_checkpoint(p_npz, params, {"x": 3}, vol, aabb)
        save_checkpoint(p_orb, params, {"x": 3}, vol, aabb, backend="orbax")

        for p in (p_npz, p_orb):
            pr, meta, v2, a2 = load_checkpoint(p)
            assert meta["x"] == 3
            np.testing.assert_array_equal(pr["plane"], params["plane"])
            np.testing.assert_array_equal(
                pr["mlp"]["layers"][0]["w"], params["mlp"]["layers"][0]["w"]
            )
            np.testing.assert_array_equal(v2, vol)
            np.testing.assert_array_equal(a2, aabb)
