"""Dataset loader tests against tiny generated fixtures on disk."""

import json
import os

import numpy as np
import pytest

from ngf_tpu.data import dataset_dict


def write_png(path, arr):
    import imageio.v2 as imageio

    imageio.imwrite(path, arr)


@pytest.fixture()
def blender_dir(tmp_path):
    rng = np.random.default_rng(0)
    for split in ("train", "test"):
        frames = []
        for i in range(3):
            theta = i * 2.0
            c2w = np.eye(4)
            c2w[:3, 3] = [np.sin(theta) * 4, 0.5, np.cos(theta) * 4]
            frames.append(
                {"file_path": f"./{split}/r_{i}", "transform_matrix": c2w.tolist()}
            )
            os.makedirs(tmp_path / split, exist_ok=True)
            img = rng.integers(0, 255, (16, 16, 4), dtype=np.uint8)
            write_png(tmp_path / split / f"r_{i}.png", img)
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump(meta, f)
    return str(tmp_path)


class TestBlender:
    def test_shapes_and_ray_norms(self, blender_dir):
        ds = dataset_dict["blender"](blender_dir, split="train", downsample=50.0)
        # 800/50 = 16
        assert ds.img_wh == (16, 16)
        assert ds.all_rays.shape == (3 * 16 * 16, 6)
        assert ds.all_rgbs.shape == (3 * 16 * 16, 3)
        norms = np.linalg.norm(ds.all_rays[:, 3:6], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)  # blender.py:52
        assert ds.white_bg and ds.near_far == (2.0, 6.0)

    def test_stacked_test_split(self, blender_dir):
        ds = dataset_dict["blender"](blender_dir, split="test", downsample=50.0)
        assert ds.is_stack
        assert ds.all_rays.shape == (3, 16 * 16, 6)
        assert ds.all_rgbs.shape == (3, 16, 16, 3)
        assert ds.render_path.shape[0] == 40

    def test_rgba_white_composite(self, tmp_path):
        # A fully transparent pixel must become white (blender.py:80).
        os.makedirs(tmp_path / "train", exist_ok=True)
        img = np.zeros((16, 16, 4), np.uint8)
        write_png(tmp_path / "train" / "r_0.png", img)
        meta = {
            "camera_angle_x": 0.69,
            "frames": [{"file_path": "./train/r_0", "transform_matrix": np.eye(4).tolist()}],
        }
        with open(tmp_path / "transforms_train.json", "w") as f:
            json.dump(meta, f)
        ds = dataset_dict["blender"](str(tmp_path), split="train", downsample=50.0)
        np.testing.assert_allclose(ds.all_rgbs, 1.0, atol=1e-6)


@pytest.fixture()
def nsvf_dir(tmp_path):
    rng = np.random.default_rng(1)
    np.savetxt(tmp_path / "bbox.txt", np.array([[-1, -1, -1, 1, 1, 1, 0.01]]))
    with open(tmp_path / "intrinsics.txt", "w") as f:
        f.write("555.0 400.0 400.0 0.\n0. 0. 0.\n")
    os.makedirs(tmp_path / "pose")
    os.makedirs(tmp_path / "rgb")
    for prefix, n in (("0", 2), ("1", 1), ("2", 1)):
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 3 + i]
            np.savetxt(tmp_path / "pose" / f"{prefix}_{i:03d}.txt", c2w)
            img = rng.integers(0, 255, (8, 8, 4), dtype=np.uint8)
            write_png(tmp_path / "rgb" / f"{prefix}_{i:03d}.png", img)
    return str(tmp_path)


class TestNSVF:
    def test_splits_and_shapes(self, nsvf_dir):
        ds = dataset_dict["nsvf"](nsvf_dir, split="train", downsample=100.0, wh=(800, 800))
        assert ds.all_rays.shape == (2 * 8 * 8, 6)
        np.testing.assert_allclose(
            ds.scene_bbox, [[-1, -1, -1], [1, 1, 1]], atol=1e-6
        )
        ds_test = dataset_dict["nsvf"](nsvf_dir, split="test", downsample=100.0, wh=(800, 800))
        assert ds_test.all_rays.shape[0] == 1  # 2_ prefix


@pytest.fixture()
def llff_dir(tmp_path):
    rng = np.random.default_rng(2)
    n = 9
    poses = []
    for i in range(n):
        m = np.eye(4)[:3]
        m[:, 3] = [0.1 * i, 0, 0.5]
        # llff stores (down right back) conv + hwf column
        hwf = np.array([[16.0], [16.0], [20.0]])
        poses.append(np.concatenate([m, hwf], 1).reshape(-1))
    bounds = np.tile(np.array([[1.0, 5.0]]), (n, 1))
    pb = np.concatenate([np.stack(poses), bounds], 1)
    np.save(tmp_path / "poses_bounds.npy", pb)
    os.makedirs(tmp_path / "images_4")
    for i in range(n):
        write_png(
            tmp_path / "images_4" / f"img_{i:03d}.png",
            rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
        )
    return str(tmp_path)


class TestLLFF:
    def test_ndc_and_split(self, llff_dir):
        ds = dataset_dict["llff"](llff_dir, split="train", downsample=1.0)
        # hold-every-8 from 9 images -> 7 train (indices not 0 or 8)
        assert ds.n_images == 7
        assert ds.near_far == (0.0, 1.0)
        assert not ds.white_bg
        # NDC z components bounded
        assert np.isfinite(ds.all_rays).all()
        ds_test = dataset_dict["llff"](llff_dir, split="test", downsample=1.0)
        assert ds_test.all_rays.shape[0] == 2
        assert ds_test.render_path.shape[0] == 120


class TestOwnData:
    def test_ngp_style_json(self, tmp_path):
        rng = np.random.default_rng(3)
        os.makedirs(tmp_path / "train")
        frames = []
        for i in range(2):
            c2w = np.eye(4)
            c2w[:3, 3] = [0, 0, 3]
            frames.append({"file_path": f"./train/f_{i}", "transform_matrix": c2w.tolist()})
            write_png(
                tmp_path / "train" / f"f_{i}.png",
                rng.integers(0, 255, (12, 10, 3), dtype=np.uint8),
            )
        meta = {
            "w": 10, "h": 12, "cx": 5.0, "cy": 6.0,
            "camera_angle_x": 0.7, "camera_angle_y": 0.8,
            "frames": frames,
        }
        with open(tmp_path / "transforms_train.json", "w") as f:
            json.dump(meta, f)
        ds = dataset_dict["own_data"](str(tmp_path), split="train", downsample=1.0)
        assert ds.img_wh == (10, 12)
        assert ds.all_rays.shape == (2 * 120, 6)


class TestDTUSampling:
    def test_balanced_mode_targets(self):
        from ngf_tpu.data.dtu import SyntheticDtuDataset

        ds = SyntheticDtuDataset(
            n_views=2, wh=(24, 24), random_sample="balanced",
            random_sample_size=6, seed=0,
        )
        item = ds.get_item(0)
        assert item["raydir"].shape == (1, 36, 3)
        assert item["gt_image"].shape == (1, 36, 3)
        assert item["transmittance"].shape == (1, 36)
        # 2/3 foreground target 0, 1/3 background target 1 (dtu.py:198-223)
        t = item["transmittance"][0]
        assert (t[:24] == 0).all() and (t[24:] == 1).all()
        np.testing.assert_allclose(
            np.linalg.norm(item["raydir"][0], axis=-1), 1.0, atol=1e-3
        )

    def test_patch_and_no_crop_modes(self):
        from ngf_tpu.data.dtu import SyntheticDtuDataset

        for mode, n in (("patch", 16), ("random", 16), ("no_crop", 24 * 24)):
            ds = SyntheticDtuDataset(
                n_views=1, wh=(24, 24), random_sample=mode,
                random_sample_size=4, seed=0,
            )
            item = ds.get_item(0)
            assert item["raydir"].shape[1] == n


class TestRenderPathConventions:
    def test_nsvf_orbit_faces_scene(self, nsvf_dir):
        """Regression: the orbit poses must be converted to the loader's
        OpenCV direction convention or every path frame faces away."""
        from ngf_tpu.data.geometry import get_rays

        ds = dataset_dict["nsvf"](nsvf_dir, split="test", downsample=100.0, wh=(800, 800))
        center = ds.scene_bbox.mean(0)
        h, w = ds.directions.shape[:2]
        for c2w in ds.render_path[::13]:
            o, d = get_rays(ds.directions, c2w)
            mid = d[(h // 2) * w + w // 2]
            to_scene = center - o[0]
            cos = (mid @ to_scene) / (
                np.linalg.norm(mid) * np.linalg.norm(to_scene) + 1e-9
            )
            assert cos > 0.9, cos

    def test_llff_exposes_ndc_params(self, llff_dir):
        ds = dataset_dict["llff"](llff_dir, split="test", downsample=1.0)
        h, w, f, near = ds.ndc_params
        assert (w, h) == ds.img_wh and near == 1.0


class TestBalancedFallback:
    def test_all_foreground_mask_gets_fg_targets(self):
        from ngf_tpu.data.dtu import SyntheticDtuDataset

        ds = SyntheticDtuDataset(
            n_views=1, wh=(16, 16), random_sample="balanced",
            random_sample_size=6, seed=0,
        )
        ds.gt_mask[0][:] = 1.0  # no background anywhere
        item = ds.get_item(0)
        # every sampled pixel is foreground -> no transmittance-1 targets
        assert (item["transmittance"] == 0).all()


class TestABExportFormats:
    """The A/B harness export formats (tools/reference_ab.py) must
    round-trip through our loaders with exact ray parity vs the synthetic
    source — the same property verified against the REFERENCE loaders at
    1 ulp when the harness landed (PARITY.md). Guards the exporters and
    the nsvf/tankstemple/own_data loaders jointly."""

    def _gt(self, wh, views):
        from ngf_tpu.data.synthetic import SyntheticDataset

        return SyntheticDataset(
            split="train", n_views=views, wh=wh, is_stack=False
        )

    def test_nsvf_export_roundtrip(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.reference_ab import export_scene_nsvf

        export_scene_nsvf(str(tmp_path), 3, 1, 24, fmt="nsvf")
        ds = dataset_dict["nsvf"](
            str(tmp_path), split="train", downsample=800.0 / 24, is_stack=False
        )
        gt = self._gt((24, 24), 3)
        assert np.abs(ds.all_rays - gt.all_rays).max() < 1e-6
        assert np.abs(ds.all_rgbs - gt.all_rgbs).max() <= 1.0 / 255 + 1e-6
        # test split exists under the 2_ prefix
        test = dataset_dict["nsvf"](
            str(tmp_path), split="test", downsample=800.0 / 24
        )
        assert test.all_rgbs.shape[0] == 1

    def test_tankstemple_export_roundtrip(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.reference_ab import export_scene_nsvf

        export_scene_nsvf(str(tmp_path), 3, 1, 36, fmt="tankstemple")
        ds = dataset_dict["tankstemple"](
            str(tmp_path), split="train", downsample=30.0, is_stack=False
        )
        gt = self._gt((64, 36), 3)
        assert ds.img_wh == (64, 36)
        assert np.abs(ds.all_rays - gt.all_rays).max() < 1e-6
        assert np.abs(ds.all_rgbs - gt.all_rgbs).max() <= 1.0 / 255 + 1e-6

    def test_own_data_export_roundtrip(self, tmp_path):
        import sys

        sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
        from tools.reference_ab import export_scene_own

        export_scene_own(str(tmp_path), 3, 1, 24)
        ds = dataset_dict["own_data"](
            str(tmp_path), split="train", downsample=1.0, is_stack=False
        )
        gt = self._gt((24, 24), 3)
        assert np.abs(ds.all_rays - gt.all_rays).max() < 1e-6
        assert np.abs(ds.all_rgbs - gt.all_rgbs).max() <= 1.0 / 255 + 1e-6


class TestDtuHdf5:
    """Execute `DtuDataset`'s REAL on-disk branch (`ngf_tpu/data/dtu.py`,
    ref `UV-Mapping/data/dtu.py:65-114`) against a synthesized fixture in
    the exact reference layout (uint8 hdf5 images/masks + camera npys)."""

    N_VIEWS, WH = 8, (24, 24)
    TEST_VIEWS, EXCLUDE = "1,5", "6"

    @pytest.fixture(scope="class")
    def scene(self, tmp_path_factory):
        from ngf_tpu.data.dtu import SyntheticDtuDataset, write_dtu_scene

        syn = SyntheticDtuDataset(n_views=self.N_VIEWS, wh=self.WH)
        root = str(tmp_path_factory.mktemp("dtu_scene"))
        write_dtu_scene(root, syn, test_views=self.TEST_VIEWS,
                        exclude_views=self.EXCLUDE)
        return root, syn

    def test_image_and_mask_decode(self, scene):
        from ngf_tpu.data.dtu import DtuDataset

        root, syn = scene
        ds = DtuDataset(root)
        assert (ds.height, ds.width) == (self.WH[1], self.WH[0])
        assert ds.gt_image.shape == syn.gt_image.shape
        # uint8 roundtrip: within half a quantization step
        assert np.abs(ds.gt_image - syn.gt_image).max() <= 0.5 / 255 + 1e-6
        # masks are binary in the fixture; /255 must restore {0, 1}
        assert set(np.unique(ds.gt_mask)) <= {0.0, 1.0}
        np.testing.assert_array_equal(ds.gt_mask, syn.gt_mask)

    def test_holdout_and_exclude(self, scene):
        from ngf_tpu.data.dtu import DtuDataset

        root, _ = scene
        train = DtuDataset(root)
        assert train.indexes == [0, 2, 3, 4, 7]  # minus test {1,5}, excl {6}
        test = DtuDataset(root, use_test_data=True)
        assert test.indexes == [1, 5]
        # test_views.txt on disk takes precedence over the CLI string
        # (ref dtu.py:86-90)
        assert DtuDataset(root, use_test_data=True,
                          test_views="0,2").indexes == [1, 5]

    def test_cli_test_views_fallback(self, scene, tmp_path):
        """Without test_views.txt the CLI string decides the holdout."""
        import shutil

        from ngf_tpu.data.dtu import DtuDataset

        root, _ = scene
        alt = str(tmp_path / "scene2")
        shutil.copytree(root, alt)
        os.remove(os.path.join(alt, "trainData", "test_views.txt"))
        assert DtuDataset(alt, use_test_data=True,
                          test_views="0,2").indexes == [0, 2]

    def test_masks_absent_branch(self, scene, tmp_path):
        """No `in_masks` dataset -> gt_mask of ones (ref dtu.py:108-111)."""
        from ngf_tpu.data.dtu import DtuDataset, SyntheticDtuDataset, \
            write_dtu_scene

        syn = SyntheticDtuDataset(n_views=2, wh=(16, 16))
        root = str(tmp_path / "nomask")
        write_dtu_scene(root, syn, with_masks=False)
        ds = DtuDataset(root, test_views="1")
        assert (ds.gt_mask == 1.0).all()

    def test_balanced_sampling_uses_real_masks(self, scene):
        from ngf_tpu.data.dtu import DtuDataset

        root, syn = scene
        ds = DtuDataset(root, random_sample="balanced",
                        random_sample_size=6, seed=0)
        item = ds.get_item(0)
        view = ds.indexes[0]
        t = item["transmittance"][0]
        assert (t[:24] == 0).all() and (t[24:] == 1).all()
        # recover sampled pixel coords from the gt colors is ambiguous;
        # instead re-run the selection and check mask membership directly
        px, py, _ = ds._proportional_select(ds.gt_mask[view])
        fg = ds.gt_mask[view][py[:24].astype(int), px[:24].astype(int)]
        bg = ds.gt_mask[view][py[24:].astype(int), px[24:].astype(int)]
        assert (fg > 0).all() and (bg == 0).all()

    def test_no_crop_parity_with_synthetic(self, scene):
        """Same cameras, same view -> identical rays; colors within uint8
        quantization of the analytic renderer."""
        from ngf_tpu.data.dtu import DtuDataset

        root, syn = scene
        ds = DtuDataset(root, use_test_data=True)  # views [1, 5]
        got = ds.get_item(0)
        ref = syn.get_item(1)  # synthetic indexes are 0..N-1 identity
        np.testing.assert_allclose(got["raydir"], ref["raydir"],
                                   rtol=0, atol=1e-6)
        np.testing.assert_allclose(got["campos"], ref["campos"])
        assert np.abs(got["gt_image"] - ref["gt_image"]).max() \
            <= 0.5 / 255 + 1e-6

    def test_uv_trainer_smoke_on_hdf5_scene(self, scene):
        """Two optimizer steps of the real UV trainer fed by the hdf5
        branch (the uv_train.py `--dataset_name dtu` path)."""
        from ngf_tpu.data.dtu import DtuDataset
        from ngf_tpu.fields.neutex import NeuTexConfig
        from ngf_tpu.train.uv_loop import UVTrainer

        root, _ = scene
        ds = DtuDataset(root, random_sample="balanced",
                        random_sample_size=8, seed=0)
        cfg = NeuTexConfig(
            primitive_type="square", sample_num=8, points_per_primitive=16,
            geo_layers=1, tex_layers1=1, tex_layers2=1, tex_width=16,
            geo_hidden=16, inverse_hidden=16,
        )
        trainer = UVTrainer(cfg, ds, lr=1e-3, niter=10, seed=0)
        for _ in range(2):
            losses = trainer.train_step(ds.sample())
        assert all(np.isfinite(v) for v in losses.values())


@pytest.fixture()
def tankstemple_dir(tmp_path):
    """T&T (NSVF export) fixture: bbox.txt + full intrinsics matrix +
    0_/1_/2_ prefix splits (`InfoInv/dataLoader/tankstemple.py:86-130`)."""
    rng = np.random.default_rng(7)
    np.savetxt(tmp_path / "bbox.txt",
               np.array([[-0.5, -0.4, -0.3, 0.5, 0.6, 0.7, 0.01]]))
    intr = np.eye(4)
    intr[0, 0], intr[1, 1] = 100.0, 110.0
    intr[0, 2], intr[1, 2] = 16.0, 8.0
    np.savetxt(tmp_path / "intrinsics.txt", intr)
    os.makedirs(tmp_path / "pose")
    os.makedirs(tmp_path / "rgb")
    for prefix, n in (("0", 2), ("1", 1), ("2", 1)):
        for i in range(n):
            c2w = np.eye(4)
            c2w[:3, 3] = [0.2 * i, 0.1, 3.0]
            np.savetxt(tmp_path / "pose" / f"{prefix}_{i:03d}.txt", c2w)
            if prefix == "0" and i == 0:
                # constant RGBA for the alpha-blend golden value
                img = np.empty((8, 16, 4), np.uint8)
                img[..., :3] = [100, 150, 200]
                img[..., 3] = 128
            else:
                img = rng.integers(0, 255, (8, 16, 4), dtype=np.uint8)
            write_png(tmp_path / "rgb" / f"{prefix}_{i:03d}.png", img)
    return str(tmp_path)


class TestTanksTemple:
    """Dedicated loader test (ref `tankstemple.py:86-186`): bbox padding,
    intrinsics rescale, prefix splits + 2_->1_ fallback, RGBA white blend,
    ray-direction oracle, circular look-at render path golden values."""

    WH, DS = (32, 16), 2.0  # native 32x16, downsample 2 -> img_wh (16, 8)

    def _load(self, d, split="train"):
        return dataset_dict["tankstemple"](
            d, split=split, downsample=self.DS, wh=self.WH
        )

    def test_bbox_intrinsics_flags(self, tankstemple_dir):
        ds = self._load(tankstemple_dir)
        np.testing.assert_allclose(
            ds.scene_bbox,
            np.array([[-0.5, -0.4, -0.3], [0.5, 0.6, 0.7]]) * 1.2, atol=1e-6,
        )
        assert ds.near_far == (0.01, 6.0) and ds.white_bg
        # intr[:2] scaled by img_wh / wh (tankstemple.py:117)
        np.testing.assert_allclose(
            [ds.intrinsics[0, 0], ds.intrinsics[1, 1],
             ds.intrinsics[0, 2], ds.intrinsics[1, 2]],
            [50.0, 55.0, 8.0, 4.0],
        )

    def test_splits_and_fallback(self, tankstemple_dir):
        assert self._load(tankstemple_dir).all_rays.shape == (2 * 16 * 8, 6)
        assert self._load(tankstemple_dir, "val").all_rays.shape[0] == 1
        test = self._load(tankstemple_dir, "test")
        assert test.all_rays.shape == (1, 16 * 8, 6)  # stacked, 2_ prefix
        # remove 2_ files -> test split falls back to 1_ (tankstemple.py:127)
        import shutil

        alt = os.path.join(os.path.dirname(tankstemple_dir), "tt_no2")
        shutil.copytree(tankstemple_dir, alt)
        for sub in ("pose", "rgb"):
            for f in os.listdir(os.path.join(alt, sub)):
                if f.startswith("2_"):
                    os.remove(os.path.join(alt, sub, f))
        fb = self._load(alt, "test")
        assert fb.all_rays.shape[0] == 1
        onedir = self._load(tankstemple_dir, "val")  # stacked (1, 128, 6)
        np.testing.assert_allclose(fb.all_rays, onedir.all_rays, atol=1e-6)

    def test_alpha_blend_to_white(self, tankstemple_dir):
        ds = self._load(tankstemple_dir)
        a = 128.0 / 255.0
        want = np.array([100, 150, 200], np.float32) / 255.0 * a + (1 - a)
        got = ds.all_rgbs[: 16 * 8]  # first image is the constant one
        np.testing.assert_allclose(got, np.tile(want, (128, 1)), atol=1e-3)

    def test_ray_direction_oracle(self, tankstemple_dir):
        """Numpy oracle from the cited formulas (`ray_utils.py:24-86`):
        pixel-center grid, full-matrix principal point, normalized dirs
        rotated by c2w."""
        ds = self._load(tankstemple_dir)
        fx, fy = 50.0, 55.0
        cx, cy = 8.0, 4.0
        i, j = np.meshgrid(np.arange(16) + 0.5, np.arange(8) + 0.5)
        dirs = np.stack([(i - cx) / fx, (j - cy) / fy, np.ones_like(i)], -1)
        dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.0, 0.1, 3.0]  # first 0_ pose
        d = (dirs.reshape(-1, 3) @ c2w[:3, :3].T).astype(np.float32)
        np.testing.assert_allclose(ds.all_rays[:128, 3:], d, atol=1e-6)
        np.testing.assert_allclose(
            ds.all_rays[:128, :3], np.tile(c2w[:3, 3], (128, 1)), atol=1e-6
        )

    def test_circular_path_golden(self, tankstemple_dir):
        """Independent re-derivation of the reference's render path
        (`tankstemple.py:165-172` circle + gen_path look-at)."""
        ds = self._load(tankstemple_dir)
        assert ds.render_path.shape == (200, 4, 4)
        center = ds.scene_bbox.mean(0)
        radius = float(np.linalg.norm(ds.scene_bbox[1] - center)) * 1.2
        up = ds.poses[:, :3, 1].mean(0)  # identity rotations -> (0,1,0)
        h = -0.2 * float(up[1])

        def norm(v):
            return v / (np.linalg.norm(v) + 1e-8)

        for t in (0, 67, 133):
            ang = t * (360.0 / 200) * np.pi / 180.0
            pos = np.array([radius * np.cos(ang), h, radius * np.sin(ang)])
            z = norm(-pos)
            x = norm(np.cross(up, z))
            y = norm(np.cross(z, x))
            want = np.eye(4)
            want[:3, :3] = np.stack([x, y, z], 1)
            want[:3, 3] = pos + center
            np.testing.assert_allclose(ds.render_path[t], want, atol=1e-5)
