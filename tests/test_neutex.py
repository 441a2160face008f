"""UV-Mapping (NeuTex) subsystem tests: shapes, losses, training, export."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ngf_tpu.fields.neutex import (
    NeuTexConfig,
    export_texture,
    init_neutex,
    neutex_forward,
    neutex_losses,
    template_random_points,
    template_regular_points,
)
from ngf_tpu.data.dtu import SyntheticDtuDataset
from ngf_tpu.train.uv_loop import UVTrainer
from ngf_tpu.utils.cubemap import (
    convert_cube_uv_to_xyz,
    merge_cube_to_single_texture,
    sample_cubemap,
    sample_square,
    icosphere,
)

CFG_SQ = NeuTexConfig(primitive_type="square", sample_num=16, points_per_primitive=64)
CFG_SP = NeuTexConfig(primitive_type="sphere", sample_num=16, points_per_primitive=64)


class TestComponents:
    def test_param_shapes(self):
        p = init_neutex(jax.random.PRNGKey(0), CFG_SQ)
        # GeometryMlp: input 3+60 -> 256, 11 hidden, final 1 (decoder.py:201-217)
        geo = p["net_geometry_decoder"]["layers"]
        assert geo[0]["w"].shape == (63, 256)
        assert geo[-1]["w"].shape == (256, 1)
        assert len(geo) == 12
        # GaugeNetwork: 63 -> 64 -> 128 -> 128 -> 128 -> 2
        gauge = p["gauge_network"]["layers"]
        assert gauge[0]["w"].shape == (63, 64)
        assert gauge[-1]["w"].shape == (128, 2)
        # InverseNetwork: 2 -> 64 -> 512 ... -> 3
        inv = p["inverse_network"]["layers"]
        assert inv[0]["w"].shape == (2, 64)
        assert inv[-1]["w"].shape == (512, 3)
        # Texture block1 input: 2 + 2*2*10 = 42
        assert p["net_texture"]["block1"]["layers"][0]["w"].shape == (42, 256)
        # block2 input: 256 + 3 + 36
        assert p["net_texture"]["block2"]["layers"][0]["w"].shape == (295, 256)

    def test_sphere_uv_dim(self):
        p = init_neutex(jax.random.PRNGKey(0), CFG_SP)
        assert p["gauge_network"]["layers"][-1]["w"].shape == (128, 3)
        assert p["inverse_network"]["layers"][0]["w"].shape == (3, 64)

    def test_templates(self):
        sq = template_random_points(jax.random.PRNGKey(0), CFG_SQ, 100)
        assert sq.shape == (100, 2)
        assert float(jnp.abs(sq).max()) <= 1.0
        sp = template_random_points(jax.random.PRNGKey(0), CFG_SP, 100)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(sp), axis=-1), 1.0, atol=1e-5
        )
        reg = template_regular_points(CFG_SQ, 64)
        assert reg.shape == (64, 2)
        ico = template_regular_points(CFG_SP)
        np.testing.assert_allclose(np.linalg.norm(ico, axis=-1), 1.0, atol=1e-5)

    def test_forward_output_contract(self):
        p = init_neutex(jax.random.PRNGKey(0), CFG_SQ)
        campos = jnp.asarray([[0.0, 0.0, -2.5]])
        d = np.random.default_rng(0).normal(size=(1, 32, 3)).astype(np.float32)
        d = d * 0.1 + np.array([0, 0, 1], np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        out = neutex_forward(
            p, CFG_SQ, jax.random.PRNGKey(1), campos, jnp.asarray(d),
            jnp.zeros((1, 3)),
        )
        assert out["color"].shape == (1, 32, 3)
        assert out["transmittance"].shape == (1, 32)
        assert out["points"].shape == (1, 3, 64)
        assert out["points_original"].shape == (1, 32, 16, 3)
        assert out["points_inverse"].shape == (1, 32, 16, 3)
        assert out["uv"].shape == (1, 32, 16, 2)
        assert float(jnp.abs(out["uv"]).max()) <= 1.0  # tanh
        for v in out.values():
            assert np.isfinite(np.asarray(v)).all()

    def test_losses_finite_and_weighted(self):
        p = init_neutex(jax.random.PRNGKey(0), CFG_SQ)
        campos = jnp.asarray([[0.0, 0.0, -2.5]])
        d = jnp.asarray([[[0.0, 0.0, 1.0]] * 8])
        out = neutex_forward(p, CFG_SQ, jax.random.PRNGKey(1), campos, d, jnp.zeros((1, 3)))
        gt = jnp.zeros((1, 8, 3))
        trans = jnp.ones((1, 8))
        total, losses = neutex_losses(
            out, gt, trans,
            {"color": 1.0, "bg": 1.0, "origin": 1.0, "inverse_mapping": 0.5},
        )
        assert set(losses) == {"color", "bg", "origin", "inverse_mapping", "total"}
        assert np.isfinite(float(total))


class TestCubemap:
    def test_uv_xyz_on_unit_sphere(self):
        uv = jnp.asarray(np.random.default_rng(0).uniform(-1, 1, (50, 2)).astype(np.float32))
        for face in range(6):
            xyz = convert_cube_uv_to_xyz(face, uv)
            np.testing.assert_allclose(
                np.linalg.norm(np.asarray(xyz), axis=-1), 1.0, atol=1e-5
            )

    def test_sample_cubemap_face_selection(self):
        # constant-color faces: sampling along each axis returns that face's color
        cube = np.zeros((6, 8, 8, 3), np.float32)
        for f in range(6):
            cube[f, :, :, :] = f / 10.0
        cube = jnp.asarray(cube)
        dirs = jnp.asarray(
            [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
            dtype=jnp.float32,
        )
        got = np.asarray(sample_cubemap(cube, dirs))
        np.testing.assert_allclose(got[:, 0], np.arange(6) / 10.0, atol=1e-6)

    def test_sample_square_matches_torch(self):
        torch = pytest.importorskip("torch")
        import torch.nn.functional as TF

        rng = np.random.default_rng(0)
        tex = rng.uniform(size=(16, 16, 3)).astype(np.float32)
        uv = rng.uniform(-1.2, 1.2, (64, 2)).astype(np.float32)
        got = np.asarray(sample_square(jnp.asarray(tex), jnp.asarray(uv)))
        want = (
            TF.grid_sample(
                torch.from_numpy(tex).permute(2, 0, 1)[None],
                torch.from_numpy(uv).view(1, -1, 1, 2),
                padding_mode="border",
                align_corners=False,
            )
            .permute(0, 2, 3, 1)
            .reshape(-1, 3)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_merge_cube_shape(self):
        cube = np.random.default_rng(0).uniform(size=(6, 16, 16, 3)).astype(np.float32)
        cross = merge_cube_to_single_texture(cube)
        assert cross.shape == (48, 64, 3)

    def test_icosphere(self):
        v = icosphere(2)
        assert v.shape[0] == 162  # 10*4^2+2
        np.testing.assert_allclose(np.linalg.norm(v, axis=-1), 1.0, atol=1e-6)


class TestUVTraining:
    @pytest.fixture(scope="class")
    def dataset(self):
        return SyntheticDtuDataset(
            n_views=4, wh=(32, 32), random_sample="balanced",
            random_sample_size=12, seed=0,
        )

    def test_training_reduces_loss(self, dataset):
        cfg = NeuTexConfig(
            primitive_type="square", sample_num=24, points_per_primitive=64,
            geo_layers=2, tex_layers1=1, tex_layers2=1, tex_width=64,
            geo_hidden=64, inverse_hidden=64,
        )
        trainer = UVTrainer(cfg, dataset, lr=5e-4, niter=1000, seed=0)
        first = None
        last = None
        for i in range(120):
            losses = trainer.train_step(dataset.sample())
            if first is None:
                first = losses["color"]
            last = losses["color"]
        assert last < 0.8 * first, f"color loss did not drop: {first} -> {last}"

    def test_render_view_and_texture_export(self, dataset, tmp_path):
        cfg = NeuTexConfig(
            primitive_type="square", sample_num=16, points_per_primitive=64,
            geo_layers=1, tex_layers1=1, tex_layers2=1, tex_width=32,
            geo_hidden=32, inverse_hidden=32,
        )
        trainer = UVTrainer(cfg, dataset, save_dir=str(tmp_path))
        idx = 0
        rgb, trans = trainer.render_view(
            dataset.campos[idx], dataset.height, dataset.width,
            dataset.focal[idx], dataset.extrinsics[idx][0:3, 0:3],
            dataset.princpt[idx], chunk=256,
        )
        assert rgb.shape == (32, 32, 3)
        assert trans.shape == (32, 32)
        tex = np.asarray(export_texture(trainer.params, cfg, resolution=16))
        assert tex.shape == (16, 16, 3)

    def test_sphere_texture_export(self, dataset):
        cfg = NeuTexConfig(
            primitive_type="sphere", sample_num=8, points_per_primitive=64,
            geo_layers=1, tex_layers1=1, tex_layers2=1, tex_width=32,
            geo_hidden=32, inverse_hidden=32,
        )
        trainer = UVTrainer(cfg, dataset)
        faces = np.asarray(export_texture(trainer.params, cfg, resolution=8))
        assert faces.shape == (6, 8, 8, 3)
        cross = merge_cube_to_single_texture(faces)
        assert cross.shape == (24, 32, 3)

    def test_sphere_primitive_training(self, dataset):
        cfg = NeuTexConfig(
            primitive_type="sphere", sample_num=16, points_per_primitive=64,
            geo_layers=1, tex_layers1=1, tex_layers2=1, tex_width=32,
            geo_hidden=32, inverse_hidden=32,
        )
        trainer = UVTrainer(cfg, dataset, lr=5e-4, seed=0)
        losses = [trainer.train_step(dataset.sample())["total"] for _ in range(6)]
        assert all(np.isfinite(losses))
        # sphere gauge output is unit-norm 3D uv
        import jax
        from ngf_tpu.fields.neutex import neutex_forward

        out = neutex_forward(
            trainer.params, cfg, jax.random.PRNGKey(0),
            jnp.asarray(dataset.campos[:1]),
            jnp.asarray(dataset.get_item(0)["raydir"]),
            jnp.zeros((1, 3)),
        )
        norms = np.linalg.norm(np.asarray(out["uv"]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)

    def test_freeze_subnetwork(self, dataset):
        cfg = NeuTexConfig(
            primitive_type="square", sample_num=8, points_per_primitive=64,
            geo_layers=1, tex_layers1=1, tex_layers2=1, tex_width=32,
            geo_hidden=32, inverse_hidden=32,
        )
        trainer = UVTrainer(cfg, dataset, lr=1e-3, freeze=["gauge"], seed=0)
        g_before = np.asarray(trainer.params["gauge_network"]["layers"][0]["w"]).copy()
        t_before = np.asarray(trainer.params["net_texture"]["color1"]["w"]).copy()
        for _ in range(3):
            trainer.train_step(dataset.sample())
        np.testing.assert_array_equal(
            g_before, np.asarray(trainer.params["gauge_network"]["layers"][0]["w"])
        )
        assert not np.array_equal(
            t_before, np.asarray(trainer.params["net_texture"]["color1"]["w"])
        )

    def test_subnetwork_checkpoint_roundtrip(self, dataset, tmp_path):
        cfg = NeuTexConfig(
            primitive_type="square", sample_num=8, points_per_primitive=64,
            geo_layers=1, tex_layers1=1, tex_layers2=1, tex_width=32,
            geo_hidden=32, inverse_hidden=32,
        )
        t1 = UVTrainer(cfg, dataset, save_dir=str(tmp_path), seed=0)
        t1.train_step(dataset.sample())
        t1.save_networks("latest", {"total_steps": 1})
        assert os.path.exists(os.path.join(tmp_path, "latest_net_NeuTex.npz"))
        assert os.path.exists(os.path.join(tmp_path, "latest_subnet_gauge.npz"))

        t2 = UVTrainer(cfg, dataset, save_dir=str(tmp_path), seed=1)
        t2.load_networks("latest")
        np.testing.assert_array_equal(
            np.asarray(t1.params["gauge_network"]["layers"][0]["w"]),
            np.asarray(t2.params["gauge_network"]["layers"][0]["w"]),
        )
        # Full-fidelity resume: optimizer moments + PRNG key restored (the
        # reference's continue_train reloads nets only, model.py:175-197).
        import jax as _jax

        for a, b in zip(_jax.tree.leaves(t1.opt_state), _jax.tree.leaves(t2.opt_state)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        np.testing.assert_array_equal(np.asarray(t1.key), np.asarray(t2.key))
        # partial subnetwork load
        t3 = UVTrainer(cfg, dataset, save_dir=str(tmp_path), seed=2)
        before = np.asarray(t3.params["net_texture"]["color1"]["w"]).copy()
        t3.load_subnetworks("latest", ["texture"])
        after = np.asarray(t3.params["net_texture"]["color1"]["w"])
        np.testing.assert_array_equal(
            after, np.asarray(t1.params["net_texture"]["color1"]["w"])
        )
        assert not np.array_equal(before, after)


class TestBfloat16:
    """compute_dtype='bfloat16' runs the MLP matmuls in bf16 (f32 masters,
    f32 accumulation); densities, compositing and losses stay f32. The
    forward must track the f32 path within bf16 resolution and a fused
    train block must step."""

    def test_forward_tracks_f32(self):
        import dataclasses

        cfg32 = NeuTexConfig(
            primitive_type="square", sample_num=16, points_per_primitive=64
        )
        cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
        params = init_neutex(jax.random.PRNGKey(3), cfg32)
        key = jax.random.PRNGKey(7)
        campos = jnp.asarray([[0.0, 0.0, 2.5]])
        rd = jnp.asarray([[[0.01, -0.02, -1.0], [0.05, 0.02, -1.0]]])
        rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
        bg = jnp.zeros((1, 3))
        out32 = neutex_forward(params, cfg32, key, campos, rd, bg)
        out16 = neutex_forward(params, cfg16, key, campos, rd, bg)
        for name in ("color", "transmittance"):
            a, b = np.asarray(out32[name]), np.asarray(out16[name])
            assert a.dtype == b.dtype == np.float32
            assert np.abs(a - b).max() < 0.05, (name, np.abs(a - b).max())

    def test_train_block_steps(self):
        ds = SyntheticDtuDataset(
            n_views=2, wh=(24, 24), random_sample="balanced",
            random_sample_size=6, seed=0,
        )
        cfg = NeuTexConfig(
            primitive_type="square", sample_num=8, points_per_primitive=32,
            compute_dtype="bfloat16",
        )
        tr = UVTrainer(cfg, ds, lr=1e-4, niter=100, seed=0)
        losses = tr.train_block([ds.sample() for _ in range(3)])
        assert np.isfinite(losses["total"]).all()
        # masters stay f32
        leaf = jax.tree.leaves(tr.params)[0]
        assert leaf.dtype == jnp.float32
