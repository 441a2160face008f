"""Parity tests of core ops against torch (CPU) as the oracle.

The reference implementation is pure PyTorch; torch (cpu) is available in the
test environment, so these tests implement the reference formulas in torch
directly (from the cited file:line locations) and compare bit-for-bit-ish.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from ngf_tpu.ops import (  # noqa: E402
    positional_encoding,
    infoinv_modulate,
    grid_sample_2d,
    grid_sample_3d,
    resize_bilinear_2d,
    max_pool_3d,
    ray_aabb_tmin,
    stratified_sample,
    cube_ray_generation,
    sample_pdf,
    raw2alpha,
    ray_march,
)

RNG = np.random.default_rng(0)


def torch_positional_encoding(positions, freqs):
    # InfoInv/models/networks.py:227-237
    freq_bands = (2 ** torch.arange(freqs).float())
    pts = (positions[..., None] * freq_bands).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return torch.cat([torch.sin(pts), torch.cos(pts)], dim=-1)


class TestPositionalEncoding:
    def test_matches_reference_layout(self):
        x = RNG.standard_normal((17, 3)).astype(np.float32)
        for freqs in (2, 4, 10, 12):
            got = np.asarray(positional_encoding(jnp.asarray(x), freqs))
            want = torch_positional_encoding(torch.from_numpy(x), freqs).numpy()
            np.testing.assert_allclose(got, want, atol=2e-6)

    def test_infoinv_modulate(self):
        xyz = RNG.uniform(-1, 1, (11, 3)).astype(np.float32)
        feat = RNG.standard_normal((11, 24)).astype(np.float32)
        got = np.asarray(infoinv_modulate(jnp.asarray(feat), jnp.asarray(xyz), 4))
        want = (
            torch.from_numpy(feat)
            * torch_positional_encoding(torch.from_numpy(xyz), 4)
        ).numpy()
        np.testing.assert_allclose(got, want, atol=2e-6)

    def test_infoinv_channel_mismatch_raises(self):
        with pytest.raises(ValueError):
            infoinv_modulate(jnp.zeros((4, 25)), jnp.zeros((4, 3)), 4)


class TestGridSample2D:
    @pytest.mark.parametrize("hw", [(8, 8), (13, 7), (256, 256)])
    def test_in_range_parity(self, hw):
        h, w = hw
        c = 6
        plane = RNG.standard_normal((h, w, c)).astype(np.float32)
        coords = RNG.uniform(-1, 1, (301, 2)).astype(np.float32)

        got = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))

        t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]  # (1,C,H,W)
        t_grid = torch.from_numpy(coords).view(1, -1, 1, 2)
        want = (
            TF.grid_sample(t_plane, t_grid, align_corners=True)
            .view(c, -1)
            .T.numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_out_of_range_zero_padding(self):
        plane = RNG.standard_normal((16, 16, 4)).astype(np.float32)
        coords = RNG.uniform(-2.5, 2.5, (200, 2)).astype(np.float32)
        got = np.asarray(grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords)))
        t_plane = torch.from_numpy(plane).permute(2, 0, 1)[None]
        t_grid = torch.from_numpy(coords).view(1, -1, 1, 2)
        want = (
            TF.grid_sample(t_plane, t_grid, align_corners=True, padding_mode="zeros")
            .view(4, -1)
            .T.numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_batched_leading_dims(self):
        plane = RNG.standard_normal((9, 9, 3)).astype(np.float32)
        coords = RNG.uniform(-1, 1, (4, 5, 2)).astype(np.float32)
        got = grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords))
        assert got.shape == (4, 5, 3)
        flat = grid_sample_2d(jnp.asarray(plane), jnp.asarray(coords.reshape(-1, 2)))
        np.testing.assert_allclose(np.asarray(got).reshape(-1, 3), np.asarray(flat), atol=1e-6)

    def test_grad_flows(self):
        plane = jnp.asarray(RNG.standard_normal((8, 8, 2)).astype(np.float32))
        coords = jnp.asarray(RNG.uniform(-0.9, 0.9, (10, 2)).astype(np.float32))
        g = jax.grad(lambda p, c: jnp.sum(grid_sample_2d(p, c) ** 2), argnums=(0, 1))(
            plane, coords
        )
        assert np.isfinite(np.asarray(g[0])).all()
        assert np.isfinite(np.asarray(g[1])).all()
        assert np.abs(np.asarray(g[0])).sum() > 0


class TestGridSample3D:
    def test_parity_with_torch(self):
        d, h, w, c = 9, 7, 11, 2
        vol = RNG.standard_normal((d, h, w, c)).astype(np.float32)
        coords = RNG.uniform(-1.3, 1.3, (250, 3)).astype(np.float32)
        got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(coords)))

        t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1,C,D,H,W)
        t_grid = torch.from_numpy(coords).view(1, -1, 1, 1, 3)
        want = (
            TF.grid_sample(t_vol, t_grid, align_corners=True)
            .view(c, -1)
            .T.numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_alpha_mask_style_lookup(self):
        # Mirrors AlphaGridMask.sample_alpha (InfoInv/models/FieldBase.py:33-37):
        # a (1,1,D,H,W) binary volume sampled at (x,y,z) normalized coords.
        vol = (RNG.uniform(0, 1, (16, 16, 16)) > 0.5).astype(np.float32)
        coords = RNG.uniform(-1, 1, (123, 3)).astype(np.float32)
        got = np.asarray(
            grid_sample_3d(jnp.asarray(vol)[..., None], jnp.asarray(coords))
        )[..., 0]
        t_vol = torch.from_numpy(vol)[None, None]
        t_grid = torch.from_numpy(coords).view(1, -1, 1, 1, 3)
        want = TF.grid_sample(t_vol, t_grid, align_corners=True).view(-1).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)


class TestResizeAndPool:
    @pytest.mark.parametrize("shape", [((8, 8), (16, 16)), ((16, 12), (9, 23)), ((256, 256), (300, 300))])
    def test_resize_parity(self, shape):
        (h, w), (nh, nw) = shape
        plane = RNG.standard_normal((h, w, 3)).astype(np.float32)
        got = np.asarray(resize_bilinear_2d(jnp.asarray(plane), (nh, nw)))
        t = torch.from_numpy(plane).permute(2, 0, 1)[None]
        want = (
            TF.interpolate(t, size=(nh, nw), mode="bilinear", align_corners=True)[0]
            .permute(1, 2, 0)
            .numpy()
        )
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_max_pool3d_parity(self):
        vol = RNG.standard_normal((12, 13, 14)).astype(np.float32)
        got = np.asarray(max_pool_3d(jnp.asarray(vol), 3))
        want = TF.max_pool3d(
            torch.from_numpy(vol)[None, None], kernel_size=3, padding=1, stride=1
        )[0, 0].numpy()
        np.testing.assert_allclose(got, want, atol=1e-6)


def torch_raw2alpha(sigma, dist):
    # InfoInv/models/FieldBase.py:12-19
    alpha = 1.0 - torch.exp(-sigma * dist)
    t = torch.cumprod(
        torch.cat([torch.ones(alpha.shape[0], 1), 1.0 - alpha + 1e-10], -1), -1
    )
    weights = alpha * t[:, :-1]
    return alpha, weights, t[:, -1:]


class TestCompositing:
    def test_raw2alpha_parity(self):
        sigma = np.abs(RNG.standard_normal((32, 40))).astype(np.float32) * 3
        dist = np.abs(RNG.standard_normal((32, 40))).astype(np.float32) * 0.1
        a, w, bg = raw2alpha(jnp.asarray(sigma), jnp.asarray(dist))
        ta, tw, tbg = torch_raw2alpha(torch.from_numpy(sigma), torch.from_numpy(dist))
        np.testing.assert_allclose(np.asarray(a), ta.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(w), tw.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bg), tbg.numpy(), atol=1e-5)

    def test_weights_sum_bounded(self):
        sigma = np.abs(RNG.standard_normal((8, 100))).astype(np.float32) * 10
        dist = np.full((8, 100), 0.05, np.float32)
        _, w, bg = raw2alpha(jnp.asarray(sigma), jnp.asarray(dist))
        total = np.asarray(w).sum(-1) + np.asarray(bg)[:, 0]
        np.testing.assert_allclose(total, 1.0, atol=1e-4)

    def test_ray_march_parity(self):
        # UV-Mapping/model/renderer.py:176-247 with radiance_render/alpha_blend.
        b, r, s = 2, 6, 20
        feats = RNG.standard_normal((b, r, s, 4)).astype(np.float32)
        feats[..., 0] = np.abs(feats[..., 0])
        dist = np.abs(RNG.standard_normal((b, r, s))).astype(np.float32) * 0.1
        valid = (RNG.uniform(0, 1, (b, r, s)) > 0.3).astype(np.float32)

        color, opacity, acc_t, bw, bg_bw = ray_march(
            jnp.asarray(dist), jnp.asarray(valid), jnp.asarray(feats)
        )

        tf_ = torch.from_numpy(feats)
        sigma = tf_[..., 0] * torch.from_numpy(valid)
        t_op = 1 - torch.exp(-sigma * torch.from_numpy(dist))
        acc = torch.cumprod(1.0 - t_op + 1e-10, dim=-1)
        bg_t = acc[:, :, -1]
        acc = torch.cat([torch.ones(b, r, 1), acc[:, :, :-1]], dim=-1)
        blend = t_op * acc
        want_color = torch.sum(tf_[..., 1:4] * blend[..., None], dim=-2)

        np.testing.assert_allclose(np.asarray(color), want_color.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(opacity), t_op.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc_t), acc.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bw), blend.numpy(), atol=1e-5)
        np.testing.assert_allclose(np.asarray(bg_bw), bg_t.numpy(), atol=1e-5)


class TestRays:
    def _torch_tmin(self, rays_o, rays_d, aabb, near, far):
        # InfoInv/models/FieldBase.py:122-125
        vec = torch.where(rays_d == 0, torch.full_like(rays_d, 1e-6), rays_d)
        rate_a = (aabb[1] - rays_o) / vec
        rate_b = (aabb[0] - rays_o) / vec
        return torch.minimum(rate_a, rate_b).amax(-1).clamp(min=near, max=far)

    def test_tmin_parity(self):
        rays_o = RNG.uniform(-4, 4, (64, 3)).astype(np.float32)
        rays_d = RNG.standard_normal((64, 3)).astype(np.float32)
        rays_d /= np.linalg.norm(rays_d, axis=-1, keepdims=True)
        rays_d[0, 1] = 0.0  # exercise the zero-direction substitution
        aabb = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
        got = np.asarray(
            ray_aabb_tmin(jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(aabb), 2.0, 6.0)
        )
        want = self._torch_tmin(
            torch.from_numpy(rays_o), torch.from_numpy(rays_d), torch.from_numpy(aabb), 2.0, 6.0
        ).numpy()
        np.testing.assert_allclose(got, want, atol=1e-5)

    def test_stratified_eval_deterministic(self):
        rays_o = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (5, 1))
        rays_d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (5, 1))
        aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], dtype=jnp.float32)
        pts, z, inb = stratified_sample(
            None, jnp.asarray(rays_o), jnp.asarray(rays_d), aabb, 2.0, 6.0, 100, 0.03, False
        )
        assert pts.shape == (5, 100, 3)
        # entry at z=-1.5 -> t=2.5; steps of 0.03
        np.testing.assert_allclose(np.asarray(z)[0, 0], 2.5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(z)[0, 1] - np.asarray(z)[0, 0], 0.03, atol=1e-6)
        # all sampled points along this ray interior of box until exit at t=5.5
        inside = np.asarray(inb)[0]
        z0 = np.asarray(z)[0]
        np.testing.assert_array_equal(inside, (z0 >= 2.5 - 1e-6) & (z0 <= 5.5 + 1e-6))

    def test_stratified_train_jitter_within_step(self):
        key = jax.random.PRNGKey(0)
        rays_o = np.tile(np.array([[0.0, 0.0, -4.0]], np.float32), (64, 1))
        rays_d = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (64, 1))
        aabb = jnp.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], dtype=jnp.float32)
        _, z, _ = stratified_sample(
            key, jnp.asarray(rays_o), jnp.asarray(rays_d), aabb, 2.0, 6.0, 10, 0.03, True
        )
        z = np.asarray(z)
        offsets = (z[:, 0] - 2.5) / 0.03
        assert (offsets >= 0).all() and (offsets < 1).all()
        assert np.std(offsets) > 0.01  # actually jittered
        # per-ray jitter is constant across samples
        np.testing.assert_allclose(z[:, 1] - z[:, 0], 0.03, atol=1e-6)

    def test_cube_ray_generation_matches_torch_formula(self):
        # Deterministic case (jitter=0) against the reference formula
        # (UV-Mapping/model/renderer.py:79-141).
        campos = np.array([[0.0, 0.0, -3.0]], np.float32)
        raydir = np.array([[[0.0, 0.0, 1.0], [0.577, 0.577, 0.577]]], np.float32)
        raypos, seg, valid, ts = cube_ray_generation(
            None, jnp.asarray(campos), jnp.asarray(raydir), 16, 1.0, 0.0
        )
        assert raypos.shape == (1, 2, 16, 3)
        dt = 2.0 / 16
        np.testing.assert_allclose(np.asarray(seg), dt, atol=1e-6)
        # first ray enters cube at t=2: midpoints start at 2 + dt/2
        np.testing.assert_allclose(np.asarray(ts)[0, 0, 0], 2.0 + dt / 2, atol=1e-5)
        got_valid = np.asarray(valid)[0, 0]
        z = np.asarray(raypos)[0, 0, :, 2]
        np.testing.assert_array_equal(got_valid, (np.abs(z) < 1.0))

    def test_sample_pdf_det_concentrates_mass(self):
        bins = jnp.linspace(0.0, 1.0, 11)[None].repeat(4, axis=0)  # (4, 11)
        weights = jnp.zeros((4, 10)).at[:, 5].set(100.0)
        samples = sample_pdf(None, bins, weights, 32, det=True)
        s = np.asarray(samples)
        # nearly all samples should land inside the heavy bin [0.5, 0.6]
        frac = ((s >= 0.45) & (s <= 0.65)).mean()
        assert frac > 0.9
