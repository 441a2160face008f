"""Full-forward parity: our dense-masked renderer vs the reference's ragged
torch pipeline, with IDENTICAL weights.

The torch side below re-implements the reference forward exactly as cited
(`InfoInv/models/FieldBase.py:228-282` + `InfoInv/models/Field.py:43-89` +
`InfoInv/models/networks.py:12-54`), loads OUR initialized parameters into
it, and compares rgb/depth maps. This is the strongest equivalence evidence
available without the (unreleased) reference checkpoints: same weights, same
rays, same math modulo ragged-vs-dense evaluation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from ngf_tpu.fields import TriPlaneConfig, init_triplane  # noqa: E402
from ngf_tpu.render import RenderConfig, render_rays  # noqa: E402

AABB = np.array([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)


def torch_pe(positions, freqs):
    fb = 2 ** torch.arange(freqs).float()
    pts = (positions[..., None] * fb).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return torch.cat([torch.sin(pts), torch.cos(pts)], dim=-1)


def torch_grid_sample_plane(plane_hwc, coords):
    # (H, W, C) + (N, 2) -> (N, C), align_corners=True
    t = torch.from_numpy(np.asarray(plane_hwc)).permute(2, 0, 1)[None]
    g = coords.view(1, -1, 1, 2)
    return TF.grid_sample(t, g, align_corners=True).squeeze(0).squeeze(-1).T


class TorchReferenceForward:
    """The reference InfoInv forward, parameterized by our param pytree."""

    def __init__(self, params, cfg: TriPlaneConfig, rcfg: RenderConfig):
        self.p = jax.device_get(params)
        self.cfg = cfg
        self.rcfg = rcfg

    def _mlp(self, params_mlp, x):
        layers = params_mlp["layers"]
        for lp in layers[:-1]:
            x = torch.relu(x @ torch.from_numpy(np.asarray(lp["w"])) + torch.from_numpy(np.asarray(lp["b"])))
        lp = layers[-1]
        return x @ torch.from_numpy(np.asarray(lp["w"])) + torch.from_numpy(np.asarray(lp["b"]))

    def compute_density(self, xy, yz, xz):
        # InfoInv/models/Field.py:52-70
        dd = self.cfg.density_dim
        feats = []
        for plane, c in (("plane_xy", xy), ("plane_yz", yz), ("plane_xz", xz)):
            feats.append(torch_grid_sample_plane(self.p[plane][..., :dd], c))
        if self.cfg.infoinv:
            xyz = torch.cat([xy, yz[:, 1:]], dim=-1)
            pe = torch_pe(xyz, self.cfg.density_pe)
            feats = [f * pe for f in feats]
        feat = torch.cat(feats, dim=-1)
        raw = self._mlp(self.p["density_decoder"]["mlp"], feat)[:, 0]
        return TF.softplus(raw + self.cfg.density_shift)

    def compute_rgb(self, xy, yz, xz, views):
        # InfoInv/models/Field.py:72-89 + networks.py:25-32
        dd = self.cfg.density_dim
        feats = []
        for plane, c in (("plane_xy", xy), ("plane_yz", yz), ("plane_xz", xz)):
            feats.append(torch_grid_sample_plane(self.p[plane][..., dd:], c))
        if self.cfg.infoinv:
            xyz = torch.cat([xy, yz[:, 1:]], dim=-1)
            pe = torch_pe(xyz, self.cfg.rgb_pe)
            feats = [f * pe for f in feats]
        feat = torch.cat(feats, dim=-1)
        basis_w = torch.from_numpy(np.asarray(self.p["rgb_decoder"]["basis"]["w"]))
        feat = feat @ basis_w
        mlp_in = torch.cat([feat, views, torch_pe(views, self.cfg.view_pe)], dim=-1)
        return torch.sigmoid(self._mlp(self.p["rgb_decoder"]["mlp"], mlp_in))

    def forward(self, rays):
        # InfoInv/models/FieldBase.py:228-282, eval path (no jitter, no
        # alpha mask), white background.
        rc = self.rcfg
        rays = torch.from_numpy(np.asarray(rays))
        rays_o, dirs = rays[:, :3], rays[:, 3:6]
        aabb = torch.from_numpy(AABB)

        vec = torch.where(dirs == 0, torch.full_like(dirs, 1e-6), dirs)
        rate_a = (aabb[1] - rays_o) / vec
        rate_b = (aabb[0] - rays_o) / vec
        t_min = torch.minimum(rate_a, rate_b).amax(-1).clamp(rc.near, rc.far)
        rng = torch.arange(rc.n_samples)[None].float()
        z_vals = t_min[:, None] + rng * rc.step_size
        pts = rays_o[:, None] + dirs[:, None] * z_vals[..., None]
        outbbox = ((aabb[0] > pts) | (pts > aabb[1])).any(-1)
        valid = ~outbbox
        dists = torch.cat(
            [z_vals[:, 1:] - z_vals[:, :-1], torch.zeros_like(z_vals[:, :1])], -1
        )

        density = torch.zeros(pts.shape[:2])
        xyz_n = (pts - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0
        v = xyz_n[valid]
        xy, yz, xz = v[:, :2], v[:, 1:], v[:, ::2]
        density[valid] = self.compute_density(xy, yz, xz)

        alpha = 1.0 - torch.exp(-density * dists * rc.distance_scale)
        t = torch.cumprod(
            torch.cat([torch.ones(alpha.shape[0], 1), 1.0 - alpha + 1e-10], -1), -1
        )
        weight = alpha * t[:, :-1]

        rgb = torch.zeros(pts.shape[:2] + (3,))
        mask = weight > rc.ray_march_weight_thres
        if mask.any():
            views = dirs[:, None, :].expand(pts.shape)
            vv = xyz_n[mask]
            rgb[mask] = self.compute_rgb(
                vv[:, :2], vv[:, 1:], vv[:, ::2], views[mask]
            )
        acc = weight.sum(-1)
        rgb_map = (weight[..., None] * rgb).sum(-2) + (1.0 - acc[..., None])
        rgb_map = rgb_map.clamp(0, 1)
        depth = (weight * z_vals).sum(-1) + (1.0 - acc) * rays[:, -1]
        return rgb_map.numpy(), depth.numpy()


@pytest.mark.parametrize("infoinv", [False, True])
def test_full_forward_matches_reference_math(infoinv):
    cfg = TriPlaneConfig(
        variant="infoinv", plane_res=24, plane_dim=96, density_dim=24,
        infoinv=infoinv,
    )
    params = init_triplane(jax.random.PRNGKey(7), cfg)
    # Push density up so compositing is non-trivial.
    params["plane_xy"] = params["plane_xy"] + 2.0

    rcfg = RenderConfig(
        aabb=tuple(map(tuple, AABB.tolist())), near=2.0, far=6.0,
        n_samples=48, step_size=0.11, white_bg=True,
    )
    rng = np.random.default_rng(3)
    o = np.tile(np.array([[0, 0, -4.0]], np.float32), (24, 1))
    d = rng.normal(size=(24, 3)).astype(np.float32) * 0.2 + np.array(
        [0, 0, 1], np.float32
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = np.concatenate([o, d], -1)

    ours = render_rays(params, cfg, rcfg, jnp.asarray(rays), None, is_train=False)
    ref_rgb, ref_depth = TorchReferenceForward(params, cfg, rcfg).forward(rays)

    np.testing.assert_allclose(np.asarray(ours["rgb_map"]), ref_rgb, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ours["depth_map"]), ref_depth, atol=2e-3)


def test_forward_parity_with_compaction():
    cfg = TriPlaneConfig(
        variant="infoinv", plane_res=24, plane_dim=96, density_dim=24, infoinv=True
    )
    params = init_triplane(jax.random.PRNGKey(9), cfg)
    params["plane_yz"] = params["plane_yz"] + 2.0
    base = dict(
        aabb=tuple(map(tuple, AABB.tolist())), near=2.0, far=6.0,
        n_samples=48, step_size=0.11, white_bg=True,
    )
    rng = np.random.default_rng(4)
    o = np.tile(np.array([[0, 0, -4.0]], np.float32), (16, 1))
    d = rng.normal(size=(16, 3)).astype(np.float32) * 0.2 + np.array([0, 0, 1], np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.asarray(np.concatenate([o, d], -1))

    fast = render_rays(
        params, cfg, RenderConfig(**base, sample_cap=40, rgb_cap=32),
        rays, None, is_train=False,
    )
    ref_rgb, _ = TorchReferenceForward(
        params, cfg, RenderConfig(**base)
    ).forward(np.asarray(rays))
    np.testing.assert_allclose(np.asarray(fast["rgb_map"]), ref_rgb, atol=3e-3)
