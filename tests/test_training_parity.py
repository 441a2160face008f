"""Training-TRAJECTORY parity against a torch oracle of the reference loop.

The forward-parity tests pin the rendering math; this pins the pieces the
forward oracle cannot see: Adam semantics (betas 0.9/0.99, bias correction,
eps — `InfoInv/main.py:243`), the per-iteration exponential LR decay
(`main.py:235-239,298-299`), per-group LRs (`models/Field.py:27-37`), and
the L1 schedule (`main.py:259,278`). Both sides start from IDENTICAL
weights, see IDENTICAL ray batches in the same order, and render without
jitter (deterministic); their loss trajectories must match step-for-step
within float32 accumulation tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
import torch
import torch.nn.functional as TF

from ngf_tpu.fields import TriPlaneConfig, init_triplane
from ngf_tpu.fields.triplane import density_l1
from ngf_tpu.render import RenderConfig, render_rays
from ngf_tpu.train.state import make_optimizer, triplane_lr_tree

AABB = np.asarray([[-1.5, -1.5, -1.5], [1.5, 1.5, 1.5]], np.float32)
LR_INIT, LR_BASIS = 0.02, 1e-3
N_ITERS = 12
L1_W = 8e-5


def _torch_params(params):
    p = jax.device_get(params)

    def t(a):
        return torch.nn.Parameter(torch.from_numpy(np.array(a)).float())

    return jax.tree.map(t, p, is_leaf=lambda x: isinstance(x, (np.ndarray, jnp.ndarray)))


class TorchReferenceTrainer:
    """Differentiable torch mirror of the reference InfoInv train step
    (eval-mode sampling: no jitter; white bg; no alpha mask)."""

    def __init__(self, params, cfg: TriPlaneConfig, rcfg: RenderConfig):
        self.p = _torch_params(params)
        self.cfg, self.rcfg = cfg, rcfg
        groups = [
            {"params": [self.p["plane_xy"], self.p["plane_yz"], self.p["plane_xz"]],
             "lr": LR_INIT},
            {"params": [w for lp in self.p["density_decoder"]["mlp"]["layers"]
                        for w in (lp["w"], lp["b"])]
                       + [self.p["rgb_decoder"]["basis"]["w"]]
                       + [w for lp in self.p["rgb_decoder"]["mlp"]["layers"]
                          for w in (lp["w"], lp["b"])],
             "lr": LR_BASIS},
        ]
        # `InfoInv/main.py:243`
        self.opt = torch.optim.Adam(groups, betas=(0.9, 0.99))
        # `InfoInv/main.py:235-239`: ratio ** (1/n_iters) per iteration
        self.lr_factor = 0.1 ** (1.0 / N_ITERS)

    def _pe(self, x, freqs):
        fb = 2 ** torch.arange(freqs).float()
        pts = (x[..., None] * fb).reshape(x.shape[:-1] + (freqs * x.shape[-1],))
        return torch.cat([torch.sin(pts), torch.cos(pts)], -1)

    def _sample(self, plane, coords):
        t = plane.permute(2, 0, 1)[None]
        g = coords.view(1, -1, 1, 2)
        return TF.grid_sample(t, g, align_corners=True).squeeze(0).squeeze(-1).T

    def _mlp(self, mlp, x):
        for lp in mlp["layers"][:-1]:
            x = torch.relu(x @ lp["w"] + lp["b"])
        lp = mlp["layers"][-1]
        return x @ lp["w"] + lp["b"]

    def _forward(self, rays):
        rc, cfg = self.rcfg, self.cfg
        rays = torch.from_numpy(rays)
        rays_o, dirs = rays[:, :3], rays[:, 3:6]
        aabb = torch.from_numpy(AABB)
        vec = torch.where(dirs == 0, torch.full_like(dirs, 1e-6), dirs)
        t_min = (
            torch.minimum((aabb[1] - rays_o) / vec, (aabb[0] - rays_o) / vec)
            .amax(-1).clamp(rc.near, rc.far)
        )
        z = t_min[:, None] + torch.arange(rc.n_samples)[None].float() * rc.step_size
        pts = rays_o[:, None] + dirs[:, None] * z[..., None]
        valid = ~(((aabb[0] > pts) | (pts > aabb[1])).any(-1))
        dists = torch.cat([z[:, 1:] - z[:, :-1], torch.zeros_like(z[:, :1])], -1)
        xyz = (pts - aabb[0]) * (2.0 / (aabb[1] - aabb[0])) - 1.0

        dd = cfg.density_dim
        v = xyz[valid]
        xy, yz, xz = v[:, :2], v[:, 1:], v[:, ::2]
        feats = [
            self._sample(self.p[n][..., :dd], c)
            for n, c in (("plane_xy", xy), ("plane_yz", yz), ("plane_xz", xz))
        ]
        if cfg.infoinv:
            pe = self._pe(torch.cat([xy, yz[:, 1:]], -1), cfg.density_pe)
            feats = [f * pe for f in feats]
        raw = self._mlp(self.p["density_decoder"]["mlp"], torch.cat(feats, -1))[:, 0]
        density = torch.zeros(pts.shape[:2])
        density[valid] = TF.softplus(raw + cfg.density_shift)

        alpha = 1.0 - torch.exp(-density * dists * rc.distance_scale)
        t = torch.cumprod(
            torch.cat([torch.ones(alpha.shape[0], 1), 1.0 - alpha + 1e-10], -1), -1
        )
        weight = alpha * t[:, :-1]
        mask = weight > rc.ray_march_weight_thres
        rgb = torch.zeros(pts.shape[:2] + (3,))
        if mask.any():
            vv = xyz[mask]
            rfeats = [
                self._sample(self.p[n][..., dd:], c)
                for n, c in (
                    ("plane_xy", vv[:, :2]), ("plane_yz", vv[:, 1:]),
                    ("plane_xz", vv[:, ::2]),
                )
            ]
            if cfg.infoinv:
                pe = self._pe(torch.cat([vv[:, :2], vv[:, 2:3]], -1), cfg.rgb_pe)
                rfeats = [f * pe for f in rfeats]
            feat = torch.cat(rfeats, -1) @ self.p["rgb_decoder"]["basis"]["w"]
            views = dirs[:, None, :].expand(pts.shape)[mask]
            mlp_in = torch.cat([feat, views, self._pe(views, cfg.view_pe)], -1)
            rgb[mask] = torch.sigmoid(self._mlp(self.p["rgb_decoder"]["mlp"], mlp_in))
        acc = weight.sum(-1)
        rgb_map = (weight[..., None] * rgb).sum(-2) + (1.0 - acc[..., None])
        return rgb_map.clamp(0, 1)

    def step(self, rays, rgbs) -> float:
        rgb_map = self._forward(rays)
        mse = ((rgb_map - torch.from_numpy(rgbs)) ** 2).mean()
        l1 = sum(self.p[n].abs().mean() for n in ("plane_xy", "plane_yz", "plane_xz"))
        loss = mse + L1_W * l1
        self.opt.zero_grad()
        loss.backward()
        self.opt.step()
        for g in self.opt.param_groups:  # `main.py:298-299`
            g["lr"] *= self.lr_factor
        return float(mse.item())


@pytest.mark.parametrize("infoinv", [True, False])
def test_loss_trajectory_matches_reference_loop(infoinv):
    cfg = TriPlaneConfig(
        **{**TriPlaneConfig.infoinv_preset(infoinv=infoinv).__dict__,
           "plane_res": 32, "gauge_res": 32}
    )
    params = init_triplane(jax.random.PRNGKey(3), cfg)
    rcfg = RenderConfig(
        aabb=tuple(map(tuple, AABB.tolist())), near=2.0, far=6.0,
        n_samples=48, step_size=0.07, white_bg=True,
    )

    rng = np.random.default_rng(0)
    batches = []
    for _ in range(N_ITERS):
        o = np.tile(np.asarray([[0.0, 0.0, -4.0]], np.float32), (96, 1))
        d = rng.normal(0, 0.2, (96, 3)).astype(np.float32) + [0, 0, 1]
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        rays = np.concatenate([o, d], -1).astype(np.float32)
        rgbs = rng.random((96, 3), dtype=np.float32)
        batches.append((rays, rgbs))

    ref = TorchReferenceTrainer(params, cfg, rcfg)

    optimizer = make_optimizer(
        triplane_lr_tree(params, LR_INIT, LR_BASIS), 0.1, N_ITERS
    )
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(p, s, rays, rgbs):
        def loss_fn(p):
            out = render_rays(p, cfg, rcfg, rays, None, is_train=False)
            mse = jnp.mean((out["rgb_map"] - rgbs) ** 2)
            return mse + L1_W * density_l1(p), mse

        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        updates, s = optimizer.update(grads, s, p)
        return optax.apply_updates(p, updates), s, mse

    ours, theirs = [], []
    for rays, rgbs in batches:
        theirs.append(ref.step(rays, rgbs))
        params, opt_state, mse = train_step(
            params, opt_state, jnp.asarray(rays), jnp.asarray(rgbs)
        )
        ours.append(float(mse))

    ours, theirs = np.asarray(ours), np.asarray(theirs)
    np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=2e-5)
    # and the optimizer actually moved the loss (guards against a
    # trivially-constant match; targets are random so it need not decrease)
    assert np.abs(np.diff(theirs)).max() > 1e-3
