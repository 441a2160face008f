"""NeuTex full-forward parity vs the reference math in torch, same weights.

Torch side re-implements `NeuTex.forward` exactly as cited
(`UV-Mapping/model/model.py:27-59`, `model/renderer.py:79-141,176-247`,
`model/gauge_fields.py:37-74`, `model/decoder.py:56-78,219-236`) with OUR
initialized parameters loaded in; jitter=0 makes the color path
deterministic.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as TF  # noqa: E402

from ngf_tpu.fields.neutex import NeuTexConfig, init_neutex, neutex_forward  # noqa: E402


def t(x):
    return torch.from_numpy(np.asarray(x))


def torch_pe(positions, freqs):
    fb = 2 ** torch.arange(freqs).float()
    pts = (positions[..., None] * fb).reshape(
        positions.shape[:-1] + (freqs * positions.shape[-1],)
    )
    return torch.cat([torch.sin(pts), torch.cos(pts)], dim=-1)


def torch_stack(params_stack, x, act):
    layers = params_stack["layers"]
    for lp in layers[:-1]:
        x = act(x @ t(lp["w"]) + t(lp["b"]))
    lp = layers[-1]
    return x @ t(lp["w"]) + t(lp["b"])


class TorchNeuTex:
    def __init__(self, params, cfg: NeuTexConfig):
        self.p = jax.device_get(params)
        self.cfg = cfg

    def geometry(self, pts):
        # decoder.py:219-236
        x = torch.cat([pts, torch_pe(pts, self.cfg.geo_freqs)], dim=-1)
        raw = torch_stack(self.p["net_geometry_decoder"], x, torch.relu)[..., 0]
        return TF.softplus(raw)

    def gauge(self, pts):
        # gauge_fields.py:37-74
        x = torch.cat([pts, torch_pe(pts, 10)], dim=-1)
        out = torch_stack(self.p["gauge_network"], x, torch.relu)
        if self.cfg.uv_dim == 2:
            return torch.tanh(out)
        return TF.normalize(out, dim=-1)

    def texture(self, uv, view):
        # decoder.py:56-78 (clamp_texture=False)
        lrelu = lambda v: TF.leaky_relu(v, 0.2)
        x = torch.cat([uv, torch_pe(uv, self.cfg.tex_freqs)], dim=-1)
        h = x
        for lp in self.p["net_texture"]["block1"]["layers"]:
            h = lrelu(h @ t(lp["w"]) + t(lp["b"]))
        color1 = TF.softplus(h @ t(self.p["net_texture"]["color1"]["w"])
                             + t(self.p["net_texture"]["color1"]["b"]))
        view = view.expand(h.shape[:-1] + (3,))
        x2 = torch.cat([h, view, torch_pe(view, self.cfg.view_freqs)], dim=-1)
        color2 = torch_stack(self.p["net_texture"]["block2"], x2, lrelu)
        return (color1 + color2).clamp(min=0)

    def forward(self, campos, raydir):
        # renderer.py:79-141 (jitter=0) + model.py:27-59 + renderer.py:176-247
        cfg = self.cfg
        campos = t(campos)
        raydir = t(raydir)
        t1 = (-1.0 - campos[:, None, :]) / raydir
        t2 = (1.0 - campos[:, None, :]) / raydir
        tmin = torch.max(
            torch.min(t1[..., 0], t2[..., 0]),
            torch.max(torch.min(t1[..., 1], t2[..., 1]), torch.min(t1[..., 2], t2[..., 2])),
        )
        tmax = torch.min(
            torch.max(t1[..., 0], t2[..., 0]),
            torch.min(torch.max(t1[..., 1], t2[..., 1]), torch.max(t1[..., 2], t2[..., 2])),
        )
        inter = tmin < tmax
        t0 = torch.where(inter, tmin, torch.zeros_like(tmin)).clamp(min=0.0)
        dt = 2.0 / cfg.sample_num
        seg = torch.full((raydir.shape[0], raydir.shape[1], cfg.sample_num), dt)
        end_ts = torch.cumsum(seg, dim=2)
        end_ts = torch.cat([torch.zeros_like(end_ts[..., :1]), end_ts], dim=2)
        end_ts = t0[:, :, None] + end_ts
        mid = 0.5 * (end_ts[..., :-1] + end_ts[..., 1:])
        pos = campos[:, None, None, :] + raydir[:, :, None, :] * mid[..., None]
        valid = ((pos > -1.0) & (pos < 1.0)).all(-1).float()

        density = self.geometry(pos)
        uv = self.gauge(pos)
        radiance = self.texture(uv, raydir[:, :, None, :])

        sigma = density * valid
        opacity = 1 - torch.exp(-sigma * seg)
        acc = torch.cumprod(1.0 - opacity + 1e-10, dim=-1)
        bg_t = acc[:, :, -1]
        acc = torch.cat([torch.ones(opacity.shape[:2] + (1,)), acc[:, :, :-1]], dim=-1)
        blend = opacity * acc
        color = torch.sum(radiance[..., :3] * blend[..., None], dim=-2)
        color = torch.pow(color + 1e-5, 1 / 2.2).clamp(0, 1)
        return color.numpy(), bg_t.numpy(), uv.numpy()


@pytest.mark.parametrize("primitive", ["square", "sphere"])
def test_neutex_forward_matches_reference_math(primitive):
    cfg = NeuTexConfig(
        primitive_type=primitive, sample_num=24, points_per_primitive=64,
        geo_layers=2, tex_layers1=2, tex_layers2=1, tex_width=48,
        geo_hidden=48, inverse_hidden=48,
    )
    params = init_neutex(jax.random.PRNGKey(11), cfg)
    # lift raw density so compositing is non-trivial
    params["net_geometry_decoder"]["layers"][-1]["b"] = (
        params["net_geometry_decoder"]["layers"][-1]["b"] + 2.0
    )

    rng = np.random.default_rng(2)
    campos = np.array([[0.4, 0.3, -2.5]], np.float32)
    d = rng.normal(size=(1, 20, 3)).astype(np.float32) * 0.15 + np.array(
        [0, 0, 1], np.float32
    )
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    ours = neutex_forward(
        params, cfg, jax.random.PRNGKey(0), jnp.asarray(campos), jnp.asarray(d),
        background_color=None, jitter=0.0,
    )
    ref_color, ref_bg, ref_uv = TorchNeuTex(params, cfg).forward(campos, d)

    # sphere uv = normalize(mlp_out): directions with tiny pre-normalization
    # magnitude amplify fp differences, hence the looser tolerance there.
    uv_atol = 3e-5 if primitive == "square" else 2e-3
    np.testing.assert_allclose(np.asarray(ours["uv"]), ref_uv, atol=uv_atol)
    np.testing.assert_allclose(np.asarray(ours["transmittance"]), ref_bg, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours["color"]), ref_color, atol=5e-4)
