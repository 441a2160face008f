"""NeuTex-style UV-mapping model: gauge transform to a 2D manifold,
texture/geometry MLPs, inverse gauge (AtlasNet-style).

Functional JAX rebuild of `UV-Mapping/model/` — components and the exact
wiring of `NeuTex.forward` (`UV-Mapping/model/model.py:11-59`):

  cube raygen -> GeometryMlp density -> GaugeTransform 3D->UV ->
  TextureMlp color -> ray_march composite -> tone map, with InverseGauge run
  every forward for the origin and inverse-mapping losses.

Design notes vs the reference:
- The `InverseGauge.map` view bug (`gauge_fields.py:205` — uv.view with a
  tuple first arg raises TypeError) is fixed, not replicated.
- Hardcoded `.cuda()` template samplers (`gauge_fields.py:129,143,154,165`)
  become pure functions of a PRNG key.
- Texture editing (cubemap/square modulation with 5 blend modes,
  `decoder.py:79-121`) is dense-masked (jnp.where) instead of boolean
  scatter.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.compositing import ray_march, simple_tone_map
from ..ops.encoding import positional_encoding
from ..ops.rays import cube_ray_generation
from ..utils.cubemap import (
    convert_cube_uv_to_xyz,
    generate_grid,
    icosphere,
    sample_cubemap,
    sample_square,
)
from .decoders import Params, apply_linear, init_linear

LEAKY_SLOPE = 0.2
_RELU_GAIN = math.sqrt(2.0)
_LEAKY_GAIN = math.sqrt(2.0 / (1.0 + LEAKY_SLOPE ** 2))


@dataclasses.dataclass(frozen=True)
class NeuTexConfig:
    """Static model config (`UV-Mapping/model/model.py:11-25` + CLI opts)."""

    primitive_type: str = "square"  # 'square' | 'sphere'
    sample_num: int = 64
    points_per_primitive: int = 2500
    jitter: float = 0.05
    # GeometryMlpDecoder(pos_freqs=10, hidden=256, layers=10)
    geo_freqs: int = 10
    geo_hidden: int = 256
    geo_layers: int = 10
    # TextureMlpDecoder(num_freqs=10, view_freqs=6, layers=[5,3], width=256)
    tex_freqs: int = 10
    view_freqs: int = 6
    tex_width: int = 256
    tex_layers1: int = 5
    tex_layers2: int = 3
    clamp_texture: bool = False
    # GaugeNetwork(3, out, mid=64, hidden=128, layers=2); Inverse hidden=512
    gauge_mid: int = 64
    gauge_hidden: int = 128
    gauge_layers: int = 2
    inverse_mid: int = 64
    inverse_hidden: int = 512
    inverse_layers: int = 2
    # 'bfloat16' runs every MLP stack's matmuls on the MXU in bf16 (f32
    # masters and f32 accumulation via apply_linear's preferred_element_type;
    # PE inputs, density softplus, gauge tanh/normalize, compositing and
    # losses stay float32). 'float32' is the reference-parity default.
    compute_dtype: str = "float32"

    @property
    def uv_dim(self) -> int:
        return 2 if self.primitive_type == "square" else 3

    @property
    def dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


# ----------------------------------------------------------------- MLP stacks


def _init_stack(key, dims: list[int], gains: list[float]) -> Params:
    keys = jax.random.split(key, len(dims) - 1)
    return {
        "layers": [
            init_linear(k, d0, d1, init="xavier_uniform", gain=g, zero_bias=True)
            for k, d0, d1, g in zip(keys, dims[:-1], dims[1:], gains)
        ]
    }


def _cast_tree(tree: Params, dt) -> Params:
    if dt == jnp.float32:
        return tree
    return jax.tree.map(lambda a: a.astype(dt), tree)


def _apply_stack(p: Params, x: jnp.ndarray, act, dt=jnp.float32) -> jnp.ndarray:
    # apply_linear matches the weight dtype, so casting the layer params is
    # the whole mixed-precision story; the stack output returns to f32.
    p = _cast_tree(p, dt)
    for lp in p["layers"][:-1]:
        x = act(apply_linear(lp, x))
    return apply_linear(p["layers"][-1], x).astype(jnp.float32)


# ------------------------------------------------------------- gauge networks


def init_gauge_network(key, cfg: NeuTexConfig, input_dim: int, output_dim: int) -> Params:
    """`GaugeNetwork.__init__` (`gauge_fields.py:8-35`): PE(10) input, mid 64,
    hidden 128, 2 extra layers; xavier gain 1 everywhere."""
    dims = (
        [input_dim + 2 * input_dim * 10, cfg.gauge_mid, cfg.gauge_hidden]
        + [cfg.gauge_hidden] * cfg.gauge_layers
        + [output_dim]
    )
    return _init_stack(key, dims, [1.0] * (len(dims) - 1))


def apply_gauge_network(p: Params, x: jnp.ndarray, dt=jnp.float32) -> jnp.ndarray:
    x = jnp.concatenate([x, positional_encoding(x, 10)], axis=-1)
    return _apply_stack(p, x, jax.nn.relu, dt)


def apply_gauge_transform(p: Params, cfg: NeuTexConfig, points: jnp.ndarray) -> jnp.ndarray:
    """3D -> UV: tanh for square, L2-normalize for sphere
    (`gauge_fields.py:60-74`)."""
    out = apply_gauge_network(p, points, cfg.dtype)
    if cfg.uv_dim == 2:
        return jnp.tanh(out)
    return out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)


def init_inverse_network(key, cfg: NeuTexConfig) -> Params:
    """`InverseNetwork` (`gauge_fields.py:78-108`): no PE, hidden 512."""
    dims = (
        [cfg.uv_dim, cfg.inverse_mid, cfg.inverse_hidden]
        + [cfg.inverse_hidden] * cfg.inverse_layers
        + [3]
    )
    return _init_stack(key, dims, [1.0] * (len(dims) - 1))


def apply_inverse_network(p: Params, uv: jnp.ndarray, dt=jnp.float32) -> jnp.ndarray:
    return _apply_stack(p, uv, jax.nn.relu, dt)


def template_random_points(key, cfg: NeuTexConfig, n: int) -> jnp.ndarray:
    """Random manifold samples (`gauge_fields.py:127-130,148-156`)."""
    if cfg.primitive_type == "square":
        return jax.random.uniform(key, (n, 2)) * 2.0 - 1.0
    pts = jax.random.normal(key, (n, 3)) * 2.0 - 1.0
    return pts / jnp.maximum(jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-12)


def template_regular_points(cfg: NeuTexConfig, n: int | None = None) -> np.ndarray:
    """Regular manifold samples (`gauge_fields.py:132-144,158-165`)."""
    if cfg.primitive_type == "square":
        n = n or cfg.points_per_primitive
        side = int(round(n ** 0.5))
        uv = np.stack(
            np.meshgrid(*([np.linspace(-1, 1, side)] * 2), indexing="ij"), axis=-1
        ).reshape(-1, 2)
        return uv.astype(np.float32)
    return icosphere(6)


# ------------------------------------------------------------------- decoders


def init_geometry_mlp(key, cfg: NeuTexConfig) -> Params:
    """`GeometryMlpDecoder` (`decoder.py:201-217`): 10-layer ReLU MLP on
    PE(xyz, 10); init_seq xavier with relu gain."""
    dims = [3 + 6 * cfg.geo_freqs] + [cfg.geo_hidden] * (cfg.geo_layers + 1) + [1]
    gains = [_RELU_GAIN] * (len(dims) - 2) + [1.0]
    return _init_stack(key, dims, gains)


def apply_geometry_mlp(p: Params, cfg: NeuTexConfig, pts: jnp.ndarray) -> dict:
    x = jnp.concatenate([pts, positional_encoding(pts, cfg.geo_freqs)], axis=-1)
    raw = _apply_stack(p, x, jax.nn.relu, cfg.dtype)[..., 0]
    return {"raw_density": raw, "density": jax.nn.softplus(raw)}


def init_texture_mlp(key, cfg: NeuTexConfig) -> Params:
    """`TextureMlpDecoder` (`decoder.py:11-39`): block1 on PE(uv), color1
    head, block2 on [h, view, PE(view)]; leaky-relu gains."""
    k1, kc, k2 = jax.random.split(key, 3)
    w = cfg.tex_width
    uv = cfg.uv_dim
    dims1 = [uv + 2 * uv * cfg.tex_freqs] + [w] * (cfg.tex_layers1 + 1)
    # every layer in block1 is followed by LeakyReLU
    block1 = _init_stack(k1, dims1, [_LEAKY_GAIN] * (len(dims1) - 1))
    color1 = init_linear(kc, w, 3, init="xavier_uniform", gain=1.0, zero_bias=True)
    dims2 = [w + 3 + 2 * 3 * cfg.view_freqs] + [w] * (cfg.tex_layers2 + 1) + [3]
    gains2 = [_LEAKY_GAIN] * (len(dims2) - 2) + [1.0]
    block2 = _init_stack(k2, dims2, gains2)
    return {"block1": block1, "color1": color1, "block2": block2}


def _leaky(x):
    return jax.nn.leaky_relu(x, LEAKY_SLOPE)


def _apply_block1(p: Params, cfg: NeuTexConfig, uv: jnp.ndarray) -> jnp.ndarray:
    x = jnp.concatenate([uv, positional_encoding(uv, cfg.tex_freqs)], axis=-1)
    # all block1 layers are activation-terminated (`decoder.py:20-26`);
    # output stays in compute dtype — block2/color1 consume it directly
    for lp in _cast_tree(p, cfg.dtype)["layers"]:
        x = _leaky(apply_linear(lp, x))
    return x


def apply_texture_mlp(
    p: Params,
    cfg: NeuTexConfig,
    uv: jnp.ndarray,
    view_dir: jnp.ndarray,
    edit_texture: jnp.ndarray | None = None,
    edit_mode: int = 0,
) -> jnp.ndarray:
    """`TextureMlpDecoder.forward` (`decoder.py:56-121`).

    view_dir broadcasts over the sample axis like the reference's expand.
    With ``edit_texture`` set, the learned color modulates the edited texture
    per ``edit_mode`` (modes 0-4, `decoder.py:101-121`).
    """
    h = _apply_block1(p["block1"], cfg, uv)
    c1 = apply_linear(_cast_tree(p["color1"], cfg.dtype), h).astype(jnp.float32)
    color1 = jax.nn.sigmoid(c1) if cfg.clamp_texture else jax.nn.softplus(c1)

    view_dir = jnp.broadcast_to(view_dir, h.shape[:-1] + (3,))
    vp = positional_encoding(view_dir, cfg.view_freqs)
    x = jnp.concatenate([h, view_dir.astype(h.dtype), vp.astype(h.dtype)], axis=-1)
    c2 = _apply_stack(p["block2"], x, _leaky, cfg.dtype)
    color2 = jax.nn.sigmoid(c2) if cfg.clamp_texture else c2
    original = color1 + color2

    if edit_texture is None:
        return jnp.maximum(original, 0.0)

    if cfg.primitive_type == "sphere":
        tex_color = sample_cubemap(edit_texture, uv)
    else:
        tex_color = sample_square(edit_texture, uv)
    tex_rgb = tex_color[..., :3]

    if edit_mode == 0:
        mod = jnp.clip(original * 8.0, 0.0, 1.0)
        return tex_rgb * jnp.mean(mod, axis=-1, keepdims=True)
    if edit_mode == 1:
        base = jnp.clip(original, 0.0, 1.0)
        mask = (tex_color[..., 0] < 0.99)[..., None]
        return jnp.where(mask, base * tex_rgb, base)
    if edit_mode == 2:
        base = jnp.clip(original, 0.0, 1.0)
        mask = (tex_color[..., 0] < 0.99)[..., None]
        return jnp.where(mask, base / jnp.maximum(tex_rgb, 1e-6), base)
    if edit_mode == 3:
        base = jnp.clip(original, 0.0, 1.0)
        mask = (jnp.sum(tex_rgb, -1) > 0.01)[..., None]
        mixed = 2.0 * jnp.mean(base, -1, keepdims=True) * tex_rgb
        return jnp.where(mask, mixed, base) + tex_rgb
    if edit_mode == 4:
        return jnp.clip(tex_rgb, 0.0, 1.0)
    raise ValueError(f"unknown edit mode {edit_mode}")


# ------------------------------------------------------------ texture export


def export_texture(params: Params, cfg: NeuTexConfig, resolution: int = 512,
                   viewdir=(0, 0, 1)):
    """Export the learned texture (`decoder.py:123-179`).

    sphere -> (6, R, R, 3) cube faces; square -> (R, R, 3).
    """
    p = params["net_texture"]
    if cfg.uv_dim == 3:
        grid = jnp.asarray(generate_grid(2, resolution), dtype=jnp.float32)
        faces = []
        for face in range(6):
            xyz = convert_cube_uv_to_xyz(face, grid)
            view = jnp.broadcast_to(jnp.asarray(viewdir, jnp.float32), xyz.shape)
            faces.append(apply_texture_mlp(p, cfg, xyz, view))
        return jnp.stack(faces, axis=0)
    grid = jnp.asarray(generate_grid(2, resolution), dtype=jnp.float32)
    view = jnp.broadcast_to(jnp.asarray(viewdir, jnp.float32), grid.shape[:-1] + (3,))
    return apply_texture_mlp(p, cfg, grid, view)


def export_sphere_equirect(params: Params, cfg: NeuTexConfig, resolution: int = 512,
                           viewdir=(0, 0, 1)):
    """Equirectangular sphere texture (`decoder.py:140-157`)."""
    assert cfg.uv_dim == 3
    gx, gy = np.meshgrid(np.arange(2 * resolution), np.arange(resolution), indexing="xy")
    grid = np.stack([gx, gy], axis=-1) / np.array([2 * resolution, resolution])
    grid = grid * np.array([2 * np.pi, np.pi]) + np.array([np.pi, 0.0])
    x, y = grid[..., 0], grid[..., 1]
    xyz = np.stack(
        [-np.sin(x) * np.sin(y), -np.cos(y), -np.cos(x) * np.sin(y)], -1
    ).astype(np.float32)
    view = jnp.broadcast_to(jnp.asarray(viewdir, jnp.float32), xyz.shape)
    tex = apply_texture_mlp(params["net_texture"], cfg, jnp.asarray(xyz), view)
    return tex[::-1]


def coordinate_deformation(
    params: Params,
    cfg: NeuTexConfig,
    viewdir=(0, 0, 1),
    icosphere_division: int = 6,
    square_subdiv: int = 7,
):
    """Mesh export via the inverse gauge (`UV-Mapping/model/model.py:383-417`):
    deform a template mesh (icosphere / subdivided square) through the
    inverse network and color vertices from the texture MLP.

    Returns (vertices (V, 3), faces (F, 3), vertex_colors (V, 3)).
    """
    from ..utils.cubemap import icosphere_mesh

    if cfg.primitive_type == "sphere":
        verts, faces = icosphere_mesh(icosphere_division)
        grid = jnp.asarray(verts)
    else:
        side = 2 ** square_subdiv + 1
        uv = np.stack(
            np.meshgrid(*([np.linspace(-1, 1, side)] * 2), indexing="ij"), axis=-1
        ).reshape(-1, 2)
        grid = jnp.asarray(uv, dtype=jnp.float32)
        idx = np.arange(side * side).reshape(side, side)
        faces = np.concatenate(
            [
                np.stack(
                    [idx[:-1, :-1].ravel(), idx[1:, :-1].ravel(), idx[:-1, 1:].ravel()],
                    -1,
                ),
                np.stack(
                    [idx[1:, :-1].ravel(), idx[1:, 1:].ravel(), idx[:-1, 1:].ravel()],
                    -1,
                ),
            ]
        ).astype(np.int32)

    vertices = apply_inverse_network(params["inverse_network"], grid)
    view = jnp.broadcast_to(jnp.asarray(viewdir, jnp.float32), grid.shape[:-1] + (3,))
    colors = apply_texture_mlp(params["net_texture"], cfg, grid, view)
    return np.asarray(vertices), faces, np.asarray(jnp.clip(colors, 0.0, 1.0))


# ----------------------------------------------------------------- full model


def init_neutex(key, cfg: NeuTexConfig) -> Params:
    kg, ki, kt, kx = jax.random.split(key, 4)
    return {
        "net_geometry_decoder": init_geometry_mlp(kg, cfg),
        "inverse_network": init_inverse_network(ki, cfg),
        "gauge_network": init_gauge_network(kt, cfg, 3, cfg.uv_dim),
        "net_texture": init_texture_mlp(kx, cfg),
    }


def neutex_forward(
    params: Params,
    cfg: NeuTexConfig,
    key: jax.Array,
    campos: jnp.ndarray,
    raydir: jnp.ndarray,
    background_color: jnp.ndarray | None = None,
    edit_texture: jnp.ndarray | None = None,
    edit_mode: int = 0,
    jitter: float | None = None,
) -> dict[str, Any]:
    """`NeuTex.forward` (`UV-Mapping/model/model.py:27-59`).

    Args:
      campos: (B, 3); raydir: (B, R, 3) normalized; background_color (B, 3).

    Returns the reference's output dict (color, transmittance, points,
    points_original/inverse/weights).
    """
    k_ray, k_tmpl = jax.random.split(key)
    jit_amount = cfg.jitter if jitter is None else jitter
    ray_pos, ray_dist, ray_valid, _ = cube_ray_generation(
        k_ray, campos, raydir, cfg.sample_num, 1.0, jit_amount
    )
    ray_pos = jax.lax.stop_gradient(ray_pos)

    density = apply_geometry_mlp(params["net_geometry_decoder"], cfg, ray_pos)["density"]

    # inverse gauge on random template points (`model.py:35-36`)
    tmpl = template_random_points(k_tmpl, cfg, cfg.points_per_primitive)
    points_3d = apply_inverse_network(
        params["inverse_network"], tmpl, cfg.dtype
    )  # (P, 3)

    uv = apply_gauge_transform(params["gauge_network"], cfg, ray_pos)
    radiance = apply_texture_mlp(
        params["net_texture"], cfg, uv, raydir[:, :, None, :],
        edit_texture=edit_texture, edit_mode=edit_mode,
    )

    feats = jnp.concatenate([density[..., None], radiance[..., :3]], axis=-1)
    ray_color, _, _, blend_weight, bg_blend_weight = ray_march(
        ray_dist, ray_valid, feats
    )
    if background_color is not None:
        ray_color = ray_color + background_color[:, None, :] * bg_blend_weight[:, :, None]
    ray_color = simple_tone_map(ray_color)

    return {
        "color": ray_color,
        "transmittance": bg_blend_weight,
        # (1, 3, P) like the reference's permute (`model.py:36`)
        "points": points_3d.T[None],
        "points_original": ray_pos,
        "points_inverse": apply_inverse_network(
            params["inverse_network"], uv, cfg.dtype
        ),
        "points_inverse_weights": blend_weight,
        "uv": uv,
    }


def neutex_losses(
    output: dict[str, Any],
    gt_image: jnp.ndarray,
    transmittance_target: jnp.ndarray | None,
    weights: dict[str, float],
) -> tuple[jnp.ndarray, dict[str, jnp.ndarray]]:
    """Loss assembly (`Model.compute_loss`, `model.py:317-350`)."""
    losses: dict[str, jnp.ndarray] = {}
    total = jnp.float32(0.0)

    if weights.get("color", 0) > 0:
        losses["color"] = jnp.mean((output["color"] - gt_image) ** 2)
        total = total + weights["color"] * losses["color"]

    if weights.get("bg", 0) > 0:
        if transmittance_target is not None:
            losses["bg"] = jnp.mean(
                (output["transmittance"] - transmittance_target) ** 2
            )
        else:
            losses["bg"] = jnp.float32(0.0)
        total = total + weights["bg"] * losses["bg"]

    if weights.get("origin", 0) > 0:
        pts = output["points"]  # (1, 3, P)
        losses["origin"] = jnp.sum(
            jnp.clip(jnp.sum(pts ** 2, axis=-2) - 1.0, a_min=0.0)
        )
        total = total + weights["origin"] * losses["origin"]

    if weights.get("inverse_mapping", 0) > 0:
        gt_points = output["points_original"]
        inv = output["points_inverse"]
        pw = output["points_inverse_weights"]
        dist = jnp.sum((gt_points - inv) ** 2, axis=-1)
        losses["inverse_mapping"] = jnp.mean(jnp.sum(dist * pw, axis=-1))
        total = total + weights["inverse_mapping"] * losses["inverse_mapping"]

    losses["total"] = total
    return total, losses
