"""Jit/pjit-compiled train and render steps.

One compiled ``train_step`` fuses the whole hot path of
`InfoInv/main.py:262-299` — sampling, gauge, plane gathers, decoders,
compositing, MSE + L1 loss, backward, Adam update, per-step LR decay — into
a single XLA program. Ray batches are sharded over the mesh 'data' axis and
parameters replicated, so XLA emits a gradient psum over ICI.

Stage boundaries (alpha-mask creation, shrink, upsample) change static
shapes/configs; each stage builds its own compiled step (SURVEY.md section 7
"Mid-training shape changes").
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..fields.triplane import TriPlaneConfig, density_l1
from ..parallel.mesh import data_sharding, replicated_sharding
from ..render.volume import RenderConfig, render_rays


def make_train_step(
    model_cfg: TriPlaneConfig,
    rcfg: RenderConfig,
    optimizer: optax.GradientTransformation,
    *,
    with_alpha_mask: bool = False,
    mesh=None,
    donate: bool = True,
):
    """Build the compiled train step.

    Returned signature:
      ``step(params, opt_state, rays, rgbs, key, iteration, l1_weight
      [, alpha_volume, alpha_aabb]) -> (params, opt_state, mse)``

    ``l1_weight`` is a traced scalar because the reference changes it from
    8e-5 to 4e-5 at the first alpha-mask update without recompiling anything
    else (`InfoInv/main.py:259,328-329`).
    """

    def step(params, opt_state, rays, rgbs, key, iteration, l1_weight,
             alpha_volume=None, alpha_aabb=None):
        def loss_fn(p):
            out = render_rays(
                p, model_cfg, rcfg, rays, key,
                is_train=True, iteration=iteration,
                alpha_volume=alpha_volume, alpha_aabb=alpha_aabb,
            )
            mse = jnp.mean((out["rgb_map"] - rgbs) ** 2)
            loss = mse + l1_weight * density_l1(p)
            return loss, mse

        (_, mse), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, mse

    if not with_alpha_mask:
        def step_no_mask(params, opt_state, rays, rgbs, key, iteration, l1_weight):
            return step(params, opt_state, rays, rgbs, key, iteration, l1_weight)
        fn = step_no_mask
    else:
        fn = step

    if mesh is not None:
        repl = replicated_sharding(mesh)
        data = data_sharding(mesh)
        if with_alpha_mask:
            in_shardings = (repl, repl, data, data, repl, repl, repl, repl, repl)
        else:
            in_shardings = (repl, repl, data, data, repl, repl, repl)
        return jax.jit(
            fn,
            in_shardings=in_shardings,
            out_shardings=(repl, repl, repl),
            donate_argnums=(0, 1) if donate else (),
        )
    return jax.jit(fn, donate_argnums=(0, 1) if donate else ())


def make_render_fn(
    model_cfg: TriPlaneConfig,
    rcfg: RenderConfig,
    *,
    with_alpha_mask: bool = False,
    iteration: int = 10**9,
):
    """Compiled eval-time chunk renderer.

    ``iteration`` defaults high so the learned gauge is active at test time,
    matching `TriPlane/main.py:60` (iteration=30001 at eval).
    """

    @partial(jax.jit, static_argnames=())
    def render(params, rays, alpha_volume=None, alpha_aabb=None):
        out = render_rays(
            params, model_cfg, rcfg, rays, None,
            is_train=False, iteration=iteration,
            alpha_volume=alpha_volume, alpha_aabb=alpha_aabb,
        )
        return out["rgb_map"], out["depth_map"]

    if with_alpha_mask:
        return render
    return jax.jit(lambda params, rays: render(params, rays))


def tree_size_mb(tree: Any) -> float:
    """Total parameter bytes in MB (diagnostics)."""
    leaves = jax.tree.leaves(tree)
    return sum(l.size * l.dtype.itemsize for l in leaves) / 1e6
