"""Optimizer construction with per-parameter-group learning rates.

Mirrors the reference training setup:
- Adam(betas=(0.9, 0.99)) (`InfoInv/main.py:243`).
- Per-group LRs from ``get_optparam_groups``: planes at ``lr_init`` (0.02),
  decoders at ``lr_basis`` (1e-3), gauge grids at ``lr_basis * 0.1``
  (`InfoInv/models/Field.py:27-37`, `TriPlane/models/Field.py:34-46`).
- Per-iteration exponential decay: every step multiplies lr by
  ``ratio ** (1/decay_iters)`` with no floor (`InfoInv/main.py:235-239,
  298-299`); step 0 uses the initial lr. Upsampling recreates the optimizer
  with initial LRs, restarting the schedule (`TriPlane/main.py:345-357`).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax


def lr_decay_schedule(target_ratio: float, decay_iters: int) -> Callable:
    """lr multiplier after ``count`` updates: ratio ** (count / decay_iters)."""

    def schedule(count):
        return jnp.power(target_ratio, count / decay_iters)

    return schedule


def triplane_lr_tree(params: Any, lr_init: float, lr_basis: float) -> Any:
    """Per-leaf base LR tree matching the reference's param groups."""

    def group_lr(name: str) -> float:
        if name.startswith("plane_"):
            return lr_init
        if name.startswith("gauge_"):
            return lr_basis * 0.1
        return lr_basis

    return {
        name: jax.tree.map(lambda _: group_lr(name), sub)
        for name, sub in params.items()
    }


def _scale_by_leaf_lr(lr_tree: Any, schedule: Callable) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return {"count": jnp.zeros([], jnp.int32)}

    def update_fn(updates, state, params=None):
        del params
        s = schedule(state["count"])
        updates = jax.tree.map(lambda u, lr: u * (lr * s), updates, lr_tree)
        return updates, {"count": state["count"] + 1}

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(
    lr_tree: Any,
    target_ratio: float = 0.1,
    decay_iters: int = 30000,
    b1: float = 0.9,
    b2: float = 0.99,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam with per-leaf base LR and per-step exponential decay."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        _scale_by_leaf_lr(lr_tree, lr_decay_schedule(target_ratio, decay_iters)),
        optax.scale(-1.0),
    )
