"""Training: optimizers, jitted train steps, occupancy subsystem, staged loop."""

from .state import make_optimizer, triplane_lr_tree, lr_decay_schedule
from .step import make_train_step, make_render_fn

__all__ = [
    "make_optimizer",
    "triplane_lr_tree",
    "lr_decay_schedule",
    "make_train_step",
    "make_render_fn",
]
