"""Training: optimizers, jitted train steps, occupancy subsystem, staged loop."""

from .state import make_optimizer, triplane_lr_tree, lr_decay_schedule

__all__ = [
    "make_optimizer",
    "triplane_lr_tree",
    "lr_decay_schedule",
]
