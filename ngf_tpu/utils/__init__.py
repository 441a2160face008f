"""Metrics, grid math, visualization/IO, checkpointing."""

from .grid import n_to_reso, cal_n_samples, grid_step_size, grid_n_samples
from .metrics import mse2psnr, rgb_ssim, rgb_lpips, tv_loss_2d
from .checkpoint import save_checkpoint, load_checkpoint

__all__ = [
    "n_to_reso",
    "cal_n_samples",
    "grid_step_size",
    "grid_n_samples",
    "mse2psnr",
    "rgb_ssim",
    "rgb_lpips",
    "tv_loss_2d",
    "save_checkpoint",
    "load_checkpoint",
]
