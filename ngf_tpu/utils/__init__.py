"""Metrics, grid math, visualization/IO, checkpointing."""

from .grid import n_to_reso, cal_n_samples, grid_step_size, grid_n_samples
from .metrics import mse2psnr, rgb_ssim, rgb_lpips, tv_loss_2d
from .checkpoint import save_checkpoint, load_checkpoint
from .viz import Visualizer, save_ply, save_obj, save_pointcloud_pcd, depth_to_pointcloud
from .marching_cubes import marching_cubes, convert_density_to_ply
from .profiling import StepTimer, trace, annotate

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
    "Visualizer",
    "save_ply",
    "save_obj",
    "save_pointcloud_pcd",
    "depth_to_pointcloud",
    "marching_cubes",
    "convert_density_to_ply",
    "StepTimer",
    "trace",
    "annotate",
]
