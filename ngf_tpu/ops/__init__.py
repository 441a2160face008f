"""Core math ops: encodings, grid sampling, ray sampling, compositing."""

from .encoding import positional_encoding, infoinv_modulate
from .grid_sample import (
    grid_sample_2d,
    grid_sample_2d_border,
    grid_sample_3d,
    resize_bilinear_2d,
    max_pool_3d,
)
from .rays import (
    ray_aabb_tmin,
    ray_aabb_range,
    stratified_sample,
    cube_ray_generation,
    sample_pdf,
    ndc_rays_blender,
)
from .compositing import raw2alpha, exclusive_transmittance, ray_march, simple_tone_map

__all__ = [
    "positional_encoding",
    "infoinv_modulate",
    "grid_sample_2d",
    "grid_sample_2d_border",
    "grid_sample_3d",
    "resize_bilinear_2d",
    "max_pool_3d",
    "ray_aabb_tmin",
    "ray_aabb_range",
    "stratified_sample",
    "cube_ray_generation",
    "sample_pdf",
    "ndc_rays_blender",
    "raw2alpha",
    "exclusive_transmittance",
    "ray_march",
    "simple_tone_map",
]
