"""Scene representations: tri-plane fields (identity/InfoInv/learned gauge)
and the NeuTex-style UV-mapping model."""

from .decoders import (
    init_linear,
    apply_linear,
    init_mlp,
    apply_mlp,
    init_rgb_decoder,
    apply_rgb_decoder,
    init_density_decoder,
    apply_density_decoder,
)
from .triplane import (
    TriPlaneConfig,
    init_triplane,
    triplane_density,
    triplane_rgb,
    triplane_project,
    triplane_gauge,
    density_l1,
    feature2density,
    upsample_planes,
    shrink_planes,
)

__all__ = [
    "init_linear",
    "apply_linear",
    "init_mlp",
    "apply_mlp",
    "init_rgb_decoder",
    "apply_rgb_decoder",
    "init_density_decoder",
    "apply_density_decoder",
    "TriPlaneConfig",
    "init_triplane",
    "triplane_density",
    "triplane_rgb",
    "triplane_project",
    "triplane_gauge",
    "density_l1",
    "feature2density",
    "upsample_planes",
    "shrink_planes",
]
