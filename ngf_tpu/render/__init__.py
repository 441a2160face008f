"""Volume renderers (dense masked, static shapes)."""

from .volume import RenderConfig, render_rays, normalize_coord

__all__ = ["RenderConfig", "render_rays", "normalize_coord"]
