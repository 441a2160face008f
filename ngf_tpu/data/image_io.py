"""Image reading shared by the loaders: float32 [0,1], optional resize."""

from __future__ import annotations

import numpy as np


def load_image(path: str, img_wh: tuple | None = None) -> np.ndarray:
    """Read an image to (H, W, C) float32 in [0, 1]; LANCZOS-resize to
    ``img_wh`` = (W, H) if the stored size differs (the reference resizes
    whenever downsample != 1, `InfoInv/dataLoader/blender.py:76-77`)."""
    from PIL import Image

    img = Image.open(path)
    if img_wh is not None and img.size != tuple(img_wh):
        img = img.resize(tuple(img_wh), Image.LANCZOS)
    arr = np.asarray(img, np.float32) / 255.0
    if arr.ndim == 2:
        arr = arr[..., None]
    return arr
