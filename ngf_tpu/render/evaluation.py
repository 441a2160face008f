"""Chunked full-image evaluation: PSNR/SSIM/LPIPS, image/video dumps.

Mirrors `InfoInv/main.py:61-188` (``renderer``, ``evaluation``,
``evaluation_path``): renders each held-out view in fixed-size ray chunks
through a compiled render fn, computes metrics, writes ``{idx:03d}.png``,
``rgbd/`` composites, ``video.mp4``/``depthvideo.mp4`` and ``mean.txt``
([PSNR, SSIM, LPIPS-alex, LPIPS-vgg]).
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ..data.dataset import RayDataset
from ..data.geometry import get_rays
from ..utils.metrics import mse2psnr, rgb_lpips, rgb_ssim


def visualize_depth(depth: np.ndarray, minmax=None):
    """Depth -> JET colormap uint8 (`InfoInv/utils.py:32-47`)."""
    import cv2

    x = np.nan_to_num(depth)
    if minmax is None:
        pos = x[x > 0]
        mi = np.min(pos) if pos.size else 0.0
        ma = np.max(x) if x.size else 1.0
    else:
        mi, ma = minmax
    x = (x - mi) / (ma - mi + 1e-8)
    x = (255 * np.clip(x, 0, 1)).astype(np.uint8)
    return cv2.applyColorMap(x, cv2.COLORMAP_JET), [mi, ma]


def render_image(render_fn, rays: np.ndarray, chunk: int = 4096):
    """Chunked render of (N, 6) rays -> (rgb (N,3), depth (N,)) numpy.

    Pads the final chunk to the compiled shape so one compilation serves
    every image (`InfoInv/main.py:61-72` loops variable chunks; fixed shapes
    are the XLA-friendly equivalent).
    """
    n = rays.shape[0]
    rgbs, depths = [], []
    for i in range(0, n, chunk):
        part = rays[i : i + chunk]
        pad = chunk - part.shape[0]
        if pad:
            part = np.concatenate([part, np.repeat(part[-1:], pad, 0)])
        rgb, depth = render_fn(jnp.asarray(part))
        rgb, depth = np.asarray(rgb), np.asarray(depth)
        if pad:
            rgb, depth = rgb[:-pad], depth[:-pad]
        rgbs.append(rgb)
        depths.append(depth)
    return np.concatenate(rgbs), np.concatenate(depths)


def evaluation(
    test_dataset: RayDataset,
    render_fn,
    save_path: str | None = None,
    n_vis: int = 5,
    prtx: str = "",
    chunk: int = 4096,
    compute_extra_metrics: bool = True,
    write_video: bool = True,
) -> list[float]:
    """Render held-out views, metric them, dump artifacts. Returns PSNRs."""
    import imageio.v2 as imageio

    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        os.makedirs(os.path.join(save_path, "rgbd"), exist_ok=True)

    w, h = test_dataset.img_wh
    n_img = test_dataset.all_rays.shape[0]
    interval = 1 if n_vis < 0 else max(n_img // n_vis, 1)
    idxs = list(range(0, n_img, interval))

    psnrs, ssims, l_alex, l_vgg = [], [], [], []
    rgb_frames, depth_frames = [], []
    for out_i, img_i in enumerate(idxs):
        rays = np.asarray(test_dataset.all_rays[img_i]).reshape(-1, 6)
        rgb, depth = render_image(render_fn, rays, chunk)
        rgb = np.clip(rgb, 0.0, 1.0).reshape(h, w, 3)
        depth = depth.reshape(h, w)
        depth_vis, _ = visualize_depth(depth, test_dataset.near_far)

        if test_dataset.all_rgbs is not None and len(test_dataset.all_rgbs):
            gt = np.asarray(test_dataset.all_rgbs[img_i]).reshape(h, w, 3)
            mse = float(np.mean((rgb - gt) ** 2))
            psnrs.append(mse2psnr(mse))
            if compute_extra_metrics:
                ssims.append(rgb_ssim(rgb, gt, 1))
                l_alex.append(rgb_lpips(gt, rgb, "alex"))
                l_vgg.append(rgb_lpips(gt, rgb, "vgg"))

        rgb8 = (rgb * 255).astype(np.uint8)
        rgb_frames.append(rgb8)
        depth_frames.append(depth_vis)
        if save_path is not None:
            imageio.imwrite(os.path.join(save_path, f"{prtx}{out_i:03d}.png"), rgb8)
            imageio.imwrite(
                os.path.join(save_path, "rgbd", f"{prtx}{out_i:03d}.png"),
                np.concatenate([rgb8, depth_vis], axis=1),
            )

    if save_path is not None and write_video and rgb_frames:
        try:
            imageio.mimwrite(
                os.path.join(save_path, f"{prtx}video.mp4"),
                np.stack(rgb_frames), fps=30, quality=10,
            )
            imageio.mimwrite(
                os.path.join(save_path, f"{prtx}depthvideo.mp4"),
                np.stack(depth_frames), fps=30, quality=10,
            )
        except Exception as e:  # ffmpeg may be absent; PNGs already saved
            print(f"[evaluation] video write skipped: {e}")

    if psnrs and save_path is not None:
        if compute_extra_metrics:
            stats = [np.mean(psnrs), np.mean(ssims), np.mean(l_alex), np.mean(l_vgg)]
            if np.isnan(stats[2]) or np.isnan(stats[3]):
                # Explicit marker instead of a silent NaN slot: this
                # environment has neither the lpips package nor exported
                # weights (see ngf_tpu/utils/lpips.py for how to provide
                # them offline).
                with open(
                    os.path.join(save_path, f"{prtx}lpips_unavailable.txt"), "w"
                ) as f:
                    f.write(
                        "LPIPS not computed: no 'lpips' package and no "
                        "weights npz (tools/export_lpips_weights.py). "
                        "mean.txt slots 3-4 are NaN.\n"
                    )
        else:
            stats = [np.mean(psnrs)]
        np.savetxt(os.path.join(save_path, f"{prtx}mean.txt"), np.asarray(stats))
    return psnrs


def evaluation_path(
    test_dataset: RayDataset,
    render_fn,
    c2ws: np.ndarray,
    save_path: str | None = None,
    prtx: str = "",
    chunk: int = 8192,
) -> None:
    """Render a novel camera path (no GT) (`InfoInv/main.py:142-188`)."""
    import imageio.v2 as imageio

    if save_path is not None:
        os.makedirs(save_path, exist_ok=True)
        os.makedirs(os.path.join(save_path, "rgbd"), exist_ok=True)

    w, h = test_dataset.img_wh
    # LLFF-style datasets train in NDC space; novel-path rays must be
    # projected the same way (the loader exposes its projection params).
    ndc = getattr(test_dataset, "ndc_params", None)
    rgb_frames, depth_frames = [], []
    for idx, c2w in enumerate(c2ws):
        rays_o, rays_d = get_rays(test_dataset.directions, np.asarray(c2w, np.float32))
        if ndc is not None:
            from ..data.geometry import ndc_rays_blender

            nh, nw, nf, nnear = ndc
            rays_o, rays_d = ndc_rays_blender(nh, nw, nf, nnear, rays_o, rays_d)
        rays = np.concatenate([rays_o, rays_d], 1)
        rgb, depth = render_image(render_fn, rays, chunk)
        rgb = np.clip(rgb, 0, 1).reshape(h, w, 3)
        depth_vis, _ = visualize_depth(depth.reshape(h, w), test_dataset.near_far)
        rgb8 = (rgb * 255).astype(np.uint8)
        rgb_frames.append(rgb8)
        depth_frames.append(depth_vis)
        if save_path is not None:
            imageio.imwrite(os.path.join(save_path, f"{prtx}{idx:03d}.png"), rgb8)
            imageio.imwrite(
                os.path.join(save_path, "rgbd", f"{prtx}{idx:03d}.png"),
                np.concatenate([rgb8, depth_vis], axis=1),
            )
    if save_path is not None and rgb_frames:
        try:
            imageio.mimwrite(
                os.path.join(save_path, f"{prtx}video.mp4"),
                np.stack(rgb_frames), fps=30, quality=8,
            )
            imageio.mimwrite(
                os.path.join(save_path, f"{prtx}depthvideo.mp4"),
                np.stack(depth_frames), fps=30, quality=8,
            )
        except Exception as e:
            print(f"[evaluation_path] video write skipped: {e}")
