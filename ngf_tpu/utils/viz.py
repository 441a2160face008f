"""Visualization/IO: image dumps, depth point clouds, PLY/PCD/OBJ writers.

Covers the reference's Visualizer (`UV-Mapping/util.py:76-126`: per-step PNG
dumps named ``{step:08d}-{name}.png`` and depth -> binary PCD pointclouds)
and the mesh/pointcloud export paths, without the plyfile/trimesh deps.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict

import numpy as np


def save_image(img: np.ndarray, path: str) -> None:
    import imageio.v2 as imageio

    img = np.asarray(img)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    imageio.imwrite(path, img)


def depth_to_pointcloud(
    depth: np.ndarray,
    camera_position: np.ndarray,
    ray_directions: np.ndarray,
    mask: np.ndarray | None = None,
) -> np.ndarray:
    """Depth along rays -> 3D points (`UV-Mapping/util.py:35-44`)."""
    depth = depth.reshape(-1)
    dirs = ray_directions.reshape(-1, 3)
    pts = camera_position.reshape(1, 3) + dirs * depth[:, None]
    if mask is not None:
        pts = pts[mask.reshape(-1)]
    return pts.astype(np.float32)


def save_pointcloud_pcd(points: np.ndarray, path: str) -> None:
    """Binary PCD writer (`UV-Mapping/util.py:47-73`)."""
    points = np.asarray(points, np.float32).reshape(-1, 3)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        "FIELDS x y z\n"
        "SIZE 4 4 4\n"
        "TYPE F F F\n"
        "COUNT 1 1 1\n"
        f"WIDTH {len(points)}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {len(points)}\n"
        "DATA binary\n"
    )
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        f.write(points.tobytes())


def save_ply(
    path: str,
    vertices: np.ndarray,
    faces: np.ndarray | None = None,
    colors: np.ndarray | None = None,
) -> None:
    """Minimal ASCII PLY writer (replaces the plyfile dependency used by the
    reference's mesh export, `InfoInv/utils.py:179-239`)."""
    vertices = np.asarray(vertices, np.float32).reshape(-1, 3)
    lines = ["ply", "format ascii 1.0", f"element vertex {len(vertices)}"]
    lines += ["property float x", "property float y", "property float z"]
    if colors is not None:
        colors = np.asarray(colors)
        if colors.dtype != np.uint8:
            colors = (np.clip(colors, 0, 1) * 255).astype(np.uint8)
        lines += ["property uchar red", "property uchar green", "property uchar blue"]
    if faces is not None:
        faces = np.asarray(faces, np.int64).reshape(-1, 3)
        lines += [f"element face {len(faces)}", "property list uchar int vertex_indices"]
    lines += ["end_header"]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
        for i, v in enumerate(vertices):
            row = f"{v[0]} {v[1]} {v[2]}"
            if colors is not None:
                c = colors[i]
                row += f" {c[0]} {c[1]} {c[2]}"
            f.write(row + "\n")
        if faces is not None:
            for face in faces:
                f.write(f"3 {face[0]} {face[1]} {face[2]}\n")


def save_obj(path: str, vertices: np.ndarray, faces: np.ndarray) -> None:
    with open(path, "w") as f:
        for v in np.asarray(vertices).reshape(-1, 3):
            f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for face in np.asarray(faces).reshape(-1, 3):
            f.write(f"f {face[0] + 1} {face[1] + 1} {face[2] + 1}\n")


class Visualizer:
    """Training visual dumps + loss accumulation (`UV-Mapping/util.py:76-126`)."""

    def __init__(self, log_dir: str, image_dir: str | None = None):
        self.log_dir = log_dir
        self.image_dir = image_dir or log_dir
        os.makedirs(self.image_dir, exist_ok=True)
        self.reset()

    def display_current_results(
        self, visuals: dict, total_steps: int, camera_position=None, ray_directions=None
    ) -> None:
        for name, img in visuals.items():
            img = np.asarray(img)
            save_image(img, os.path.join(self.image_dir, f"{total_steps:08d}-{name}.png"))

        if camera_position is not None and ray_directions is not None:
            for name, img in visuals.items():
                img = np.asarray(img)
                if img.ndim == 2 and "depth" in name:
                    depth = img.reshape(-1)
                    pcd = depth_to_pointcloud(
                        depth, np.asarray(camera_position), np.asarray(ray_directions),
                        depth != 0,
                    )
                    save_pointcloud_pcd(
                        pcd,
                        os.path.join(self.image_dir, f"step-{total_steps:08d}-{name}.pcd"),
                    )

    def reset(self) -> None:
        self.start_time = time.time()
        self.acc_iterations = 0
        self.acc_losses: OrderedDict = OrderedDict()

    def accumulate_losses(self, losses: dict) -> None:
        self.acc_iterations += 1
        for k, v in losses.items():
            self.acc_losses[k] = self.acc_losses.get(k, 0.0) + float(v)

    def print_losses(self, total_steps: int) -> str:
        msg = (
            f"End of iteration {total_steps} \t Number of batches "
            f"{self.acc_iterations} \t Time taken: {time.time() - self.start_time:.2f}s\n"
            "[Average Loss] "
            + "   ".join(
                f"{k}: {v / max(self.acc_iterations, 1):.10f}"
                for k, v in self.acc_losses.items()
            )
        )
        with open(os.path.join(self.log_dir, "log.txt"), "a") as f:
            f.write(msg + "\n")
        print(msg)
        return msg
