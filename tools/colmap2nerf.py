#!/usr/bin/env python3
"""COLMAP -> transforms.json converter (offline data-prep tool).

Functional equivalent of `InfoInv/dataLoader/colmap2nerf.py` (the
instant-ngp-style converter): optionally extracts frames from a video with
ffmpeg and runs COLMAP (both gated on the binaries being installed), then
parses COLMAP's text model into the `own_data` loader's transforms.json
schema (w/h/fl_x/fl_y/cx/cy/camera_angle_{x,y} + per-frame transform
matrices with the NeRF-style reorientation and centering).

Usage:
  python tools/colmap2nerf.py --images ./images --text ./colmap_text \
      --out transforms.json
  python tools/colmap2nerf.py --video in.mp4 --video_fps 2 --run_colmap ...
"""

from __future__ import annotations

import argparse
import json
import math
import os
import shutil
import subprocess
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--video", default="", help="optional input video")
    p.add_argument("--video_fps", type=float, default=2.0)
    p.add_argument("--images", default="images", help="image folder")
    p.add_argument("--text", default="colmap_text", help="COLMAP text model dir")
    p.add_argument("--run_colmap", action="store_true")
    p.add_argument("--colmap_matcher", default="sequential",
                   choices=["exhaustive", "sequential", "spatial", "transitive", "vocab_tree"])
    p.add_argument("--aabb_scale", type=int, default=1)
    p.add_argument("--keep_colmap_coords", action="store_true")
    p.add_argument("--out", default="transforms.json")
    return p.parse_args(argv)


def run_ffmpeg(args) -> None:
    if shutil.which("ffmpeg") is None:
        sys.exit("ffmpeg not found — install it or provide --images directly")
    os.makedirs(args.images, exist_ok=True)
    subprocess.check_call(
        [
            "ffmpeg", "-i", args.video, "-qscale:v", "1", "-qmin", "1",
            "-vf", f"fps={args.video_fps}",
            os.path.join(args.images, "%04d.jpg"),
        ]
    )


def run_colmap(args) -> None:
    if shutil.which("colmap") is None:
        sys.exit("colmap binary not found — run COLMAP elsewhere and pass --text")
    db = "colmap.db"
    sparse = "colmap_sparse"
    subprocess.check_call(
        ["colmap", "feature_extractor", "--ImageReader.camera_model", "OPENCV",
         "--ImageReader.single_camera", "1", "--database_path", db,
         "--image_path", args.images]
    )
    subprocess.check_call(
        ["colmap", f"{args.colmap_matcher}_matcher", "--database_path", db]
    )
    os.makedirs(sparse, exist_ok=True)
    subprocess.check_call(
        ["colmap", "mapper", "--database_path", db, "--image_path", args.images,
         "--output_path", sparse]
    )
    os.makedirs(args.text, exist_ok=True)
    subprocess.check_call(
        ["colmap", "model_converter", "--input_path", os.path.join(sparse, "0"),
         "--output_path", args.text, "--output_type", "TXT"]
    )


def qvec2rotmat(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
            [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
            [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
        ]
    )


def parse_cameras(path: str) -> dict:
    out = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            el = line.split()
            cam_id, model = int(el[0]), el[1]
            w, h = float(el[2]), float(el[3])
            fl_x = fl_y = float(el[4])
            cx, cy = w / 2, h / 2
            k1 = k2 = p1 = p2 = 0.0
            if model == "SIMPLE_PINHOLE":
                cx, cy = float(el[5]), float(el[6])
            elif model == "PINHOLE":
                fl_y, cx, cy = float(el[5]), float(el[6]), float(el[7])
            elif model == "SIMPLE_RADIAL":
                cx, cy, k1 = float(el[5]), float(el[6]), float(el[7])
            elif model == "RADIAL":
                cx, cy, k1, k2 = (float(v) for v in el[5:9])
            elif model == "OPENCV":
                fl_y, cx, cy, k1, k2, p1, p2 = (float(v) for v in el[5:12])
            out[cam_id] = dict(
                w=w, h=h, fl_x=fl_x, fl_y=fl_y, cx=cx, cy=cy,
                k1=k1, k2=k2, p1=p1, p2=p2,
                camera_angle_x=math.atan(w / (fl_x * 2)) * 2,
                camera_angle_y=math.atan(h / (fl_y * 2)) * 2,
            )
    return out


def parse_images(path: str):
    frames = []
    with open(path) as f:
        lines = [l for l in f if not l.startswith("#")]
    for i in range(0, len(lines), 2):  # every other line is 2D points
        el = lines[i].split()
        if len(el) < 10:
            continue
        qvec = np.array([float(v) for v in el[1:5]])
        tvec = np.array([float(v) for v in el[5:8]])
        cam_id = int(el[8])
        name = el[9]
        r = qvec2rotmat(-qvec)
        t = tvec.reshape(3, 1)
        m = np.concatenate([np.concatenate([r, t], 1), [[0, 0, 0, 1]]], 0)
        c2w = np.linalg.inv(m)
        frames.append({"name": name, "cam_id": cam_id, "c2w": c2w})
    return frames


def reorient_and_center(frames) -> None:
    """NeRF-style reorientation: flip axes, center on the point the cameras
    look at, scale to ~4 units (same convention as the upstream converter)."""
    for fr in frames:
        c2w = fr["c2w"]
        c2w[0:3, 2] *= -1
        c2w[0:3, 1] *= -1
        c2w = c2w[[1, 0, 2, 3], :]
        c2w[2, :] *= -1
        fr["c2w"] = c2w

    # find the point closest to all camera optical axes
    totw, totp = 0.0, np.zeros(3)
    for f in frames:
        mf = f["c2w"][0:3, :]
        for g in frames:
            mg = g["c2w"][0:3, :]
            # closest point between the two view rays
            da, db = mf[:, 2], mg[:, 2]
            oa, ob = mf[:, 3], mg[:, 3]
            c = np.cross(da, db)
            denom = (np.linalg.norm(c) ** 2)
            if denom < 1e-10:
                continue
            t_ = ob - oa
            ta = np.linalg.det([t_, db, c]) / denom
            tb = np.linalg.det([t_, da, c]) / denom
            p = (oa + ta * da + ob + tb * db) * 0.5
            w = 1.0 / (1e-8 + denom)
            totp += p * w
            totw += w
    if totw > 0:
        totp /= totw
    for f in frames:
        f["c2w"][0:3, 3] -= totp
    avglen = np.mean([np.linalg.norm(f["c2w"][0:3, 3]) for f in frames])
    if avglen > 0:
        for f in frames:
            f["c2w"][0:3, 3] *= 4.0 / avglen


def main(argv=None):
    args = parse_args(argv)
    if args.video:
        run_ffmpeg(args)
    if args.run_colmap:
        run_colmap(args)

    cameras = parse_cameras(os.path.join(args.text, "cameras.txt"))
    frames = parse_images(os.path.join(args.text, "images.txt"))
    if not args.keep_colmap_coords:
        reorient_and_center(frames)

    cam = cameras[frames[0]["cam_id"]] if frames else next(iter(cameras.values()))
    out = {
        **cam,
        "aabb_scale": args.aabb_scale,
        "frames": [
            {
                "file_path": os.path.join(args.images, os.path.splitext(f["name"])[0]),
                "transform_matrix": f["c2w"].tolist(),
            }
            for f in frames
        ],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out} with {len(frames)} frames")


if __name__ == "__main__":
    main()
