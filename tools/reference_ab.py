#!/usr/bin/env python3
"""End-to-end quality A/B: the ACTUAL reference InfoInv torch code vs ngf_tpu.

The strongest achievable approximation of the "match reference PSNR" north
star without Synthetic-NeRF data (VERDICT round-2 item 3): export the
bundled analytic scene to the reference's Blender dataset format, train
`/root/reference/InfoInv/main.py:train()` on it unmodified (torch CPU), train
our `main.py` CLI on the *same exported files* with the same schedule, and
compare held-out test PSNR.

The reference code is imported from the read-only mirror and run as-is; the
only harness-side accommodations are environment shims for packages absent
here (configargparse / kornia / lpips / ffmpeg-mp4), injected via
sys.modules without touching any reference file.

Usage (each phase is resumable):
  python tools/reference_ab.py --out /tmp/ref_ab            # all phases
  python tools/reference_ab.py --out /tmp/ref_ab --phase export|ref|ours|report
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_DIRS = {
    "infoinv": "/root/reference/InfoInv",
    "triplane": "/root/reference/TriPlane",
}


# --------------------------------------------------------------------- export

def export_scene(scene_dir: str, views: int, test_views: int, wh: int) -> None:
    """Write the analytic scene as a Blender-format dataset
    (`transforms_{split}.json` + RGBA PNGs), loadable by BOTH the
    reference's `dataLoader/blender.py` and our `ngf_tpu/data/blender.py`.

    Both trainers then consume the *same uint8 PNG pixels*, so quantization
    affects the two sides identically.
    """
    import imageio.v2 as imageio

    sys.path.insert(0, REPO)
    from ngf_tpu.data.synthetic import SyntheticDataset

    os.makedirs(scene_dir, exist_ok=True)
    for split, n in (("train", views), ("test", test_views)):
        ds = SyntheticDataset(split=split, n_views=n, wh=(wh, wh), is_stack=True)
        os.makedirs(os.path.join(scene_dir, split), exist_ok=True)
        frames = []
        for i in range(n):
            img = np.clip(ds.all_rgbs[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            rgba = np.concatenate(
                [img, np.full_like(img[..., :1], 255)], axis=-1
            )  # opaque alpha: the loader's white-blend is then a no-op
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(scene_dir, f"{rel}.png"), rgba)
            frames.append(
                {"file_path": rel, "transform_matrix": ds.poses[i].tolist()}
            )
        meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
        with open(os.path.join(scene_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    print(f"[export] wrote {views}+{test_views} views at {wh}x{wh} -> {scene_dir}")


def export_scene_llff(scene_dir: str, views: int, wh: int) -> None:
    """Write the analytic scene as an LLFF-format dataset
    (`poses_bounds.npy` + `images_4/`), loadable by BOTH the reference's
    `dataLoader/llff.py` and our `ngf_tpu/data/llff.py` — certifying the
    NDC pipeline (pose shuffle, centering, near-scale, `ndc_rays_blender`)
    end-to-end. Cameras sit on a forward-facing arc at z ~ +4 looking at
    the origin (fern-style), the regime LLFF/NDC is built for. The test
    split is the loaders' hardcoded hold-every-8.
    """
    import imageio.v2 as imageio

    sys.path.insert(0, REPO)
    from ngf_tpu.data.geometry import get_ray_directions_blender
    from ngf_tpu.data.synthetic import _render_rays_gt

    os.makedirs(os.path.join(scene_dir, "images_4"), exist_ok=True)
    fov = 0.6911112070083618
    focal = 0.5 * wh / np.tan(0.5 * fov)
    dirs = get_ray_directions_blender(wh, wh, [focal, focal])
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)

    rows = []
    for i in range(views):
        az = (i / max(1, views - 1) - 0.5) * 1.0  # +-0.5 rad arc
        eye = np.array([1.4 * np.sin(az), 0.35 * np.sin(2.1 * az), 4.0],
                       np.float32)
        back = eye / np.linalg.norm(eye)  # looking at the origin
        right = np.cross(np.array([0.0, 1.0, 0.0], np.float32), back)
        right /= np.linalg.norm(right)
        up = np.cross(back, right)
        c2w = np.stack([right, up, back, eye], axis=1)  # (3, 4) right-up-back

        rd = dirs.reshape(-1, 3) @ c2w[:3, :3].T
        ro = np.broadcast_to(eye, rd.shape)
        rgb = _render_rays_gt(np.ascontiguousarray(ro, np.float32),
                              rd.astype(np.float32)).reshape(wh, wh, 3)
        imageio.imwrite(
            os.path.join(scene_dir, "images_4", f"image{i:03d}.png"),
            np.clip(rgb * 255.0 + 0.5, 0, 255).astype(np.uint8),
        )

        # raw LLFF convention: columns (down, right, back, t) + hwf at the
        # pretend-full resolution (4x the exported files; loaders divide by
        # the --downsample 4 they are given)
        raw = np.concatenate(
            [np.stack([-up, right, back, eye], axis=1),
             np.array([[4.0 * wh], [4.0 * wh], [4.0 * focal]], np.float32)],
            axis=1,
        )
        rows.append(np.concatenate([raw.reshape(-1), [2.5, 5.5]]))
    np.save(os.path.join(scene_dir, "poses_bounds.npy"),
            np.stack(rows).astype(np.float64))
    print(f"[export] wrote {views} LLFF views at {wh}x{wh} -> {scene_dir}")


def export_scene_own(scene_dir: str, views: int, test_views: int,
                     wh: int) -> None:
    """Write the analytic scene in the instant-ngp-style ``own_data``
    layout (`InfoInv/dataLoader/your_own_data.py:40-54`):
    ``transforms_{split}.json`` with explicit w/h/cx/cy + both camera
    angles, Blender-convention ``transform_matrix`` (both loaders apply
    blender2opencv themselves). Exported at native resolution and run at
    ``--downsample 1`` so the reference's cx/cy-not-downsampled latent bug
    (our documented deviation) is out of the comparison's path.
    """
    import imageio.v2 as imageio

    sys.path.insert(0, REPO)
    from ngf_tpu.data.synthetic import SyntheticDataset

    os.makedirs(scene_dir, exist_ok=True)
    fov = 0.6911112070083618
    for split, n in (("train", views), ("test", test_views)):
        ds = SyntheticDataset(split=split, n_views=n, wh=(wh, wh), is_stack=True)
        os.makedirs(os.path.join(scene_dir, split), exist_ok=True)
        frames = []
        for i in range(n):
            img = np.clip(ds.all_rgbs[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            rel = f"./{split}/r_{i}"
            imageio.imwrite(os.path.join(scene_dir, f"{rel}.png"), img)
            frames.append(
                {"file_path": rel, "transform_matrix": ds.poses[i].tolist()}
            )
        meta = {"w": wh, "h": wh, "cx": wh / 2.0, "cy": wh / 2.0,
                "camera_angle_x": fov, "camera_angle_y": fov,
                "frames": frames}
        with open(os.path.join(scene_dir, f"transforms_{split}.json"), "w") as f:
            json.dump(meta, f)
    print(f"[export] wrote {views}+{test_views} own_data views at {wh}x{wh} "
          f"-> {scene_dir}")


def _tt_height(wh: int) -> int:
    """TanksTemple export height: the loaders hardcode the nominal
    1920x1080 frame, so the export must divide it integrally on BOTH axes
    (h in {36, 72} -> 64x36 / 128x72). Picks the nearest not-larger tier."""
    return 36 if wh <= 36 else 72


def export_scene_nsvf(scene_dir: str, views: int, test_views: int, wh: int,
                      fmt: str = "nsvf") -> None:
    """Write the analytic scene in the NSVF on-disk layout
    (`InfoInv/dataLoader/nsvf.py:65-113`): ``bbox.txt``, ``intrinsics.txt``,
    ``pose/{0_,2_}*.txt`` 4x4 OpenCV-convention c2w, ``rgb/{0_,2_}*.png`` —
    loadable by BOTH the reference's ``NSVF`` and our
    ``ngf_tpu/data/nsvf.py``. ``fmt='tankstemple'`` writes the
    Tanks&Temples variant instead (`tankstemple.py:114-123`): a full 3x3
    matrix in ``intrinsics.txt`` at the nominal 1920x1080 frame and a
    128x72 export (both loaders hardcode the nominal frame size; 1920/15 x
    1080/15 keeps the downsample integral on both axes).

    The loaders' OpenCV ray convention (``get_ray_directions`` + 4x4 c2w
    from ``pose/``) is met by exporting ``pose_gl @ diag(1,-1,-1,1)`` of
    the same Blender-convention orbit the other exporters use, so all
    format A/Bs see the same geometry.
    """
    import imageio.v2 as imageio

    sys.path.insert(0, REPO)
    from ngf_tpu.data.blender import BLENDER2OPENCV
    from ngf_tpu.data.synthetic import SyntheticDataset

    if fmt == "tankstemple":
        h = _tt_height(wh)
        w, nominal = 16 * h // 9, (1920.0, 1080.0)
    else:
        w, h, nominal = wh, wh, (800.0, 800.0)
    os.makedirs(os.path.join(scene_dir, "pose"), exist_ok=True)
    os.makedirs(os.path.join(scene_dir, "rgb"), exist_ok=True)

    fov = 0.6911112070083618
    focal = 0.5 * w / np.tan(0.5 * fov)  # what SyntheticDataset renders with
    if fmt == "tankstemple":
        s = nominal[0] / w  # == nominal[1] / h by construction
        intr = np.array([[focal * s, 0.0, nominal[0] / 2],
                         [0.0, focal * s, nominal[1] / 2],
                         [0.0, 0.0, 1.0]])
        np.savetxt(os.path.join(scene_dir, "intrinsics.txt"), intr)
    else:
        with open(os.path.join(scene_dir, "intrinsics.txt"), "w") as f:
            # both loaders read only the first token; principal point is
            # hardcoded at the nominal frame center (nsvf.py:66-67)
            f.write(f"{focal * nominal[0] / w:.9f} "
                    f"{nominal[0]/2} {nominal[1]/2} 0.\n0. 0. 0.\n0. 0. 1.\n")
    with open(os.path.join(scene_dir, "bbox.txt"), "w") as f:
        f.write("-1.5 -1.5 -1.5 1.5 1.5 1.5 0.01\n")

    for split, prefix, n in (("train", "0", views), ("test", "2", test_views)):
        ds = SyntheticDataset(split=split, n_views=n, wh=(w, h), is_stack=True)
        for i in range(n):
            img = np.clip(ds.all_rgbs[i] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            imageio.imwrite(
                os.path.join(scene_dir, "rgb", f"{prefix}_{i:03d}.png"), img
            )
            np.savetxt(os.path.join(scene_dir, "pose", f"{prefix}_{i:03d}.txt"),
                       ds.poses[i] @ BLENDER2OPENCV)
    print(f"[export] wrote {views}+{test_views} {fmt} views at {w}x{h} "
          f"-> {scene_dir}")


# ------------------------------------------------------------------ ref shims

def _install_shims() -> None:
    """sys.modules stand-ins for packages the reference imports but this
    zero-egress image lacks. Behavior-preserving: configargparse degrades to
    plain argparse (we pass all flags on the command line), kornia's
    create_meshgrid is the documented (1, H, W, 2) xy pixel grid, lpips
    returns NaN (recorded as-is in mean.txt), mp4 writing is skipped."""
    import types

    import torch

    if "configargparse" not in sys.modules:
        import argparse as _ap

        class _Parser(_ap.ArgumentParser):
            def add_argument(self, *a, **kw):
                kw.pop("is_config_file", None)
                return super().add_argument(*a, **kw)

        m = types.ModuleType("configargparse")
        m.ArgumentParser = _Parser
        sys.modules["configargparse"] = m

    if "torchvision" not in sys.modules:
        class _ToTensor:
            def __call__(self, pic):
                arr = np.array(pic, dtype=np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[..., None]
                return torch.from_numpy(arr.transpose(2, 0, 1)).contiguous()

        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tr.ToTensor = _ToTensor
        tv.transforms = tr
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr

    if "kornia" not in sys.modules:
        def create_meshgrid(h, w, normalized_coordinates=True, device=None):
            if normalized_coordinates:
                ys = torch.linspace(-1, 1, h)
                xs = torch.linspace(-1, 1, w)
            else:
                ys = torch.arange(h, dtype=torch.float32)
                xs = torch.arange(w, dtype=torch.float32)
            gy, gx = torch.meshgrid(ys, xs, indexing="ij")
            return torch.stack([gx, gy], dim=-1)[None]  # (1, H, W, 2) xy

        m = types.ModuleType("kornia")
        m.create_meshgrid = create_meshgrid
        sys.modules["kornia"] = m

    if "lpips" not in sys.modules:
        class _FakeLPIPS:
            def __init__(self, *a, **kw):
                pass

            def eval(self):
                return self

            def to(self, device):
                return self

            def __call__(self, gt, im, normalize=True):
                return torch.tensor(float("nan"))

        m = types.ModuleType("lpips")
        m.LPIPS = _FakeLPIPS
        sys.modules["lpips"] = m

    # plyfile / skimage are imported at utils.py module level but only used
    # by the SDF->PLY export path, which this A/B never calls.
    for name in ("plyfile", "skimage", "skimage.measure"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)
    if not hasattr(sys.modules["skimage"], "measure"):
        sys.modules["skimage"].measure = sys.modules["skimage.measure"]

    import imageio

    _orig = imageio.mimwrite

    def mimwrite(path, *a, **kw):
        if str(path).endswith(".mp4"):
            return None  # no ffmpeg plugin in this image
        return _orig(path, *a, **kw)

    imageio.mimwrite = mimwrite


def _downsample_for(a: argparse.Namespace) -> float:
    """--downsample for each exported format: the loaders fix the nominal
    full-resolution frame (blender/nsvf 800, llff 4x images_4 files,
    tankstemple 1920x1080) and divide by this."""
    if a.dataset == "llff":
        return 4.0
    if a.dataset == "tankstemple":
        return 1080.0 / _tt_height(a.wh)  # integral on both axes
    if a.dataset == "own_data":
        return 1.0  # exported at native resolution with explicit w/h
    return 800.0 / a.wh


def _int_list(s: str) -> list[int]:
    return [int(v) for v in str(s).split(",") if str(v).strip()]


def _splat(flag: str, values: list[int]) -> list[str]:
    out: list[str] = []
    for v in values:
        out += [flag, str(v)]
    return out


def run_reference(scene_dir: str, log_dir: str, a: argparse.Namespace) -> None:
    _install_shims()
    ref_dir = REF_DIRS[a.subsystem]
    sys.path.insert(0, ref_dir)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_main", os.path.join(ref_dir, "main.py")
    )
    ref_main = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_main)

    ds = _downsample_for(a)
    cmd = [
        "--expname", "ref",
        "--basedir", log_dir,
        "--datadir", scene_dir,
        "--dataset_name", a.dataset,
        "--downsample_train", str(ds),
        "--downsample_test", str(ds),
        "--model_name", "TriPlane",
        "--n_iters", str(a.iters),
        "--batch_size", str(a.batch),
        "--nSamples", str(a.nsamples),
    ] + _splat("--update_AlphaMask_list", a.alpha_at) + [
        # An upsample co-scheduled with the shrink event mirrors the
        # reference's own lego schedule (upsamp_list and
        # update_AlphaMask_list both start at 2000): the reference's
        # shrink() replaces plane Parameters WITHOUT recreating the
        # optimizer (TriPlane/main.py:334-341), so without a same-iteration
        # upsample its planes silently stop training (stale Adam refs) — a
        # latent reference bug its shipped configs never expose.
    ] + _splat(
        "--upsamp_list", a.upsamp_at if a.upsamp_at else [10 * a.iters]
    ) + [
        "--N_voxel_init", str(a.n_voxel_init),
        "--N_voxel_final", str(a.n_voxel_final),
        "--N_vis", "0",
        "--vis_every", str(10 * a.iters),
        "--render_test", "1",
    ]
    if a.subsystem == "infoinv":
        if a.infoinv:
            cmd.append("--infoinv")  # BASELINE config #2; omit for #1 (plain)
    else:
        cmd += ["--gauge_start", str(a.gauge_start)]
    args = ref_main.config_parser(cmd)
    # The reference seeds only under __main__ (`TriPlane/main.py:394-395`,
    # same lines in InfoInv), which importlib bypasses — seed explicitly so
    # seed replication (PARITY.md noise bands) is a controlled experiment.
    import torch

    torch.manual_seed(a.seed)
    np.random.seed(a.seed)
    t0 = time.time()
    ref_main.train(args)
    print(f"[ref] train+eval done in {time.time()-t0:.0f}s")
    mean = np.loadtxt(os.path.join(log_dir, "ref/imgs_test_all/mean.txt"))
    print(f"[ref] test PSNR = {float(np.atleast_1d(mean)[0]):.2f} dB")


# ----------------------------------------------------------------------- ours

def run_ours(scene_dir: str, log_dir: str, a: argparse.Namespace) -> None:
    if getattr(a, "ours_device", "cpu") == "tpu":
        env = dict(os.environ)  # inherit the axon TPU registration
        env.pop("JAX_PLATFORMS", None)
    else:
        env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    ds = _downsample_for(a)
    cmd = [
        sys.executable, os.path.join(REPO, "main.py"),
        "--expname", "ours",
        "--basedir", log_dir,
        "--datadir", scene_dir,
        "--dataset_name", a.dataset,
        "--downsample_train", str(ds),
        "--downsample_test", str(ds),
        "--subsystem", a.subsystem,
    ] + (
        (["--infoinv"] if a.infoinv else []) if a.subsystem == "infoinv"
        else ["--gauge_start", str(a.gauge_start),
              "--N_voxel_init", str(a.n_voxel_init),
              "--N_voxel_final", str(a.n_voxel_final)]
        + _splat("--upsamp_list", a.upsamp_at)
    ) + [
        "--n_iters", str(a.iters),
        "--batch_size", str(a.batch),
        "--nSamples", str(a.nsamples),
    ] + _splat("--update_AlphaMask_list", a.alpha_at) + [
        "--N_vis", "0",
        "--vis_every", "0",
        "--render_test", "1",
        "--compute_extra_metrics", "0",
        "--save_every", "0",
        # shipped TPU-native execution knobs (the comparison is our
        # framework as shipped vs the reference as shipped)
        "--sample_cap", "-1",
        "--open_sample_cap", str(a.nsamples),
        # dense fused shading — the shipped quality configuration (rgb
        # top-K is the documented aggressive knob and measurably lossy
        # during training, PARITY.md)
        "--rgb_cap", "0",
        "--fused_fetch", "1",
        "--steps_per_call", "8",
        "--seed", str(a.seed),
    ] + (a.ours_extra.split() if a.ours_extra else [])
    t0 = time.time()
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    print(f"[ours] train+eval done in {time.time()-t0:.0f}s")
    mean = np.loadtxt(os.path.join(log_dir, "ours/imgs_test_all/mean.txt"))
    print(f"[ours] test PSNR = {float(np.atleast_1d(mean)[0]):.2f} dB")


def report(log_dir: str) -> None:
    ref = float(
        np.atleast_1d(np.loadtxt(os.path.join(log_dir, "ref/imgs_test_all/mean.txt")))[0]
    )
    ours = float(
        np.atleast_1d(np.loadtxt(os.path.join(log_dir, "ours/imgs_test_all/mean.txt")))[0]
    )
    out = {"ref_psnr_db": round(ref, 2), "ours_psnr_db": round(ours, 2),
           "gap_db": round(ours - ref, 2)}
    print(json.dumps(out))
    with open(os.path.join(log_dir, "ab_result.json"), "w") as f:
        json.dump(out, f)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ref_ab")
    p.add_argument("--phase", default="all",
                   choices=["all", "export", "ref", "ours", "report"])
    p.add_argument("--dataset", default="blender",
                   choices=["blender", "llff", "nsvf", "tankstemple",
                            "own_data"],
                   help="exported dataset format: blender (inward ring), "
                        "llff (forward-facing arc, NDC pipeline), nsvf / "
                        "tankstemple (OpenCV-pose txt layouts), own_data "
                        "(instant-ngp transforms.json)")
    p.add_argument("--views", type=int, default=24)
    p.add_argument("--test-views", type=int, default=4)
    p.add_argument("--wh", type=int, default=64)
    p.add_argument("--iters", type=int, default=800)
    p.add_argument("--batch", type=int, default=1024)
    p.add_argument("--nsamples", type=int, default=448)
    p.add_argument("--n-voxel-init", type=int, default=256 ** 3,
                   dest="n_voxel_init")
    p.add_argument("--n-voxel-final", type=int, default=256 ** 3,
                   dest="n_voxel_final",
                   help="> init exercises the reference's exp-interpolated "
                        "voxel growth schedule across the upsample list")
    p.add_argument("--alpha-at", type=_int_list, default=[400],
                   help="comma list of alpha-mask event iterations")
    p.add_argument("--subsystem", default="infoinv",
                   choices=["infoinv", "triplane"])
    p.add_argument("--infoinv", type=int, default=1,
                   help="infoinv subsystem: 1 = --infoinv encoding "
                        "(BASELINE config #2), 0 = plain TriPlane "
                        "orthogonal projection (config #1)")
    p.add_argument("--gauge-start", type=int, default=400, dest="gauge_start",
                   help="triplane subsystem: learned-gauge activation iter")
    p.add_argument("--upsamp-at", type=_int_list, default=[], dest="upsamp_at",
                   help="triplane: comma list of upsample event iterations "
                        "(empty = never); co-schedule with --alpha-at to "
                        "mirror the reference lego schedule")
    p.add_argument("--seed", type=int, default=20211202,
                   help="training seed for BOTH sides (the exported scene "
                        "is deterministic, so runs with different seeds "
                        "share it); used for seed-replicated noise bands")
    p.add_argument("--ours-extra", default="",
                   help="extra CLI flags appended to our main.py run "
                        "(diagnostics, e.g. '--sample_cap 0 --rgb_cap 0')")
    p.add_argument("--ours-device", default="cpu", choices=["cpu", "tpu"],
                   dest="ours_device",
                   help="backend for OUR side (the torch reference always "
                        "runs CPU here). 'tpu' uses the shipped production "
                        "platform — minutes instead of an hour per run at "
                        "these scales once programs are service-cached; "
                        "PSNR is platform-robust (f32 semantics match; "
                        "keep one device per config for clean noise bands)")
    a = p.parse_args()

    scene = os.path.join(a.out, "scene")
    logs = os.path.join(a.out, "log")
    os.makedirs(logs, exist_ok=True)
    if a.phase in ("all", "export"):
        if a.dataset == "llff":
            export_scene_llff(scene, a.views, a.wh)
        elif a.dataset in ("nsvf", "tankstemple"):
            export_scene_nsvf(scene, a.views, a.test_views, a.wh,
                              fmt=a.dataset)
        elif a.dataset == "own_data":
            export_scene_own(scene, a.views, a.test_views, a.wh)
        else:
            export_scene(scene, a.views, a.test_views, a.wh)
    if a.phase in ("all", "ref"):
        run_reference(scene, logs, a)
    if a.phase in ("all", "ours"):
        run_ours(scene, logs, a)
    if a.phase in ("all", "report"):
        report(logs)


if __name__ == "__main__":
    main()
