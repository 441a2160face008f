#!/usr/bin/env python3
"""UV-Mapping A/B vs the ACTUAL reference torch code (BASELINE config #5).

The mirror ships no DTU ``data.hdf5``, so this harness closes the loop the
other way: it exports our synthetic DTU stand-in (textured sphere,
`ngf_tpu/data/dtu.py:SyntheticDtuDataset`) in the reference's exact on-disk
format (`UV-Mapping/data/dtu.py:65-114`: trainData camera npys + data.hdf5
images/masks + pcd_down_unit.ply + test_views.txt), trains the reference's
`model.Model`/`NeuTex` on it unmodified (torch CPU; shims below), trains our
`uv_train.py` CLI on the *same files* (exercising our real-format
`DtuDataset` hdf5 path), and compares held-out test-view PSNR.

Reference-side accommodations (behavior-preserving):
- ``trimesh`` stand-in: ascii-PLY vertex reader (the reference only reads
  ``point_cloud.vertices``, which no loss consumes — `model.py:330-340`).
- ``torch.Tensor.cuda`` -> identity: the template samplers hardcode
  ``.cuda()`` (`gauge_fields.py:129,143,154,165`); everything else honors
  ``--gpu_ids -1`` (`model.py:78`).

Usage:
  python tools/reference_uv_ab.py --out /tmp/uv_ab             # all phases
  python tools/reference_uv_ab.py --out ... --phase export|ref|ours|report
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
UV_DIR = "/root/reference/UV-Mapping"
TEST_VIEWS = "5,15,25,35"


# --------------------------------------------------------------------- export

def export_scene(scene_dir: str, views: int, wh: int) -> None:
    sys.path.insert(0, REPO)
    from ngf_tpu.data.dtu import SyntheticDtuDataset, write_dtu_scene

    ds = SyntheticDtuDataset(n_views=views, wh=(wh, wh))
    write_dtu_scene(scene_dir, ds, test_views=TEST_VIEWS)
    print(f"[export] {views} views at {wh}x{wh} -> {scene_dir} "
          f"(test views {TEST_VIEWS})")


# ------------------------------------------------------------------ ref shims

def _install_uv_shims() -> None:
    import types

    import torch

    if "trimesh" not in sys.modules:
        class _Cloud:
            def __init__(self, vertices):
                self.vertices = vertices

        def load(path):
            verts, in_header = [], True
            with open(path) as f:
                for line in f:
                    if in_header:
                        if line.strip() == "end_header":
                            in_header = False
                        continue
                    verts.append([float(x) for x in line.split()[:3]])
            return _Cloud(np.asarray(verts, np.float64))

        m = types.ModuleType("trimesh")
        m.load = load
        sys.modules["trimesh"] = m

    torch.Tensor.cuda = lambda self, *a, **kw: self  # gauge_fields hardcodes

    # CPU execution: Model.initialize hard-asserts a GPU and wraps in
    # DataParallel (`model.py:282-285`); every later access unwraps with an
    # isinstance guard, so a CPU run just skips the wrap. The replacement
    # reproduces the original body minus the assert/to(device)/DataParallel.
    sys.path.insert(0, UV_DIR)
    import model.model as mm

    def _cpu_initialize(self, opt):
        mm.BaseModel.initialize(self, opt)
        self.model_names = ["NeuTex"]
        self.NeuTex = mm.NeuTex(opt)
        if self.is_train:
            self.schedulers = []
            self.optimizers = []
            params = list(self.NeuTex.parameters())
            self.optimizer = torch.optim.Adam(params, lr=opt.lr)
            self.optimizers.append(self.optimizer)

    mm.Model.initialize = _cpu_initialize

    # The released code CRASHES on the first training step: NeuTex.forward
    # unconditionally calls `inverse_gauge.map(uv)` (`model.py:56`) and
    # `map` does `uv.view(input_shape, -1, dim)` with input_shape a
    # torch.Size — a TypeError (`gauge_fields.py:205`). Patch in the
    # unambiguous intent (flatten, then restore input_shape[:-1] + (3,),
    # which the very next line already assumes) so the reference is
    # runnable at all. Our framework fixes this the same way
    # (`ngf_tpu/fields/neutex.py`, PARITY.md deviation list).
    import model.gauge_fields as gf
    import torch as _torch

    def _fixed_map(self, uv):
        assert uv.shape[-1] == self.input_point_dim
        input_shape = uv.shape
        output = self.inverse_network(uv.reshape(-1, self.input_point_dim))
        return output.view(input_shape[:-1] + (3,))

    gf.InverseGauge.map = _fixed_map


def _ref_opt(scene_dir: str, ckpt_dir: str, iters: int):
    sys.path.insert(0, UV_DIR)
    from options import TrainOptions

    argv = [
        "--name", "ref", "--dataset_name", "dtu",
        "--data_root", scene_dir,
        "--checkpoints_dir", ckpt_dir,
        "--random_sample", "balanced", "--random_sample_size", "24",
        "--sample_num", "64", "--primitive_type", "square",
        "--points_per_primitive", "2500",
        "--loss_color_weight", "1", "--loss_bg_weight", "1",
        "--loss_inverse_mapping_weight", "0",
        "--batch_size", "1", "--lr", "0.0001", "--gpu_ids", "-1",
        "--niter", str(iters), "--niter_decay", "0", "--n_threads", "0",
        "--save_iter_freq", str(10 * iters),
        "--train_and_test", "0", "--print_freq", "500",
    ]
    old = sys.argv
    sys.argv = ["train.py"] + argv
    try:
        opt = TrainOptions().parse()
    finally:
        sys.argv = old
    return opt


def _render_ref_test_views(model, opt) -> list[float]:
    import torch
    from data.dtu import create_dataset

    opt2 = copy.deepcopy(opt)
    opt2.use_test_data = 1
    opt2.random_sample = "no_crop"
    ds = create_dataset(opt2)
    chunk = opt.random_sample_size ** 2
    psnrs = []
    model.eval()
    for i in range(len(ds)):
        data = ds.get_item(i)
        gt = data["gt_image"].clone()
        raydir = data["raydir"].clone()
        n = raydir.shape[1]
        out = np.zeros((n, 3), np.float32)
        for k in range(0, n, chunk):
            end = min(k + chunk, n)
            data["raydir"] = raydir[:, k:end, :]
            data["gt_image"] = gt[:, k:end, :]
            model.set_input(data)
            with torch.no_grad():
                model.test()
            out[k:end] = model.ray_color.cpu().numpy().reshape(-1, 3)
        mse = float(np.mean((out - gt.numpy().reshape(-1, 3)) ** 2))
        psnrs.append(-10.0 * np.log10(mse))
    model.train()
    return psnrs


def run_reference(scene_dir: str, ckpt_dir: str, iters: int) -> None:
    _install_uv_shims()
    import torch

    torch.manual_seed(0)
    np.random.seed(0)
    opt = _ref_opt(scene_dir, ckpt_dir, iters)
    from data.dtu import create_data_loader
    from model.model import create_model

    loader = create_data_loader(opt)
    model = create_model(opt)
    model.setup(opt)
    model.train()

    t0 = time.time()
    steps = 0
    losses: dict = {}
    while steps < iters:
        for data in loader:
            model.set_input(data)
            model.optimize_parameters()
            if steps % max(1, min(500, iters // 20)) == 0:
                cur = model.get_current_losses()
                losses = {k: float(v) for k, v in cur.items()}
                print(f"[ref] step {steps}: " + ", ".join(
                    f"{k}={v:.5f}" for k, v in losses.items()), flush=True)
            model.update_learning_rate()
            steps += 1
            if steps >= iters:
                break
    psnrs = _render_ref_test_views(model, opt)
    result = {"psnr_per_view": [round(p, 2) for p in psnrs],
              "psnr_mean": round(float(np.mean(psnrs)), 2),
              "final_losses": losses,
              "train_s": round(time.time() - t0, 1)}
    print(f"[ref] test PSNR = {result['psnr_mean']:.2f} dB "
          f"({result['psnr_per_view']})")
    with open(os.path.join(ckpt_dir, "ref_result.json"), "w") as f:
        json.dump(result, f)


# ----------------------------------------------------------------------- ours

def run_ours(scene_dir: str, ckpt_dir: str, iters: int) -> None:
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    cmd = [
        sys.executable, os.path.join(REPO, "uv_train.py"),
        "--name", "ours", "--dataset_name", "dtu",
        "--data_root", scene_dir,
        "--checkpoints_dir", ckpt_dir,
        "--test_views", TEST_VIEWS,
        "--random_sample", "balanced", "--random_sample_size", "24",
        "--sample_num", "64", "--primitive_type", "square",
        "--points_per_primitive", "2500",
        "--loss_color_weight", "1", "--loss_bg_weight", "1",
        "--loss_inverse_mapping_weight", "0",
        "--lr", "0.0001", "--niter", str(iters),
        "--save_iter_freq", str(iters), "--test_freq", "0",
        "--print_freq", "500",
    ]
    t0 = time.time()
    subprocess.run(cmd, check=True, env=env, cwd=REPO)
    print(f"[ours] trained in {time.time()-t0:.0f}s")

    sys.path.insert(0, REPO)
    from ngf_tpu.data.dtu import DtuDataset
    from ngf_tpu.fields.neutex import NeuTexConfig
    from ngf_tpu.train.uv_loop import UVTrainer

    ds = DtuDataset(scene_dir, random_sample="no_crop",
                    use_test_data=True, test_views=TEST_VIEWS)
    cfg = NeuTexConfig(primitive_type="square", sample_num=64,
                       points_per_primitive=2500)
    trainer = UVTrainer(cfg, ds, save_dir=os.path.join(ckpt_dir, "ours"))
    trainer.load_networks("latest", os.path.join(ckpt_dir, "ours"))
    psnrs = []
    for i in ds.indexes:
        rgb, _ = trainer.render_view(
            ds.campos[i], ds.height, ds.width, ds.focal[i],
            ds.extrinsics[i][0:3, 0:3], ds.princpt[i], chunk=576,
        )
        mse = float(np.mean((rgb - ds.gt_image[i]) ** 2))
        psnrs.append(-10.0 * np.log10(mse))
    result = {"psnr_per_view": [round(p, 2) for p in psnrs],
              "psnr_mean": round(float(np.mean(psnrs)), 2)}
    print(f"[ours] test PSNR = {result['psnr_mean']:.2f} dB "
          f"({result['psnr_per_view']})")
    with open(os.path.join(ckpt_dir, "ours_result.json"), "w") as f:
        json.dump(result, f)


def report(ckpt_dir: str) -> None:
    with open(os.path.join(ckpt_dir, "ref_result.json")) as f:
        ref = json.load(f)
    with open(os.path.join(ckpt_dir, "ours_result.json")) as f:
        ours = json.load(f)
    out = {"ref_psnr_db": ref["psnr_mean"], "ours_psnr_db": ours["psnr_mean"],
           "gap_db": round(ours["psnr_mean"] - ref["psnr_mean"], 2)}
    print(json.dumps(out))
    with open(os.path.join(ckpt_dir, "ab_result.json"), "w") as f:
        json.dump(out, f)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/uv_ab")
    p.add_argument("--phase", default="all",
                   choices=["all", "export", "ref", "ours", "report"])
    p.add_argument("--views", type=int, default=40)
    p.add_argument("--wh", type=int, default=64)
    p.add_argument("--iters", type=int, default=6000)
    a = p.parse_args()

    scene = os.path.join(a.out, "scene")
    ckpt = os.path.join(a.out, "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    if a.phase in ("all", "export"):
        export_scene(scene, a.views, a.wh)
    if a.phase in ("all", "ref"):
        run_reference(scene, ckpt, a.iters)
    if a.phase in ("all", "ours"):
        run_ours(scene, ckpt, a.iters)
    if a.phase in ("all", "report"):
        report(ckpt)


if __name__ == "__main__":
    main()
