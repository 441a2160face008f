#!/usr/bin/env python3
"""Convert a reference ``model.th`` checkpoint into an ngf_tpu checkpoint.

Migration tool: a user coming from `fnzhan/Neural-Gauge-Fields` can load
their trained InfoInv/TriPlane checkpoints (`InfoInv/models/FieldBase.py:
94-116` save format: ``{'kwargs', 'state_dict'}`` + bit-packed alpha
volume) directly into this framework for rendering / fine-tuning:

    python tools/import_reference_ckpt.py ref_model.th out.npz [--infoinv]
    python main.py --config ... --render_only 1 --render_test 1 --ckpt out.npz

Weight-layout mapping (forward-parity-tested in
tests/test_reference_import_parity.py, both directions):
- planes / gauge grids: torch ``(1, C, H, W)`` -> channels-last ``(H, W, C)``
- ``nn.Linear``: ``weight (out, in)`` -> ``w (in, out)`` (transpose), bias as-is
- subsystem auto-detected: ``gauge_xy`` present -> TriPlane gauge preset
  (Linear(48->1) density head), else InfoInv preset (3-layer density MLP).
- ``--infoinv`` records the runtime PE-multiply flag (not stored in the
  reference checkpoint; it is a CLI flag there too, `InfoInv/opt.py:117`).
- alpha mask: ``np.unpackbits`` -> z-major boolean volume + its aabb (the
  reference's 3D grid_sample convention matches ours).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy(), np.float32)


def _linear(sd, key: str) -> dict:
    return {"w": _t2n(sd[f"{key}.weight"]).T, "b": _t2n(sd[f"{key}.bias"])}


def _mlp(sd, key: str, torch_positions=(0, 2, 4)) -> dict:
    return {
        "layers": [_linear(sd, f"{key}.mlp.{li}") for li in torch_positions]
    }


def convert(ckpt_path: str, out_path: str, infoinv: bool = False,
            step_ratio: float = 0.5) -> dict:
    import torch

    from ngf_tpu.fields import TriPlaneConfig
    from ngf_tpu.utils.checkpoint import save_checkpoint
    from ngf_tpu.utils.grid import grid_step_size

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"]
    kwargs = ckpt.get("kwargs", {})

    params: dict = {}
    for name in ("plane_xy", "plane_yz", "plane_xz",
                 "gauge_xy", "gauge_yz", "gauge_xz"):
        if name in sd:
            params[name] = np.ascontiguousarray(
                _t2n(sd[name])[0].transpose(1, 2, 0)
            )

    is_gauge = "gauge_xy" in params
    if is_gauge:
        params["density_decoder"] = _linear(sd, "density_decoder")
    else:
        params["density_decoder"] = {"mlp": _mlp(sd, "density_decoder")}
    params["rgb_decoder"] = {
        # reference basis Linear is bias-free (`networks.py:17`)
        "basis": {"w": _t2n(sd["rgb_decoder.basis.weight"]).T},
        "mlp": _mlp(sd, "rgb_decoder"),
    }

    plane_hw = params["plane_xy"].shape[:2]
    plane_dim = params["plane_xy"].shape[-1]
    if is_gauge:
        cfg = TriPlaneConfig.gauge_preset(gauge_start=0)
    else:
        cfg = TriPlaneConfig.infoinv_preset(infoinv=infoinv)
    cfg_dict = dict(
        cfg.__dict__,
        plane_res=int(max(plane_hw)),
        plane_dim=int(plane_dim),
    )
    if is_gauge:
        cfg_dict["gauge_res"] = int(params["gauge_xy"].shape[0])

    aabb = kwargs.get("aabb")
    aabb = (
        _t2n(aabb).reshape(2, 3).tolist()
        if aabb is not None else [[-1.5] * 3, [1.5] * 3]
    )
    grid_size = [int(v) for v in kwargs.get("gridSize", [256, 256, 256])]
    ratio = float(kwargs.get("step_ratio", step_ratio))
    step_size = grid_step_size(np.asarray(aabb, np.float32), grid_size, ratio)

    meta = {
        "subsystem": "triplane" if is_gauge else "infoinv",
        "model_cfg": cfg_dict,
        "aabb": aabb,
        "grid_size": grid_size,
        "step_size": float(step_size),
        "near_far": [float(v) for v in kwargs.get("near_far", (2.0, 6.0))],
        "iteration": 0,
        "imported_from": os.path.abspath(ckpt_path),
    }

    alpha_volume = alpha_aabb = None
    if "alphaMask.mask" in ckpt:
        shape = [int(v) for v in ckpt["alphaMask.shape"]]
        bits = np.unpackbits(np.asarray(ckpt["alphaMask.mask"]))
        alpha_volume = (
            bits[: int(np.prod(shape))].reshape(shape).astype(np.float32)
        )
        alpha_volume = np.squeeze(alpha_volume)  # (1,1,gz,gy,gx) -> 3D
        alpha_aabb = _t2n(ckpt["alphaMask.aabb"]).reshape(2, 3)

    save_checkpoint(out_path, params, meta=meta,
                    alpha_volume=alpha_volume, alpha_aabb=alpha_aabb)
    print(f"[import] {ckpt_path} -> {out_path}")
    print(f"[import] subsystem={meta['subsystem']} planes={plane_hw}+"
          f"{plane_dim}ch grid={grid_size} step={step_size:.5f} "
          f"alpha_mask={'yes' if alpha_volume is not None else 'no'}")
    return meta


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("ckpt", help="reference model.th path")
    p.add_argument("out", help="output .npz checkpoint path")
    p.add_argument("--infoinv", action="store_true",
                   help="the reference run used --infoinv (PE multiply)")
    p.add_argument("--step_ratio", type=float, default=0.5,
                   help="fallback when the checkpoint kwargs lack step_ratio")
    a = p.parse_args()
    meta = convert(a.ckpt, a.out, infoinv=a.infoinv, step_ratio=a.step_ratio)
    print(json.dumps({"subsystem": meta["subsystem"],
                      "grid_size": meta["grid_size"]}))


if __name__ == "__main__":
    main()
