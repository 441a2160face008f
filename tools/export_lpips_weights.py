#!/usr/bin/env python3
"""Export LPIPS v0.1 weights to the plain .npz consumed by
ngf_tpu.utils.lpips (run this on any machine that has the pip ``lpips``
package + torchvision; this repo's environment has neither and no egress).

    python tools/export_lpips_weights.py --net alex --out ~/.cache/ngf_tpu/

Writes lpips_<net>.npz with conv{i}_w/conv{i}_b (backbone convs, in
forward order) and lin{i}_w (the calibrated 1x1 heads, one per tap layer).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--net", choices=["alex", "vgg"], default="alex")
    p.add_argument("--out", default=os.path.expanduser("~/.cache/ngf_tpu"))
    args = p.parse_args()

    import lpips  # type: ignore
    import torch

    model = lpips.LPIPS(net=args.net, version="0.1").eval()
    data: dict[str, np.ndarray] = {}
    convs = [m for m in model.net.modules() if isinstance(m, torch.nn.Conv2d)]
    for i, conv in enumerate(convs):
        data[f"conv{i}_w"] = conv.weight.detach().numpy()
        data[f"conv{i}_b"] = conv.bias.detach().numpy()
    for i, lin in enumerate(model.lins):
        data[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()

    os.makedirs(args.out, exist_ok=True)
    out = os.path.join(args.out, f"lpips_{args.net}.npz")
    np.savez(out, **data)
    print(f"wrote {out}: {sorted(data)}")


if __name__ == "__main__":
    main()
