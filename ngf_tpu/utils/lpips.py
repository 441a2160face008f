"""LPIPS v0.1 (alex / vgg) with explicit, offline weight provisioning.

The reference evaluates LPIPS-alex and LPIPS-vgg into ``mean.txt``
(`InfoInv/utils.py:85-97`, `InfoInv/main.py:113-116`) via the ``lpips`` pip
package, which downloads pretrained backbones at first use. This
environment has no package and no network egress, and no pretrained
weights exist anywhere on disk (searched: torchvision/timm/HF caches) — so
the metric cannot be *computed* here, but everything around it can be real:

- the full LPIPS v0.1 forward (input scaling constants, backbone feature
  taps, per-channel unit-normalization, squared diff, calibrated 1x1
  linear heads, spatial average, layer sum) is implemented below on torch
  CPU, loading weights from a plain ``.npz``;
- ``tools/export_lpips_weights.py`` converts the pip package's checkpoint
  into that ``.npz`` on any machine that has it; drop the file into
  ``~/.cache/ngf_tpu/lpips_{alex,vgg}.npz`` (or point
  ``NGF_LPIPS_WEIGHTS_DIR`` at it) and the metric turns on;
- without weights, callers get NaN plus a one-time explicit
  ``lpips_unavailable`` warning, and evaluation writes a marker file next
  to ``mean.txt`` instead of silently recording NaN.

Architecture facts used here are public (LPIPS paper/repo, v0.1):
scaling shift (-.030, -.088, -.188) / scale (.458, .448, .450); alex taps
after each of the 5 ReLUs; vgg16 taps at relu1_2/2_2/3_3/4_3/5_3.
"""

from __future__ import annotations

import os
import warnings

import numpy as np

_SHIFT = np.array([-0.030, -0.088, -0.188], dtype=np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], dtype=np.float32)

# (out_ch, in_ch, kernel, stride, pad, maxpool_before) per conv; tap after
# every ReLU marked tap=True.
_ALEX = [
    (64, 3, 11, 4, 2, False),
    (192, 64, 5, 1, 2, True),
    (384, 192, 3, 1, 1, True),
    (256, 384, 3, 1, 1, False),
    (256, 256, 3, 1, 1, False),
]
_ALEX_TAPS = [0, 1, 2, 3, 4]

# vgg16 conv stack: (out_ch, pool_before); all 3x3 s1 p1. Taps at indices
# of relu1_2, relu2_2, relu3_3, relu4_3, relu5_3.
_VGG = [
    (64, False), (64, False),
    (128, True), (128, False),
    (256, True), (256, False), (256, False),
    (512, True), (512, False), (512, False),
    (512, True), (512, False), (512, False),
]
_VGG_TAPS = [1, 3, 6, 9, 12]


def weights_path(net: str) -> str:
    base = os.environ.get(
        "NGF_LPIPS_WEIGHTS_DIR", os.path.expanduser("~/.cache/ngf_tpu")
    )
    return os.path.join(base, f"lpips_{net}.npz")


_warned = set()
_models: dict[str, object] = {}


def _build(net: str):
    """Build the torch-CPU LPIPS forward from the npz, or None."""
    path = weights_path(net)
    if not os.path.isfile(path):
        return None
    import torch
    import torch.nn.functional as F

    data = dict(np.load(path))
    convs = []
    i = 0
    while f"conv{i}_w" in data:
        convs.append(
            (
                torch.from_numpy(data[f"conv{i}_w"]).float(),
                torch.from_numpy(data[f"conv{i}_b"]).float(),
            )
        )
        i += 1
    lins = []
    i = 0
    while f"lin{i}_w" in data:
        lins.append(torch.from_numpy(data[f"lin{i}_w"]).float())
        i += 1
    if net == "alex":
        arch, taps = _ALEX, _ALEX_TAPS
    else:
        arch = [(c, 3, 3, 1, 1, p) for (c, p) in _VGG]
        taps = _VGG_TAPS
    assert len(convs) == len(arch), (len(convs), len(arch))
    assert len(lins) == len(taps)
    shift = torch.from_numpy(_SHIFT).view(1, 3, 1, 1)
    scale = torch.from_numpy(_SCALE).view(1, 3, 1, 1)

    def forward(a: np.ndarray, b: np.ndarray) -> float:
        """a, b: (H, W, 3) float images in [0, 1]."""
        with torch.no_grad():
            xs = []
            for img in (a, b):
                t = torch.from_numpy(np.ascontiguousarray(img)).float()
                t = t.permute(2, 0, 1)[None] * 2.0 - 1.0  # [-1, 1]
                xs.append((t - shift) / scale)
            total = 0.0
            ti = 0
            feats = xs
            for li, spec in enumerate(arch):
                _, _, _, stride, pad, pool = spec
                w, bias = convs[li]
                new = []
                for t in feats:
                    if pool:
                        t = F.max_pool2d(t, 2 if net == "vgg" else 3,
                                         2 if net == "vgg" else 2)
                    t = F.relu(F.conv2d(t, w, bias, stride=stride, padding=pad))
                    new.append(t)
                feats = new
                if ti < len(taps) and taps[ti] == li:
                    fa, fb = feats
                    na = fa / (fa.square().sum(1, keepdim=True).sqrt() + 1e-10)
                    nb = fb / (fb.square().sum(1, keepdim=True).sqrt() + 1e-10)
                    d = (na - nb).square()
                    lin = lins[ti]  # (1, C, 1, 1)
                    total = total + F.conv2d(d, lin).mean(dim=(2, 3)).item()
                    ti += 1
            return float(total)

    return forward


def lpips_available(net: str = "alex") -> bool:
    try:
        import lpips  # noqa: F401

        return True
    except ImportError:
        pass
    return os.path.isfile(weights_path(net))


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex") -> float:
    """LPIPS distance (reference: `InfoInv/utils.py:85-97`).

    Resolution order: pip ``lpips`` package -> exported-weights npz ->
    NaN with a one-time ``lpips_unavailable`` warning.
    """
    try:
        import torch
        import lpips  # type: ignore

        key = f"pip_{net_name}"
        if key not in _models:
            _models[key] = lpips.LPIPS(net=net_name, version="0.1").eval()
        model = _models[key]
        gt = torch.from_numpy(np.ascontiguousarray(np_gt)).permute(2, 0, 1).float()
        im = torch.from_numpy(np.ascontiguousarray(np_im)).permute(2, 0, 1).float()
        with torch.no_grad():
            return float(model(gt, im, normalize=True).item())
    except ImportError:
        pass

    key = f"npz_{net_name}"
    if key not in _models:
        _models[key] = _build(net_name)
    fwd = _models[key]
    if fwd is not None:
        return fwd(np_gt, np_im)

    if net_name not in _warned:
        _warned.add(net_name)
        warnings.warn(
            f"lpips_unavailable: no pip 'lpips' package and no weights at "
            f"{weights_path(net_name)} (zero-egress environment; see "
            "tools/export_lpips_weights.py). Recording NaN.",
            stacklevel=2,
        )
    return float("nan")
