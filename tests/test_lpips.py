"""Numerical validation of the LPIPS v0.1 port (`ngf_tpu/utils/lpips.py`).

No pretrained weights exist in this environment (zero egress), so the port
is validated with RANDOM synthetic weights loaded into both sides: the
repo's npz-driven forward, and an independent torch oracle written directly
from the published LPIPS v0.1 formulation (scaling layer -> backbone conv
taps -> per-channel unit-normalize -> squared diff -> 1x1 linear head ->
spatial average -> layer sum), the computation the reference invokes through
the pip package (`InfoInv/utils.py:85-97`).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand_alex_weights(rng):
    """Synthetic weights for the torchvision-alexnet feature stack LPIPS
    wraps: 5 convs (11s4p2, 5s1p2 after 3x3s2 maxpool, 3s1p1 after maxpool,
    3s1p1, 3s1p1) + one 1x1 head per tap."""
    specs = [(64, 3, 11), (192, 64, 5), (384, 192, 3), (256, 384, 3), (256, 256, 3)]
    data = {}
    for i, (co, ci, k) in enumerate(specs):
        data[f"conv{i}_w"] = rng.normal(0, 0.05, (co, ci, k, k)).astype(np.float32)
        data[f"conv{i}_b"] = rng.normal(0, 0.05, (co,)).astype(np.float32)
    for i, c in enumerate([64, 192, 384, 256, 256]):
        data[f"lin{i}_w"] = np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32)
    return data


def _rand_vgg_weights(rng):
    """vgg16 feature stack: 13 3x3s1p1 convs, 2x2s2 maxpools before convs
    2, 4, 7, 10; taps at relu1_2/2_2/3_3/4_3/5_3."""
    chans = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    data = {}
    ci = 3
    for i, co in enumerate(chans):
        data[f"conv{i}_w"] = rng.normal(0, 0.05, (co, ci, 3, 3)).astype(np.float32)
        data[f"conv{i}_b"] = rng.normal(0, 0.05, (co,)).astype(np.float32)
        ci = co
    for i, c in enumerate([64, 128, 256, 512, 512]):
        data[f"lin{i}_w"] = np.abs(rng.normal(0, 0.1, (1, c, 1, 1))).astype(np.float32)
    return data


def _oracle(net, data, img_a, img_b):
    """LPIPS v0.1 as published: independent of the repo implementation."""
    shift = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
    scale = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)

    def scaled(img):
        t = torch.from_numpy(img).permute(2, 0, 1)[None].float() * 2.0 - 1.0
        return (t - shift) / scale

    def backbone_taps(x):
        taps = []
        if net == "alex":
            # torchvision alexnet.features with LPIPS slice points
            plan = [(0, 4, 2, None), (1, 1, 2, (3, 2)), (2, 1, 1, (3, 2)),
                    (3, 1, 1, None), (4, 1, 1, None)]
            tap_after = {0, 1, 2, 3, 4}
        else:
            plan = []
            pools = {2, 4, 7, 10}
            for i in range(13):
                plan.append((i, 1, 1, (2, 2) if i in pools else None))
            tap_after = {1, 3, 6, 9, 12}
        for i, stride, pad, pool in plan:
            if pool is not None:
                x = F.max_pool2d(x, pool[0], pool[1])
            w = torch.from_numpy(data[f"conv{i}_w"])
            b = torch.from_numpy(data[f"conv{i}_b"])
            x = F.relu(F.conv2d(x, w, b, stride=stride, padding=pad))
            if i in tap_after:
                taps.append(x)
        return taps

    fa = backbone_taps(scaled(img_a))
    fb = backbone_taps(scaled(img_b))
    val = 0.0
    for k, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / (xa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = xb / (xb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        diff = (na - nb).pow(2)
        lin = torch.from_numpy(data[f"lin{k}_w"])
        val += F.conv2d(diff, lin).mean(dim=(2, 3)).item()
    return val


@pytest.mark.parametrize("net", ["alex", "vgg"])
def test_lpips_port_matches_oracle(net, tmp_path, monkeypatch):
    from ngf_tpu.utils import lpips as L

    rng = np.random.default_rng(0 if net == "alex" else 1)
    data = _rand_alex_weights(rng) if net == "alex" else _rand_vgg_weights(rng)
    np.savez(tmp_path / f"lpips_{net}.npz", **data)
    monkeypatch.setenv("NGF_LPIPS_WEIGHTS_DIR", str(tmp_path))
    L._models.clear()

    img_a = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    img_b = np.clip(img_a + rng.normal(0, 0.1, img_a.shape), 0, 1).astype(np.float32)

    got = L.rgb_lpips(img_a, img_b, net_name=net)
    want = _oracle(net, data, img_a, img_b)
    assert np.isfinite(got)
    assert got > 0  # different images -> positive distance
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)

    # identical images -> (near-)zero distance
    same = L.rgb_lpips(img_a, img_a.copy(), net_name=net)
    assert abs(same) < 1e-6
    L._models.clear()


def test_lpips_unavailable_is_nan(tmp_path, monkeypatch):
    from ngf_tpu.utils import lpips as L

    monkeypatch.setenv("NGF_LPIPS_WEIGHTS_DIR", str(tmp_path / "empty"))
    L._models.clear()
    L._warned.clear()
    with pytest.warns(UserWarning, match="lpips_unavailable"):
        out = L.rgb_lpips(
            np.zeros((8, 8, 3), np.float32), np.zeros((8, 8, 3), np.float32)
        )
    assert np.isnan(out)
    L._models.clear()
