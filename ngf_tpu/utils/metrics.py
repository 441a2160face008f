"""Evaluation metrics: PSNR, SSIM (mipnerf-style), LPIPS (gated), TV loss.

SSIM is the same separable-Gaussian formulation the reference ports from
mipnerf (`InfoInv/utils.py:109-155`), implemented with scipy.signal on host.
LPIPS requires the optional ``lpips`` torch package; when it is absent the
functions return NaN rather than failing the whole evaluation (the reference
hard-depends on it, `InfoInv/utils.py:85-97`).
"""

from __future__ import annotations

import numpy as np
import scipy.signal


def mse2psnr(mse: float) -> float:
    """PSNR from MSE (`InfoInv/utils.py:10`)."""
    return float(-10.0 * np.log(mse) / np.log(10.0))


def rgb_ssim(
    img0: np.ndarray,
    img1: np.ndarray,
    max_val: float,
    filter_size: int = 11,
    filter_sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
    return_map: bool = False,
):
    """mipnerf SSIM (`InfoInv/utils.py:109-155`)."""
    img0 = np.asarray(img0, dtype=np.float64)
    img1 = np.asarray(img1, dtype=np.float64)
    assert img0.ndim == 3 and img0.shape[-1] == 3 and img0.shape == img1.shape

    hw = filter_size // 2
    shift = (2 * hw - filter_size + 1) / 2
    f_i = ((np.arange(filter_size) - hw + shift) / filter_sigma) ** 2
    filt = np.exp(-0.5 * f_i)
    filt /= np.sum(filt)

    def convolve2d(z, f):
        return scipy.signal.convolve2d(z, f, mode="valid")

    def filt_fn(z):
        return np.stack(
            [
                convolve2d(convolve2d(z[..., i], filt[:, None]), filt[None, :])
                for i in range(z.shape[-1])
            ],
            -1,
        )

    mu0 = filt_fn(img0)
    mu1 = filt_fn(img1)
    mu00 = mu0 * mu0
    mu11 = mu1 * mu1
    mu01 = mu0 * mu1
    sigma00 = np.maximum(0.0, filt_fn(img0 ** 2) - mu00)
    sigma11 = np.maximum(0.0, filt_fn(img1 ** 2) - mu11)
    sigma01 = filt_fn(img0 * img1) - mu01
    sigma01 = np.sign(sigma01) * np.minimum(
        np.sqrt(sigma00 * sigma11), np.abs(sigma01)
    )
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    numer = (2 * mu01 + c1) * (2 * sigma01 + c2)
    denom = (mu00 + mu11 + c1) * (sigma00 + sigma11 + c2)
    ssim_map = numer / denom
    return ssim_map if return_map else float(np.mean(ssim_map))


def rgb_lpips(np_gt: np.ndarray, np_im: np.ndarray, net_name: str = "alex") -> float:
    """LPIPS distance (`InfoInv/utils.py:85-97`); full resolution chain and
    the offline weight-provisioning story live in ngf_tpu/utils/lpips.py."""
    from .lpips import rgb_lpips as _impl

    return _impl(np_gt, np_im, net_name)


def tv_loss_2d(x, weight: float = 1.0):
    """Total variation over a (H, W, C) plane (`InfoInv/utils.py:159-175`,
    adapted to channels-last; the reference's batch dim is 1)."""
    import jax.numpy as jnp

    h, w, _ = x.shape
    count_h = (h - 1) * w * x.shape[-1]
    count_w = h * (w - 1) * x.shape[-1]
    h_tv = jnp.sum((x[1:] - x[:-1]) ** 2)
    w_tv = jnp.sum((x[:, 1:] - x[:, :-1]) ** 2)
    return weight * 2.0 * (h_tv / count_h + w_tv / count_w)
