"""Independent float64 SSIM oracle (scipy compute path).

Implements the skimage.metrics.structural_similarity protocol with
``gaussian_weights=True, sigma=1.5, use_sample_covariance=False,
data_range=1`` (skimage itself is not installed in this image, but the
protocol is fully specified): scipy's C gaussian filter in float64,
per-channel SSIM maps cropped to windows that never touch the border
(== valid convolution), channel-averaged. This is a deliberately
*different* compute path from ``sunet_tf_tpu.ops.image.ssim`` (separable
depthwise XLA convs in fp32) so that a k1/k2, kernel-normalization or
padding deviation there cannot cancel out — the eval protocol the
reference reports is half SSIM (reference evaluation.m:61-64,
utils/image_utils.py:12-13).
"""

from __future__ import annotations

import numpy as np
from scipy.ndimage import gaussian_filter


def ssim_oracle_single(target: np.ndarray, pred: np.ndarray,
                       data_range: float = 1.0, sigma: float = 1.5,
                       truncate: float = 3.5, k1: float = 0.01,
                       k2: float = 0.03) -> float:
    """Mean SSIM of one (H, W, C) image pair, float64.

    truncate=3.5, sigma=1.5 -> radius int(3.5*1.5+0.5)=5, i.e. the
    classic 11x11 window (skimage's win_size rule).
    """
    x = np.asarray(target, np.float64)
    y = np.asarray(pred, np.float64)
    if x.ndim == 2:
        x, y = x[..., None], y[..., None]
    pad = int(truncate * sigma + 0.5)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    def filt(a):
        return gaussian_filter(a, sigma, truncate=truncate, mode="reflect")

    vals = []
    for c in range(x.shape[-1]):
        xc, yc = x[..., c], y[..., c]
        ux, uy = filt(xc), filt(yc)
        vx = filt(xc * xc) - ux * ux
        vy = filt(yc * yc) - uy * uy
        vxy = filt(xc * yc) - ux * uy
        s = (((2.0 * ux * uy + c1) * (2.0 * vxy + c2))
             / ((ux * ux + uy * uy + c1) * (vx + vy + c2)))
        # windows touching the border see reflect-padding; crop them so
        # every remaining value equals the valid-convolution result
        vals.append(float(s[pad:-pad, pad:-pad].mean()))
    return float(np.mean(vals))


def ssim_oracle(targets: np.ndarray, preds: np.ndarray,
                data_range: float = 1.0, **kw) -> np.ndarray:
    """(B,) per-image oracle SSIM over (B, H, W, C) batches."""
    return np.asarray([ssim_oracle_single(t, p, data_range, **kw)
                       for t, p in zip(targets, preds)])
