"""MixUp augmentation and Gaussian blur (reference utils parity).

- MixUp: Beta(0.6, 0.6) pairwise image mixup on device (reference
  utils/dataset_utils.py, unused by the reference loop but exported).
- gaussian_blur: fixed-weight depthwise Gaussian, the working version of
  the reference's broken get_gaussian_kernel (utils/GaussianBlur.py:34
  raised NameError if ever called — reference defect #4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class MixUp:
    """lam ~ Beta(0.6, 0.6); mixes each sample with a flipped-batch partner
    (matches reference MixUp_AUG semantics)."""

    def __init__(self, alpha: float = 0.6):
        self.alpha = alpha

    def __call__(self, key: jax.Array, target: jnp.ndarray, inp: jnp.ndarray):
        B = target.shape[0]
        lam = jax.random.beta(key, self.alpha, self.alpha, (B, 1, 1, 1))
        t2 = jnp.flip(target, axis=0)
        i2 = jnp.flip(inp, axis=0)
        return lam * target + (1 - lam) * t2, lam * inp + (1 - lam) * i2


def gaussian_blur_kernel(kernel_size: int = 5, sigma: float = 2.0) -> np.ndarray:
    """(k, k) normalized 2D Gaussian (reference GaussianBlur.py math)."""
    ax = np.arange(kernel_size, dtype=np.float64)
    xx, yy = np.meshgrid(ax, ax, indexing="ij")
    mean = (kernel_size - 1) / 2.0
    var = float(sigma) ** 2
    k = (1.0 / (2.0 * np.pi * var)) * np.exp(
        -((xx - mean) ** 2 + (yy - mean) ** 2) / (2.0 * var))
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(x: jnp.ndarray, kernel_size: int = 5, sigma: float = 2.0) -> jnp.ndarray:
    """Depthwise Gaussian blur of an NHWC tensor, SAME padding."""
    C = x.shape[-1]
    k = jnp.asarray(gaussian_blur_kernel(kernel_size, sigma))
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C)
