"""Image ops: pixel shuffle, bilinear resize, color, metrics, augmentation.

All on-device, jit-friendly, NHWC. Numerical contracts:

- ``pixel_shuffle`` matches torch.nn.PixelShuffle channel ordering
  (out[b, hr+i, wr+j, c] = in[b, h, w, c*r*r + i*r + j]) so that weights
  imported from reference checkpoints (dual up-sample branches, reference
  model/SUNet_detail.py:342-363) stay correct in NHWC.
- ``bilinear_resize`` matches torch ``align_corners=False`` (half-pixel
  centers), the mode used by the reference's nn.Upsample
  (model/SUNet_detail.py:351,362). jax.image.resize implements exactly this
  convention; verified against torch in tests.
- ``psnr`` matches reference utils/image_utils.py:6-10 (clamp to [0,1],
  20*log10(1/rmse)), ``ssim`` matches pytorch_msssim / MATLAB defaults
  (gaussian 11x11 sigma 1.5, K=(0.01, 0.03)), the eval math of
  reference evaluation.m:42-45.
- ``dihedral`` applies the 8-way flip/rot augmentation with the reference's
  op indexing (dataset_RGB.py:63-84; index 0 and 8 are identity because the
  reference draws randint(0, 8) inclusive over 9 values with cases 1..7).
- ``add_awgn`` synthesizes additive white Gaussian noise pairs on device
  (the reference prepared noisy pairs offline; BASELINE.json asks for
  on-device AWGN).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(B, H, W, C*r*r) -> (B, H*r, W*r, C) with torch channel ordering."""
    B, H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(B, H, W, C, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, i, W, j, C
    return x.reshape(B, H * r, W * r, C)


def bilinear_resize(x: jnp.ndarray, scale: int) -> jnp.ndarray:
    """NHWC bilinear upsample by integer factor, half-pixel convention."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H * scale, W * scale, C), method="bilinear")


# Rec.601 luma weights, as used by the reference target conversion
# (train.py:328-329) and cv2/PIL grayscale.
_LUMA = (0.2989, 0.5870, 0.1140)


def rgb_to_gray(x: jnp.ndarray) -> jnp.ndarray:
    """(..., H, W, 3) -> (..., H, W, 1) Rec.601 luma."""
    r, g, b = x[..., 0:1], x[..., 1:2], x[..., 2:3]
    return _LUMA[0] * r + _LUMA[1] * g + _LUMA[2] * b


def psnr(target: jnp.ndarray, pred: jnp.ndarray, data_range: float = 1.0) -> jnp.ndarray:
    """PSNR with both images clamped to [0, data_range] (reference math)."""
    t = jnp.clip(target, 0.0, data_range)
    p = jnp.clip(pred, 0.0, data_range)
    rmse = jnp.sqrt(jnp.mean((t - p) ** 2))
    return 20.0 * jnp.log10(data_range / jnp.maximum(rmse, 1e-12))


def psnr_per_sample(target: jnp.ndarray, pred: jnp.ndarray,
                    data_range: float = 1.0) -> jnp.ndarray:
    """(B,) PSNR per image — the reference's batch-1 eval protocol
    (utils/image_utils.py:6-10 applied per item, train.py:158)."""
    t = jnp.clip(target, 0.0, data_range).astype(jnp.float32)
    p = jnp.clip(pred, 0.0, data_range).astype(jnp.float32)
    ax = tuple(range(1, t.ndim))
    rmse = jnp.sqrt(jnp.mean((t - p) ** 2, axis=ax))
    return 20.0 * jnp.log10(data_range / jnp.maximum(rmse, 1e-12))


def _gaussian_kernel1d(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    half = (size - 1) / 2.0
    coords = jnp.arange(size, dtype=jnp.float32) - half
    g = jnp.exp(-(coords**2) / (2.0 * sigma**2))
    return g / g.sum()


def ssim(
    target: jnp.ndarray,
    pred: jnp.ndarray,
    data_range: float = 1.0,
    kernel_size: int = 11,
    sigma: float = 1.5,
    k1: float = 0.01,
    k2: float = 0.03,
) -> jnp.ndarray:
    """Mean SSIM over a batch of NHWC images (valid-window convolution).

    Matches the pytorch_msssim defaults used by the reference's torchSSIM
    (utils/image_utils.py:12-13) and MATLAB ssim (evaluation.m:63).
    """
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    x = target.astype(jnp.float32)
    y = pred.astype(jnp.float32)
    g = _gaussian_kernel1d(kernel_size, sigma)

    def blur(img):
        # separable depthwise gaussian, VALID padding (matches msssim/
        # MATLAB). precision HIGHEST: TPU's default conv precision
        # truncates fp32 operands to bf16 for the MXU, which would
        # silently degrade every reported SSIM (round-5 fp64 oracle
        # lesson); these 11-tap depthwise convs are metric code, not a
        # hot path.
        C = img.shape[-1]
        kh = jnp.tile(g.reshape(kernel_size, 1, 1, 1), (1, 1, 1, C))
        kw = jnp.tile(g.reshape(1, kernel_size, 1, 1), (1, 1, 1, C))
        img = jax.lax.conv_general_dilated(
            img, kh, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST)
        img = jax.lax.conv_general_dilated(
            img, kw, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=C,
            precision=jax.lax.Precision.HIGHEST)
        return img

    mu_x = blur(x)
    mu_y = blur(y)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_xx = blur(x * x) - mu_xx
    sigma_yy = blur(y * y) - mu_yy
    sigma_xy = blur(x * y) - mu_xy
    num = (2.0 * mu_xy + c1) * (2.0 * sigma_xy + c2)
    den = (mu_xx + mu_yy + c1) * (sigma_xx + sigma_yy + c2)
    return jnp.mean(num / den)


def ssim_per_sample(target: jnp.ndarray, pred: jnp.ndarray, **kw) -> jnp.ndarray:
    """(B,) mean SSIM per image (same math as :func:`ssim`, per-sample
    reduction — the reference's batch-1 eval protocol)."""
    return jax.vmap(lambda t, p: ssim(t[None], p[None], **kw))(target, pred)


def dihedral(img: jnp.ndarray, op: jnp.ndarray) -> jnp.ndarray:
    """Apply one of the 8-way dihedral ops to an HWC image, selected by op.

    op indexing mirrors reference dataset_RGB.py:63-84 (drawn from
    randint(0, 8), cases 1..7 transform, 0 and 8 are identity):
      0/8: identity  1: flip rows  2: flip cols  3: rot90  4: rot180
      5: rot270  6: rot90(flip rows)  7: rot90(flip cols)
    rot90 here matches torch.rot90(dims=(1,2)) on CHW, i.e. a rotation in
    the (H, W) plane.
    """

    def rot90(x):  # torch.rot90(x, 1, dims=(H, W)): (h, w) -> (w, H-1-h)
        return jnp.flip(jnp.swapaxes(x, 0, 1), axis=0)

    branches = [
        lambda x: x,
        lambda x: jnp.flip(x, axis=0),
        lambda x: jnp.flip(x, axis=1),
        rot90,
        lambda x: jnp.flip(x, axis=(0, 1)),
        lambda x: jnp.flip(jnp.swapaxes(x, 0, 1), axis=1),  # rot270
        lambda x: rot90(jnp.flip(x, axis=0)),
        lambda x: rot90(jnp.flip(x, axis=1)),
        lambda x: x,
    ]
    return jax.lax.switch(op, branches, img)


# Every dihedral-group element factors as (transpose?) then (flip H?) then
# (flip W?): rot90 = FH∘T, rot270 = FW∘T, rot90∘FH = FH∘FW∘T, rot90∘FW = T.
# Tables indexed by the reference op id (0..8, dataset_RGB.py:63-84).
_DH_TR = (0, 0, 0, 1, 0, 1, 1, 1, 0)
_DH_FH = (0, 1, 0, 1, 1, 0, 1, 0, 0)
_DH_FW = (0, 0, 1, 0, 1, 1, 1, 0, 0)


def dihedral_batch(imgs: jnp.ndarray, ops: jnp.ndarray) -> jnp.ndarray:
    """Batched :func:`dihedral` over a (B, H, W, C) batch (square images).

    Not a vmapped ``lax.switch`` — that lowers to ``select_n`` over all
    NINE materialized branches (9 full passes over the batch). The
    factored form is 3 transform+select passes, and flips/transposes are
    pure index remaps XLA fuses into the selects. Works on any dtype;
    the train path runs it on uint8 (4x less bandwidth than fp32).
    """
    def pick(table):
        return jnp.asarray(table, jnp.bool_)[ops][:, None, None, None]

    x = jnp.where(pick(_DH_TR), jnp.swapaxes(imgs, 1, 2), imgs)
    x = jnp.where(pick(_DH_FH), jnp.flip(x, axis=1), x)
    return jnp.where(pick(_DH_FW), jnp.flip(x, axis=2), x)


def add_awgn(key: jax.Array, clean: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Additive white Gaussian noise: clean in [0,1], sigma on the 0-255 scale."""
    noise = jax.random.normal(key, clean.shape, dtype=clean.dtype)
    return clean + (sigma / 255.0) * noise


def random_crop_pair(
    key: jax.Array, inp: jnp.ndarray, tar: jnp.ndarray, ps: int
) -> tuple:
    """Aligned random crop of an (H, W, C) pair to (ps, ps, C)."""
    H, W = inp.shape[0], inp.shape[1]
    kr, kc = jax.random.split(key)
    r = jax.random.randint(kr, (), 0, H - ps + 1)
    c = jax.random.randint(kc, (), 0, W - ps + 1)
    ci = jax.lax.dynamic_slice(inp, (r, c, 0), (ps, ps, inp.shape[2]))
    ct = jax.lax.dynamic_slice(tar, (r, c, 0), (ps, ps, tar.shape[2]))
    return ci, ct


def center_crop(img: jnp.ndarray, ps: int) -> jnp.ndarray:
    """Center crop an (H, W, C) image to (ps, ps, C) (reference val crop,
    dataset_RGB.py:120-122; torchvision center_crop rounding)."""
    H, W = img.shape[0], img.shape[1]
    top = int(round((H - ps) / 2.0))
    left = int(round((W - ps) / 2.0))
    return img[top : top + ps, left : left + ps, :]
