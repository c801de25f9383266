"""Numerical parity of primitive ops vs torch/sklearn ground truth.

The reference is a torch codebase; dB-level parity hinges on a handful of
op conventions (SURVEY §7 "hard parts"). Each test pins one of them against
the actual torch op (torch-cpu is available in the image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sunet_tf_tpu.ops.image import (
    bilinear_resize,
    center_crop,
    pixel_shuffle,
    psnr,
    rgb_to_gray,
    ssim,
)

RNG = np.random.default_rng(0)


def test_pixel_shuffle_matches_torch():
    for r in (2, 4):
        x = RNG.standard_normal((2, 3, 5, 4 * r * r)).astype(np.float32)
        ours = np.asarray(pixel_shuffle(jnp.asarray(x), r))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        ref = torch.nn.functional.pixel_shuffle(xt, r).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=0, atol=0)


def test_bilinear_matches_torch_align_corners_false():
    for scale in (2, 4):
        x = RNG.standard_normal((2, 7, 5, 3)).astype(np.float32)
        ours = np.asarray(bilinear_resize(jnp.asarray(x), scale))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        ref = torch.nn.functional.interpolate(
            xt, scale_factor=scale, mode="bilinear", align_corners=False
        ).permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_gelu_matches_torch_exact():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    ours = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=False))
    ref = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_layernorm_eps_matches_torch():
    # torch LayerNorm default eps=1e-5; our blocks use epsilon=1e-5.
    from flax import nnx

    x = RNG.standard_normal((4, 16)).astype(np.float32)
    ln = nnx.LayerNorm(16, epsilon=1e-5, rngs=nnx.Rngs(0))
    ours = np.asarray(ln(jnp.asarray(x)))
    ref = torch.nn.functional.layer_norm(torch.from_numpy(x), (16,)).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_softmax_attention_core_matches_torch():
    """One W-MSA core (scale, bias, mask, softmax) vs a torch transcription
    of the same math with shared random weights."""
    Bn, N, h, d = 4, 16, 2, 8
    C = h * d
    q = RNG.standard_normal((Bn, h, N, d)).astype(np.float32)
    k = RNG.standard_normal((Bn, h, N, d)).astype(np.float32)
    v = RNG.standard_normal((Bn, h, N, d)).astype(np.float32)
    bias = RNG.standard_normal((h, N, N)).astype(np.float32)
    mask = np.where(RNG.random((2, N, N)) > 0.7, -100.0, 0.0).astype(np.float32)
    scale = 8.0

    # ours
    attn = jnp.einsum("bhnd,bhmd->bhnm", jnp.asarray(q) * scale, jnp.asarray(k))
    attn = attn + jnp.asarray(bias)[None]
    attn = attn.reshape(Bn // 2, 2, h, N, N) + jnp.asarray(mask)[None, :, None]
    attn = jax.nn.softmax(attn.reshape(Bn, h, N, N), axis=-1)
    ours = np.asarray(jnp.einsum("bhnm,bhmd->bhnd", attn, jnp.asarray(v)))

    # torch
    qt, kt, vt = map(torch.from_numpy, (q, k, v))
    a = (qt * scale) @ kt.transpose(-2, -1) + torch.from_numpy(bias).unsqueeze(0)
    a = a.view(Bn // 2, 2, h, N, N) + torch.from_numpy(mask).unsqueeze(1).unsqueeze(0)
    a = torch.softmax(a.view(Bn, h, N, N), dim=-1)
    ref = (a @ vt).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_rgb_to_gray_matches_reference_coeffs():
    x = RNG.random((2, 4, 4, 3)).astype(np.float32)
    ours = np.asarray(rgb_to_gray(jnp.asarray(x)))
    ref = 0.2989 * x[..., :1] + 0.5870 * x[..., 1:2] + 0.1140 * x[..., 2:3]
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_psnr_matches_reference_torch_math():
    tar = RNG.random((1, 16, 16, 3)).astype(np.float32)
    prd = np.clip(tar + 0.05 * RNG.standard_normal(tar.shape).astype(np.float32), -1, 2)
    ours = float(psnr(jnp.asarray(tar), jnp.asarray(prd)))
    t, p = torch.from_numpy(tar), torch.from_numpy(prd)
    imdff = torch.clamp(p, 0, 1) - torch.clamp(t, 0, 1)
    rmse = (imdff**2).mean().sqrt()
    ref = float(20 * torch.log10(1 / rmse))
    assert abs(ours - ref) < 1e-3


def test_ssim_sane_bounds():
    x = RNG.random((1, 32, 32, 3)).astype(np.float32)
    assert float(ssim(jnp.asarray(x), jnp.asarray(x))) > 0.9999
    y = np.clip(x + 0.1 * RNG.standard_normal(x.shape).astype(np.float32), 0, 1)
    s = float(ssim(jnp.asarray(x), jnp.asarray(y)))
    assert 0.2 < s < 0.99


def test_center_crop_matches_torchvision_rule():
    # torchvision F.center_crop: top = round((H - ps) / 2)
    x = RNG.random((11, 13, 3)).astype(np.float32)
    ours = np.asarray(center_crop(jnp.asarray(x), 8))
    top = int(round((11 - 8) / 2.0))
    left = int(round((13 - 8) / 2.0))
    np.testing.assert_array_equal(ours, x[top : top + 8, left : left + 8, :])


def test_dihedral_matches_torch_ops():
    from sunet_tf_tpu.ops.image import dihedral

    x = RNG.random((6, 6, 3)).astype(np.float32)
    xt = torch.from_numpy(x).permute(2, 0, 1)  # CHW like the reference

    def chw(t):
        return t.permute(1, 2, 0).numpy()

    expected = {
        0: chw(xt),
        1: chw(xt.flip(1)),
        2: chw(xt.flip(2)),
        3: chw(torch.rot90(xt, dims=(1, 2))),
        4: chw(torch.rot90(xt, dims=(1, 2), k=2)),
        5: chw(torch.rot90(xt, dims=(1, 2), k=3)),
        6: chw(torch.rot90(xt.flip(1), dims=(1, 2))),
        7: chw(torch.rot90(xt.flip(2), dims=(1, 2))),
        8: chw(xt),
    }
    for op, ref in expected.items():
        ours = np.asarray(dihedral(jnp.asarray(x), jnp.asarray(op)))
        np.testing.assert_array_equal(ours, ref, err_msg=f"op={op}")
