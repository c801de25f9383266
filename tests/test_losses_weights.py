"""Losses and boundary-ring weights vs reference semantics (numpy oracle)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sunet_tf_tpu.ops.morphology import boundary_ring_weights
from sunet_tf_tpu.train.losses import charbonnier_loss, mse_loss

RNG = np.random.default_rng(7)


def _np_dilate3x3(b):
    """8-connected binary dilation (oracle for skimage.binary_dilation with
    a 3x3 ones footprint)."""
    H, W = b.shape
    p = np.pad(b, 1)
    out = np.zeros_like(b)
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            out |= p[dy : dy + H, dx : dx + W]
    return out


def _reference_weights(target, k=2, stroke_w=3.0, ring_w=(3.0, 2.0, 1.0)):
    """Transcription of reference train.py:200-249 semantics in numpy."""
    B = target.shape[0]
    out = []
    for b in range(B):
        bin_img = (target[b, :, :, 0] > 0.5).astype(bool)
        prev = bin_img.copy()
        rings = []
        for _ in range(k):
            dil = _np_dilate3x3(prev)
            rings.append(dil & ~prev)
            prev = dil
        w = np.zeros(bin_img.shape, np.float32)
        w[bin_img] = stroke_w
        for i, ring in enumerate(rings):
            w[ring] = ring_w[i] if i < len(ring_w) else ring_w[-1]
        out.append(w[..., None])
    w = np.stack(out)
    if w.sum() == 0:
        w = np.ones_like(w)
    return w / max(w.mean(), 1e-8)


def test_boundary_weights_match_reference_oracle():
    target = (RNG.random((3, 24, 24, 1)) > 0.8).astype(np.float32)
    ours = np.asarray(boundary_ring_weights(jnp.asarray(target)))
    ref = _reference_weights(target)
    np.testing.assert_allclose(ours, ref, rtol=1e-6, atol=1e-6)


def test_boundary_weights_all_zero_target():
    target = np.zeros((2, 8, 8, 1), np.float32)
    ours = np.asarray(boundary_ring_weights(jnp.asarray(target)))
    np.testing.assert_allclose(ours, np.ones_like(target), atol=1e-6)


def test_boundary_weights_ring_values():
    target = np.zeros((1, 9, 9, 1), np.float32)
    target[0, 4, 4, 0] = 1.0
    w = np.asarray(
        boundary_ring_weights(jnp.asarray(target), normalize_to_mean_one=False)
    )[0, :, :, 0]
    assert w[4, 4] == 3.0  # stroke
    assert w[3, 3] == 3.0 and w[4, 3] == 3.0  # ring 1 weight 3.0
    assert w[2, 2] == 2.0 and w[4, 2] == 2.0  # ring 2 weight 2.0
    assert w[0, 0] == 0.0  # background


def test_charbonnier_unweighted():
    p = RNG.standard_normal((2, 8, 8, 1)).astype(np.float32)
    t = RNG.standard_normal((2, 8, 8, 1)).astype(np.float32)
    ours = float(charbonnier_loss(jnp.asarray(p), jnp.asarray(t)))
    ref = np.mean(np.sqrt((p - t) ** 2 + 1e-3**2))
    assert abs(ours - ref) < 1e-6


def test_charbonnier_weighted_normalization():
    p = RNG.standard_normal((2, 8, 8, 1)).astype(np.float32)
    t = RNG.standard_normal((2, 8, 8, 1)).astype(np.float32)
    w = RNG.random((2, 8, 8, 1)).astype(np.float32)
    ours = float(charbonnier_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    l = np.sqrt((p - t) ** 2 + 1e-6)
    ref = (l * w).sum() / max(w.sum(), 1e-8)
    assert abs(ours - ref) < 1e-5


def test_mse_weighted():
    p = RNG.standard_normal((4, 4, 4, 1)).astype(np.float32)
    t = RNG.standard_normal((4, 4, 4, 1)).astype(np.float32)
    w = RNG.random((4, 4, 4, 1)).astype(np.float32)
    ours = float(mse_loss(jnp.asarray(p), jnp.asarray(t), jnp.asarray(w)))
    ref = ((p - t) ** 2 * w).sum() / w.sum()
    assert abs(ours - ref) < 1e-5


def test_weights_against_skimage_if_available():
    skimage = pytest.importorskip("skimage.morphology")
    target = (RNG.random((1, 16, 16, 1)) > 0.7).astype(np.float32)
    prev = target[0, :, :, 0] > 0.5
    dil = skimage.binary_dilation(prev, footprint=np.ones((3, 3), bool))
    ours_dil = _np_dilate3x3(prev)
    np.testing.assert_array_equal(ours_dil, dil)
