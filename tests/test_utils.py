"""Utils: color converts vs colorsys, blur vs torch, mixup, freeze, dirs."""

import colorsys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunet_tf_tpu.utils.augment import MixUp, gaussian_blur
from sunet_tf_tpu.utils.color import hsl2rgb, hsv2rgb, rgb2hsl, rgb2hsv
from sunet_tf_tpu.utils.dirs import get_last_path
from sunet_tf_tpu.utils.freeze import freeze_mask, partition_trainable

RNG = np.random.default_rng(5)


def test_rgb_hsv_roundtrip_and_colorsys():
    rgb = RNG.random((32, 3)).astype(np.float32)
    hsv = np.asarray(rgb2hsv(jnp.asarray(rgb)))
    for i in range(8):
        h, s, v = colorsys.rgb_to_hsv(*rgb[i])
        np.testing.assert_allclose(hsv[i], [h, s, v], atol=1e-5)
    back = np.asarray(hsv2rgb(jnp.asarray(hsv)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_rgb_hsl_roundtrip_and_colorsys():
    rgb = RNG.random((32, 3)).astype(np.float32)
    hsl = np.asarray(rgb2hsl(jnp.asarray(rgb)))
    for i in range(8):
        h, l, s = colorsys.rgb_to_hls(*rgb[i])
        np.testing.assert_allclose(hsl[i], [h, s, l], atol=1e-5)
    back = np.asarray(hsl2rgb(jnp.asarray(hsl)))
    np.testing.assert_allclose(back, rgb, atol=1e-5)


def test_gaussian_blur_matches_torch_conv():
    torch = pytest.importorskip("torch")
    from sunet_tf_tpu.utils.augment import gaussian_blur_kernel

    x = RNG.random((1, 12, 12, 2)).astype(np.float32)
    ours = np.asarray(gaussian_blur(jnp.asarray(x), 5, 2.0))
    k = torch.from_numpy(gaussian_blur_kernel(5, 2.0))
    w = k.expand(2, 1, 5, 5).clone()
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = torch.nn.functional.conv2d(xt, w, padding=2, groups=2)
    np.testing.assert_allclose(ours, ref.permute(0, 2, 3, 1).numpy(),
                               rtol=1e-5, atol=1e-6)


def test_mixup_convexity():
    t = jnp.ones((4, 8, 8, 3)) * jnp.arange(4).reshape(4, 1, 1, 1) / 3.0
    i = 1.0 - t
    mt, mi = MixUp()(jax.random.key(0), t, i)
    assert mt.shape == t.shape
    # mixed values stay within the convex hull
    assert float(mt.min()) >= float(t.min()) - 1e-6
    assert float(mt.max()) <= float(t.max()) + 1e-6
    # target and input mixed with the same lambda: sum is preserved
    np.testing.assert_allclose(np.asarray(mt + mi), np.ones_like(mt), atol=1e-6)


def test_freeze_zeroes_updates():
    import optax

    params = {"a": jnp.ones(3), "b": jnp.ones(3)}
    mask = freeze_mask(params, lambda path: "a" in str(path[0]))
    tx = partition_trainable(optax.sgd(1.0), mask)
    state = tx.init(params)
    grads = {"a": jnp.ones(3), "b": jnp.ones(3)}
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["a"]).sum()) > 0
    assert float(jnp.abs(updates["b"]).sum()) == 0


def test_get_last_path_natural_order(tmp_path):
    for n in (1, 2, 10):
        (tmp_path / f"model_epoch_{n}_latest.pth").write_text("x")
    assert get_last_path(str(tmp_path), "_latest.pth").endswith("_10_latest.pth")
    with pytest.raises(FileNotFoundError):
        get_last_path(str(tmp_path), "_nope.pth")
