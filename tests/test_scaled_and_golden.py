"""Scaled-config build + golden-value regression of the tiny model."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sunet_tf_tpu.config import scaled_config, tiny_config
from sunet_tf_tpu.models.sunet import SUNet, build_model, param_count


def test_scaled_config_builds_and_shapes():
    """EMB 180 / WIN 16 / 512^2 (BASELINE config #5): constructible with
    consistent head splits; a 128^2-built variant (same dims, windows
    auto-degraded per stage at build time) runs forward on CPU."""
    cfg = scaled_config()
    sw = cfg.swinunet
    assert sw.emb_dim == 180 and sw.win_size == 16 and sw.img_size == 512
    for i, h in enumerate(sw.head_num):
        assert (sw.emb_dim * 2**i) % h == 0
        assert (sw.emb_dim * 2**i) // h == 30
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32"))
    model = build_model(cfg, seed=0)
    assert param_count(model) > 300_000_000  # ~3.5x the default model
    assert model.flops() > 4 * 64e9  # >> default model's 64 GFLOP

    small = scaled_config(img_size=128)
    small = small.replace(tpu=small.tpu.__class__(compute_dtype="float32"))
    m2 = build_model(small, seed=0)
    gd, st = nnx.split(m2, nnx.Param)
    y = jax.jit(lambda s, x: nnx.merge(gd, s)(x))(
        st, jnp.ones((1, 128, 128, 3)) * 0.4)
    assert y.shape == (1, 128, 128, 1)
    assert np.isfinite(np.asarray(y)).all()


def test_golden_forward_regression(tiny_model):
    """Fixed-seed tiny model + deterministic input -> pinned output stats.
    Catches silent numeric drift in any layer (SURVEY §4 golden tests).
    If this fails after an intentional math change, re-pin the constants."""
    gd, st = nnx.split(tiny_model, nnx.Param)
    x = jnp.linspace(0.0, 1.0, 64 * 64 * 3, dtype=jnp.float32).reshape(1, 64, 64, 3)
    y = np.asarray(jax.jit(lambda s, x: nnx.merge(gd, s)(x))(st, x), np.float64)
    stats = np.array([y.mean(), y.std(), y[0, 0, 0, 0], y[0, 32, 32, 0]])
    golden = np.array([-0.005346603789, 0.049420084755,
                       -0.008345268667, -0.071302935481])
    np.testing.assert_allclose(stats, golden, rtol=2e-4, atol=2e-6)
