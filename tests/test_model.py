"""Model assembly: parameter parity, shapes, determinism, remat, dtypes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import nnx

from sunet_tf_tpu.config import Config, SwinUNetConfig, tiny_config
from sunet_tf_tpu.models.sunet import SUNet, build_model, param_count


def test_default_config_param_parity():
    """The default config must reproduce the reference's exact parameter
    count: 99,681,993 (measured by instantiating the reference
    model/SUNet_detail.py SUNet with training.yaml hyperparameters;
    SURVEY §6 quoted 99,681,989 which is off by the 4 decoder PReLUs)."""
    cfg = Config()
    model = build_model(cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32")))
    assert param_count(model) == 99_681_993


def test_tiny_forward_shapes(tiny_model):
    gd, st = nnx.split(tiny_model, nnx.Param)

    @jax.jit
    def fwd(st, x):
        return nnx.merge(gd, st)(x)

    x = jnp.linspace(0, 1, 2 * 64 * 64 * 3).reshape(2, 64, 64, 3)
    y = fwd(st, x)
    assert y.shape == (2, 64, 64, 1)
    assert y.dtype == jnp.float32
    assert np.isfinite(np.asarray(y)).all()


def test_grayscale_repeat(tiny_model):
    """1-channel input is repeated to 3 (reference model/SUNet.py:27-28)."""
    gd, st = nnx.split(tiny_model, nnx.Param)

    @jax.jit
    def fwd(st, x):
        return nnx.merge(gd, st)(x)

    g = jnp.full((1, 64, 64, 1), 0.25)
    rgb = jnp.repeat(g, 3, axis=-1)
    np.testing.assert_allclose(np.asarray(fwd(st, g)), np.asarray(fwd(st, rgb)),
                               rtol=0, atol=0)


def test_eval_deterministic_train_stochastic(tiny_model):
    gd, st = nnx.split(tiny_model, nnx.Param)

    @jax.jit
    def fwd(st, x):
        return nnx.merge(gd, st)(x)

    @jax.jit
    def fwd_train(st, x, key):
        return nnx.merge(gd, st)(x, key=key)

    x = jnp.ones((2, 64, 64, 3)) * 0.5
    y1, y2 = fwd(st, x), fwd(st, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
    # drop_path 0.1 > 0: different keys give different outputs
    t1 = fwd_train(st, x, jax.random.key(1))
    t2 = fwd_train(st, x, jax.random.key(2))
    assert not np.allclose(np.asarray(t1), np.asarray(t2))


def test_arbitrary_resolution(tiny_model):
    """Masks/windows derive from call-time shapes: other resolutions work
    as long as every stage's resolution divides its effective window
    (here: patch 4, 3 halvings, deepest window 2 -> multiples of 64)."""
    gd, st = nnx.split(tiny_model, nnx.Param)

    @jax.jit
    def fwd(st, x):
        return nnx.merge(gd, st)(x)

    y = fwd(st, jnp.ones((1, 128, 192, 3)) * 0.3)
    assert y.shape == (1, 128, 192, 1)


def test_out_chans_configurable():
    cfg = tiny_config()
    cfg = cfg.replace(
        swinunet=cfg.swinunet.__class__(
            **{**cfg.swinunet.__dict__, "out_chans": 3}),
        tpu=cfg.tpu.__class__(compute_dtype="float32"))
    model = build_model(cfg)
    gd, st = nnx.split(model, nnx.Param)
    y = jax.jit(lambda st, x: nnx.merge(gd, st)(x))(st, jnp.ones((1, 64, 64, 3)))
    assert y.shape == (1, 64, 64, 3)


def test_remat_matches_no_remat():
    """use_checkpoint changes memory, not math (fixes reference bug #1)."""
    cfg = tiny_config()
    base = cfg.swinunet.__dict__
    m1 = SUNet(SwinUNetConfig(**{**base, "use_checkpoint": False, "drop_path_rate": 0.0}),
               dtype=None, rngs=nnx.Rngs(7))
    m2 = SUNet(SwinUNetConfig(**{**base, "use_checkpoint": True, "drop_path_rate": 0.0}),
               dtype=None, rngs=nnx.Rngs(7))
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    gd1, st1 = nnx.split(m1, nnx.Param)
    gd2, st2 = nnx.split(m2, nnx.Param)
    y1 = jax.jit(lambda s, x: nnx.merge(gd1, s)(x))(st1, x)
    y2 = jax.jit(lambda s, x: nnx.merge(gd2, s)(x))(st2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)

    # and gradients flow through the remat path
    def loss(s, x):
        return jnp.mean(nnx.merge(gd2, s)(x) ** 2)

    g = jax.jit(jax.grad(loss))(st2, x)
    leaves = jax.tree.leaves(g)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_bf16_close_to_fp32(tiny_cfg):
    m32 = build_model(tiny_cfg, seed=3)
    mbf = build_model(tiny_cfg.replace(tpu=tiny_cfg.tpu.__class__(
        compute_dtype="bfloat16")), seed=3)
    x = jnp.linspace(0, 1, 64 * 64 * 3).reshape(1, 64, 64, 3)
    gd1, st1 = nnx.split(m32, nnx.Param)
    gd2, st2 = nnx.split(mbf, nnx.Param)
    y32 = jax.jit(lambda s, x: nnx.merge(gd1, s)(x))(st1, x)
    ybf = jax.jit(lambda s, x: nnx.merge(gd2, s)(x))(st2, x)
    assert ybf.dtype == jnp.float32  # logits always fp32
    err = float(jnp.max(jnp.abs(y32 - ybf)))
    scale = float(jnp.max(jnp.abs(y32))) + 1e-6
    assert err / scale < 0.1, f"bf16 deviates too much: {err} vs {scale}"


def test_flops_positive(tiny_model):
    f = tiny_model.flops()
    assert f > 0
    # flops scale ~linearly in area
    f2 = tiny_model.flops((128, 128))
    assert 3.0 < f2 / f < 5.0
