"""Gradient parity: Pallas fwd+bwd attention sublayer vs the XLA path.

The custom-VJP backward kernel recomputes the forward in VMEM and
accumulates weight grads across the grid; its gradients must match XLA
autodiff of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sunet_tf_tpu.models.layers import SwinBlock


def _grads(backend, shift):
    blk = SwinBlock(16, (16, 16), 2, window_size=4, shift_size=shift,
                    qk_scale=8.0, drop_path_rate=0.0, backend=backend,
                    rngs=nnx.Rngs(4))
    gd, params = nnx.split(blk, nnx.Param)
    x = jax.random.normal(jax.random.key(9), (2, 16, 16, 16), jnp.float32)
    tgt = jax.random.normal(jax.random.key(10), (2, 16, 16, 16), jnp.float32)

    def loss(p, x):
        # key given -> training path (pallas backend takes the custom-VJP
        # branch because drop rates are 0 -> _can_fuse)
        y = nnx.merge(gd, p)(x, key=jax.random.key(0))
        return jnp.mean((y - tgt) ** 2)

    g_params, g_x = jax.jit(jax.grad(loss, argnums=(0, 1)))(params, x)
    return g_params, g_x


def test_grad_parity_unshifted():
    (gp1, gx1) = _grads("xla", 0)
    (gp2, gx2) = _grads("pallas", 0)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_grad_parity_shifted():
    (gp1, gx1) = _grads("xla", 2)
    (gp2, gx2) = _grads("pallas", 2)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_training_step_with_pallas_backend():
    """A full optimizer step through the custom-VJP path runs and moves
    the loss (tiny model, CPU interpret)."""
    import optax

    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = tiny_config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                            attention_backend="pallas"))
    model = build_model(cfg, seed=0)
    gd, params = nnx.split(model, nnx.Param)
    tx = optax.adam(1e-3)
    opt = tx.init(params)
    x = jax.random.uniform(jax.random.key(1), (2, 64, 64, 3))
    tgt = jax.random.uniform(jax.random.key(2), (2, 64, 64, 1))

    @jax.jit
    def step(p, o):
        def loss(p):
            y = nnx.merge(gd, p)(x, key=jax.random.key(3))
            return jnp.mean((y - tgt) ** 2)

        l, g = jax.value_and_grad(loss)(p)
        u, o2 = tx.update(g, o, p)
        return optax.apply_updates(p, u), o2, l

    p, o, l0 = step(params, opt)
    for _ in range(3):
        p, o, l = step(p, o)
    assert float(l) < float(l0)
