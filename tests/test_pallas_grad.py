"""Gradient parity: Pallas fwd+bwd kernels vs the XLA path.

Two trainable routes, both covered: the whole-block custom-VJP (default,
SUNET_TRAIN_BLOCK_KERNEL=1) and the two sublayer custom-VJPs (fallback).
The backward kernels recompute the forward in VMEM and accumulate weight
grads across the grid; gradients must match XLA autodiff of the same math.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
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


@pytest.mark.parametrize("bwd_layout", ["blockdiag", "perhead"])
@pytest.mark.parametrize("block_kernel", ["1", "0"],
                         ids=["whole-block", "sublayer"])
@pytest.mark.parametrize("shift", [0, 2], ids=["unshifted", "shifted"])
def test_grad_parity(monkeypatch, block_kernel, shift, bwd_layout):
    """Both backward attention-core layouts must match XLA autodiff —
    the auto rule only reaches one branch per geometry (r3: the backward
    kernels gained the blockdiag lane-concat layout)."""
    monkeypatch.setenv("SUNET_TRAIN_BLOCK_KERNEL", block_kernel)
    monkeypatch.setenv("SUNET_ATTN_LAYOUT_BWD", bwd_layout)
    (gp1, gx1) = _grads("xla", shift)
    (gp2, gx2) = _grads("pallas", shift)
    np.testing.assert_allclose(np.asarray(gx2), np.asarray(gx1),
                               rtol=1e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-5)


def test_trainable_block_drop_path_scales():
    """rate>0: the whole-block path's per-sample scales actually gate the
    residual branches (identity for dropped samples up to both-branch drop)."""
    blk = SwinBlock(16, (16, 16), 2, window_size=4, shift_size=0,
                    qk_scale=8.0, drop_path_rate=0.999999,
                    backend="pallas", rngs=nnx.Rngs(4))
    x = jax.random.normal(jax.random.key(9), (2, 16, 16, 16), jnp.float32)
    y = blk(x, key=jax.random.key(0))
    # with rate ~1 both branches are dropped for every sample -> identity
    np.testing.assert_allclose(np.asarray(y), np.asarray(x),
                               rtol=1e-5, atol=1e-5)


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


def test_inkernel_roll_grads_match_external(monkeypatch):
    """Gradients through the fused-roll trainable block (shift>0 in the
    kernels, SUNET_TRAIN_ROLL_FUSE=1 — off by default after it measured
    slower on hardware) == gradients through the external-roll path."""
    import numpy as _np

    monkeypatch.setenv("SUNET_TRAIN_ROLL_FUSE", "1")
    (gp1, gx1) = _grads("pallas", 2)  # in-kernel roll (fwd+bwd kernels)
    monkeypatch.delenv("SUNET_TRAIN_ROLL_FUSE")
    (gp2, gx2) = _grads("pallas", 2)  # external roll2d default
    _np.testing.assert_allclose(_np.asarray(gx1), _np.asarray(gx2),
                                rtol=2e-4, atol=2e-4)
    for a, b in zip(jax.tree.leaves(gp1), jax.tree.leaves(gp2)):
        _np.testing.assert_allclose(_np.asarray(a), _np.asarray(b),
                                    rtol=2e-4, atol=2e-4)
