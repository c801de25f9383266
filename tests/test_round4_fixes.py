"""Round-4 regression pins."""

import jax.numpy as jnp
import numpy as np


def test_block_strips_scale_with_compute_dtype():
    """fp32 activations double the block kernels' live set, so the strip
    count must double where window rows allow — the round-4 parity run's
    fp32 backend cross-check overflowed scoped VMEM (32.95M vs 31.84M)
    when strips were sized for bf16 regardless of dtype."""
    from sunet_tf_tpu.kernels.window_attention import _block_strips

    s_bf16 = _block_strips(64, 64, 96, 8, train=False, itemsize=2)
    s_fp32 = _block_strips(64, 64, 96, 8, train=False, itemsize=4)
    assert s_fp32 == 2 * s_bf16
    # bf16 behavior unchanged (perf-calibrated defaults)
    assert s_bf16 == 1
    assert _block_strips(64, 64, 96, 8, train=True, itemsize=2) == 2


def test_fp32_pallas_block_fwd_bwd_consistent_strips():
    """The custom-VJP pair must agree on S at fp32 (residual shapes are
    derived from the forward's strip count)."""
    import jax
    from flax import nnx

    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = tiny_config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                            attention_backend="pallas"))
    model = build_model(cfg, seed=0)
    graphdef, params = nnx.split(model, nnx.Param)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                    jnp.float32)
    key = jax.random.key(0)

    def loss(p, x):
        return jnp.mean(jnp.abs(nnx.merge(graphdef, p)(x, key=key)))

    l, g = jax.jit(jax.value_and_grad(loss))(params, x)
    assert np.isfinite(float(l))
    assert all(bool(jnp.isfinite(a).all()) for a in jax.tree.leaves(g))


def test_shift_softmax_exact_at_standard_scaling(monkeypatch):
    """SUNET_SOFTMAX=shift (the +10% scaled-config mode) must equal the
    exact rowmax softmax when logits are bounded — the scaled recipe
    uses qk_scale=None (head_dim**-0.5), unlike the reference's
    QK_SCALE=8 logit-exploding default."""
    import jax
    from flax import nnx

    from sunet_tf_tpu.config import tiny_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = tiny_config(qk_scale=None)
    cfg = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                            attention_backend="pallas"))
    x = jnp.asarray(np.random.default_rng(3).random((2, 64, 64, 3)),
                    jnp.float32)
    outs = {}
    for mode in ("rowmax", "shift"):
        monkeypatch.setenv("SUNET_SOFTMAX", mode)
        model = build_model(cfg, seed=0)
        gd, params = nnx.split(model, nnx.Param)
        outs[mode] = jax.jit(lambda p, xx: nnx.merge(gd, p)(xx))(params, x)
    err = float(jnp.max(jnp.abs(outs["rowmax"] - outs["shift"])))
    assert err < 1e-5, err


def test_grouped_blockdiag_matches_perhead(monkeypatch):
    """_grouped_g routes small-head-dim perhead attention through the
    blockdiag core in g-head groups; outputs must match the plain
    perhead loop (fp32: identical math up to num/den association)."""
    import jax

    from sunet_tf_tpu.kernels.window_attention import (
        _attn_core,
        _grouped_g,
    )

    nW, N, h, d = 4, 64, 8, 48  # default-model stage-2 geometry
    C = h * d
    assert _grouped_g(d, N, h) == 4
    r = np.random.default_rng(0)
    q, k, v = (jnp.asarray(r.standard_normal((nW, N, C)), jnp.float32)
               for _ in range(3))
    bias = jnp.asarray(r.standard_normal((h, N, N)), jnp.float32)
    mask = jnp.asarray(r.standard_normal((nW, N, N)), jnp.float32)

    def run():
        return _attn_core(q, k, v, bias, mask, num_heads=h, scale=0.25)

    grouped = run()
    monkeypatch.setenv("SUNET_GROUPED_PERHEAD", "0")
    perhead = run()
    err = float(jnp.max(jnp.abs(grouped - perhead)))
    assert err < 1e-4, err
