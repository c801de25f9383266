"""fused_ln_mlp parity vs the XLA MLP sublayer (covers the C=768 stage-4
fallback path that tiny-config model tests never reach)."""

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sunet_tf_tpu.kernels.window_attention import fused_ln_mlp
from sunet_tf_tpu.models.layers import Mlp


def test_fused_ln_mlp_matches_xla():
    C, hidden = 768, 3072
    rngs = nnx.Rngs(0)
    ln = nnx.LayerNorm(C, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
    mlp = Mlp(C, hidden, rngs=rngs)
    y = jax.random.normal(jax.random.key(1), (2, 8, 8, C), jnp.float32)

    ref = y + mlp(ln(y).astype(y.dtype))
    out = fused_ln_mlp(
        y, (ln.scale[...], ln.bias[...]),
        mlp.fc1.kernel[...], mlp.fc1.bias[...],
        mlp.fc2.kernel[...], mlp.fc2.bias[...])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_fused_ln_mlp_erf_accuracy():
    """The in-kernel A&S erf approximation must track exact gelu closely."""
    from sunet_tf_tpu.kernels.window_attention import _gelu_exact

    x = jnp.linspace(-6, 6, 1001, dtype=jnp.float32)
    ours = np.asarray(_gelu_exact(x))
    exact = np.asarray(jax.nn.gelu(x, approximate=False))
    assert np.max(np.abs(ours - exact)) < 1e-6


def test_fused_ln_mlp_drop_path_scale():
    C, hidden = 128, 512
    rngs = nnx.Rngs(0)
    ln = nnx.LayerNorm(C, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
    mlp = Mlp(C, hidden, rngs=rngs)
    y = jax.random.normal(jax.random.key(2), (2, 8, 8, C), jnp.float32)
    zero = fused_ln_mlp(
        y, (ln.scale[...], ln.bias[...]),
        mlp.fc1.kernel[...], mlp.fc1.bias[...],
        mlp.fc2.kernel[...], mlp.fc2.bias[...],
        drop_path_scale=jnp.zeros((2, 1)))
    np.testing.assert_allclose(np.asarray(zero), np.asarray(y), atol=1e-6)
