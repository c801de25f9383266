"""Spatial sharding: halo exchange correctness on an 8-device mesh.

A 3x3 conv over H-sharded images with ppermute halo exchange must equal
the unsharded conv (the SP primitive for very large inputs, SURVEY §2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sunet_tf_tpu.parallel.mesh import make_mesh
from sunet_tf_tpu.parallel.spatial import spatial_conv3x3


def test_spatial_conv_matches_unsharded():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(data=1, spatial=8)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 64, 16, 3)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 5)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal((5,)) * 0.1, jnp.float32)

    # ground truth: edge-padded rows, SAME cols (matches halo edge rule)
    xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="edge")
    ref = jax.lax.conv_general_dilated(
        xp, k, (1, 1), [(0, 0), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    with mesh:
        conv = spatial_conv3x3(mesh, k, b)
        out = jax.jit(conv)(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
