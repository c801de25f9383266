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


def test_swin_blocks_spatially_sharded_match_unsharded():
    """The real model math runs spatially sharded: a pair of SwinBlocks
    (unshifted + shifted) over H sharded 4-ways, with the SW-MSA roll done
    as a ppermute halo, must reproduce the unsharded forward exactly."""
    from flax import nnx

    from sunet_tf_tpu.models.layers import SwinBlock
    from sunet_tf_tpu.parallel.spatial import run_swin_blocks_spatial

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=1, spatial=4, devices=jax.devices()[:4])
    blocks = [
        SwinBlock(16, (32, 32), 2, window_size=4, shift_size=0,
                  qk_scale=8.0, drop_path_rate=0.0, rngs=nnx.Rngs(7)),
        SwinBlock(16, (32, 32), 2, window_size=4, shift_size=2,
                  qk_scale=8.0, drop_path_rate=0.0, rngs=nnx.Rngs(8)),
    ]
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 32, 32, 16)), jnp.float32)

    ref = x
    for blk in blocks:
        ref = blk(ref)

    out = jax.jit(lambda x: run_swin_blocks_spatial(mesh, blocks, x))(x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
