"""Spatial sharding: halo exchange, sharded Swin blocks, and the
full-model GSPMD spatial path (round-3 productionization) on the 8-device
virtual mesh. Everything is parity-tested against unsharded execution."""

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

    # ground truth: plain SAME (zero-padded) conv — the model's Conv3x3
    # semantics; the sharded version uses a mode='zero' halo
    ref = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC")) + b

    with mesh:
        conv = spatial_conv3x3(mesh, k, b)
        out = jax.jit(conv)(x, k, b)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("halo", [1, 3])
@pytest.mark.parametrize("mode", ["edge", "zero"])
def test_halo_exchange_exact_any_halo(halo, mode):
    """halo>1 must be EXACT (r2 weak item #5: the old edge rule replicated
    the first `halo` rows in order, correct only at halo=1)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from sunet_tf_tpu.parallel.spatial import halo_exchange_rows

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    mesh = make_mesh(data=1, spatial=4)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((16, 8, 3)),
                    jnp.float32)

    def local(xl):
        return halo_exchange_rows(xl, "spatial", halo, mode=mode)

    out = jax.jit(shard_map(local, mesh=mesh, in_specs=P("spatial"),
                            out_specs=P("spatial")))(x)
    # shard i's output rows: [pad | local rows | pad]
    pad_mode = "edge" if mode == "edge" else "constant"
    ref_global = np.pad(np.asarray(x), ((halo, halo), (0, 0), (0, 0)),
                        mode=pad_mode)
    L = 16 // 4
    pieces = [ref_global[i * L : i * L + L + 2 * halo] for i in range(4)]
    np.testing.assert_allclose(np.asarray(out), np.concatenate(pieces),
                               atol=0)


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


def test_full_model_spatial_forward_matches_unsharded(tiny_cfg, tiny_model):
    """Round-3: the WHOLE SUNet (convs, patch embed, all stages, merging,
    dual upsamples, output conv) under spatial_forward on a data=4 x
    spatial=2 mesh must match the unsharded forward to 1e-5 (it is the
    same program under GSPMD constraints — exact by construction)."""
    from flax import nnx

    from sunet_tf_tpu.parallel.spatial import spatial_forward

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    mesh = make_mesh(data=4, spatial=2)
    gd, st = nnx.split(tiny_model, nnx.Param)
    x = jnp.asarray(np.random.default_rng(3).random((4, 64, 64, 3)),
                    jnp.float32)
    ref = jax.jit(lambda p, xx: nnx.merge(gd, p)(xx))(st, x)
    out = spatial_forward(mesh, gd, st, x, win_size=tiny_cfg.swinunet.win_size)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
