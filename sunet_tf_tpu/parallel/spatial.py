"""Spatial sharding primitives: halo exchange over a mesh axis.

The reference has no sequence/context parallelism; its honest long-context
analog is window-local attention + overlap-tiled inference (SURVEY §2, §5.7).
For images too large even for per-chip tiles, the TPU-native answer is to
shard H over a 'spatial' mesh axis and exchange a halo of boundary rows
with jax.lax.ppermute before spatially-local ops (convs, shifted windows
need a shift-sized halo). These helpers are shard_map building blocks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def halo_exchange_rows(x: jnp.ndarray, axis_name: str, halo: int) -> jnp.ndarray:
    """Inside shard_map: pad a (local_H, W, C) shard with `halo` rows from
    the neighboring shards along `axis_name` (edge shards replicate their
    own boundary rows — 'edge' padding semantics at the global border).

    Returns (local_H + 2*halo, W, C).
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    top_rows = x[:halo]       # my first rows -> neighbor below needs them
    bot_rows = x[-halo:]      # my last rows -> neighbor above needs them

    # receive the bottom rows of the shard above me
    from_above = jax.lax.ppermute(
        bot_rows, axis_name, [(i, (i + 1) % n) for i in range(n)])
    # receive the top rows of the shard below me
    from_below = jax.lax.ppermute(
        top_rows, axis_name, [(i, (i - 1) % n) for i in range(n)])

    # edge shards: substitute own border rows (edge-padding semantics at
    # the global boundary; exact for halo=1, approximate above)
    from_above = jnp.where(idx == 0, x[:halo], from_above)
    from_below = jnp.where(idx == n - 1, x[-halo:], from_below)
    return jnp.concatenate([from_above, x, from_below], axis=0)


def spatial_conv3x3(mesh: Mesh, kernel: jnp.ndarray, bias=None):
    """Build a shard_map'd 3x3 SAME conv over images sharded as
    P(None, 'spatial', None, None) on (B, H, W, C). Demonstrates the
    halo-exchange pattern used for spatially-sharded inference."""
    from jax import shard_map

    def local_conv(x, k, b):
        # x: (B, localH, W, C) shard
        def per_image(img):
            padded = halo_exchange_rows(img, "spatial", 1)
            # rows VALID (halo supplies them), cols SAME
            return jax.lax.conv_general_dilated(
                padded[None], k, (1, 1), [(0, 0), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]

        y = jax.vmap(per_image)(x)
        if b is not None:
            y = y + b
        return y

    spec = P(None, "spatial", None, None)
    return shard_map(
        local_conv, mesh=mesh,
        in_specs=(spec, P(None, None, None, None), P(None)),
        out_specs=spec,
    )
