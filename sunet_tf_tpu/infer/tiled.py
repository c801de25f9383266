"""Inference paths: padded fixed-size and batched overlap-tiled.

The reference's arbitrary-resolution path (demo_any_resolution.py:35-52,
116-139) pads the image to a centered square multiple of the tile size,
unfolds overlapping stride-s tiles, runs the model ONE TILE AT A TIME, and
reconstructs by F.fold overlap-add with uniform weight normalization.

TPU-native version, same reconstruction semantics:

- all tiles run as batches (configurable tile_batch) — one compiled shape,
  MXU kept busy; tiles are embarrassingly parallel and shard over the
  'data' mesh axis for multi-chip;
- the overlap-add weight map is a trace-time constant;
- padding is rectangular (ceil to tile multiples per side), not square —
  the reference's square padding blew up memory on elongated images
  (SURVEY defect #13); set square_pad=True for bit-parity with the
  reference geometry.

The correctness contract (tested): tiled == monolithic on images where both
paths apply, and reconstruction of identity predictions is exact.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np


def required_granularity(patch_size: int, num_stages: int, win_size: int) -> int:
    """Smallest g such that any HxW with g | H, W runs through every stage:
    stage i needs (H / patch / 2^i) divisible by its effective window."""
    return patch_size * (2 ** (num_stages - 1)) * win_size


def reflect_pad_nhwc(x: jnp.ndarray, ph: int, pw: int) -> jnp.ndarray:
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")


def padded_inference(model_fn: Callable, img: jnp.ndarray, granularity: int) -> jnp.ndarray:
    """Run the model at (reflect-padded) native resolution, crop back.

    Covers the reference demo.py flow (which silently required the training
    resolution; we pad instead of failing — strict improvement)."""
    B, H, W, C = img.shape
    Hp = math.ceil(H / granularity) * granularity
    Wp = math.ceil(W / granularity) * granularity
    y = model_fn(reflect_pad_nhwc(img, Hp - H, Wp - W))
    return y[:, :H, :W, :]


def _tile_starts(X: int, kernel: int, stride: int) -> list:
    """Unfold start offsets: 0, s, 2s, ... while start + kernel <= X
    (torch Tensor.unfold semantics used at demo_any_resolution.py:45)."""
    return list(range(0, X - kernel + 1, stride))


@functools.partial(
    jax.jit,
    static_argnames=("model_fn", "kernel", "stride", "tile_batch",
                     "square_pad", "mesh"),
)
def tiled_inference(
    model_fn: Callable,
    img: jnp.ndarray,
    params=None,
    kernel: int = 256,
    stride: int = 128,
    tile_batch: int = 16,
    square_pad: bool = False,
    mesh=None,
) -> jnp.ndarray:
    """Overlap-tiled inference over an NHWC image (B=1), fold-average
    reconstruction identical to demo_any_resolution.py:125-136.

    model_fn: (params, (N, kernel, kernel, C)) -> (N, kernel, kernel, C_out)
    when ``params`` is given, else (N, k, k, C) -> (N, k, k, C_out).
    Keep weights in ``params`` (a traced argument): baking them into the
    closure turns them into HLO constants, which bloats compilation.

    The whole function is jit-compiled per image shape; the fold uses
    q^2 = (kernel/stride)^2 vectorized adds, not one add per tile.

    With ``mesh``, tiles are sharded over the 'data' axis and the model
    runs once over the full tile batch (tiles are embarrassingly parallel
    — the multi-chip arbitrary-resolution path, SURVEY §2 SP row).
    """
    B, H, W, C = img.shape
    assert B == 1, "tiled path processes one image at a time (reference parity)"
    assert stride <= kernel and kernel % stride == 0
    q = kernel // stride
    run = (lambda t: model_fn(params, t)) if params is not None else model_fn

    if square_pad:
        X = int(math.ceil(max(H, W) / kernel) * kernel)
        Xh = Xw = X
    else:
        Xh = int(math.ceil(H / kernel) * kernel)
        Xw = int(math.ceil(W / kernel) * kernel)
    top, left = (Xh - H) // 2, (Xw - W) // 2
    canvas = jnp.zeros((Xh, Xw, C), img.dtype)
    canvas = jax.lax.dynamic_update_slice(canvas, img[0], (top, left, 0))

    n_rows = len(_tile_starts(Xh, kernel, stride))
    n_cols = len(_tile_starts(Xw, kernel, stride))
    # gather tiles in block coords (stride units): tile (r,c) = q x q blocks;
    # q^2 strided slices assemble ALL tiles at once (tile count-independent IR)
    blocks = canvas.reshape(Xh // stride, stride, Xw // stride, stride, C)
    blocks = blocks.transpose(0, 2, 1, 3, 4)  # (nRb, nCb, s, s, C)
    rows = []
    for i in range(q):
        cols = [blocks[i : i + n_rows, j : j + n_cols] for j in range(q)]
        rows.append(jnp.stack(cols, axis=2))  # (n_rows, n_cols, q, s, s, C)
    tb = jnp.stack(rows, axis=2)  # (n_rows, n_cols, q, q, s, s, C)
    tiles = tb.transpose(0, 1, 2, 4, 3, 5, 6).reshape(-1, kernel, kernel, C)

    T = tiles.shape[0]
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_data = mesh.shape["data"]
        pad_t = (-T) % n_data
        if pad_t:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad_t,) + tiles.shape[1:], tiles.dtype)])
        tiles = jax.lax.with_sharding_constraint(
            tiles, NamedSharding(mesh, P("data")))
        outs = run(tiles)
        out_c = outs.shape[-1]
        outs = outs[:T]
    else:
        # tile_batch bounds per-forward memory; balance the actual chunk
        # size so padding is minimal (49 tiles at tile_batch=32 would pad
        # to 2x32=64 — 23% wasted compute; balanced: 2x25=50, one pad tile)
        n_chunks = -(-T // tile_batch)
        chunk = -(-T // n_chunks)
        pad_t = n_chunks * chunk - T
        if pad_t:
            tiles = jnp.concatenate(
                [tiles, jnp.zeros((pad_t,) + tiles.shape[1:], tiles.dtype)])
        chunks = tiles.reshape(n_chunks, chunk, kernel, kernel, C)
        outs = jax.lax.map(run, chunks)
        out_c = outs.shape[-1]
        outs = outs.reshape(-1, kernel, kernel, out_c)[:T]

    # fold overlap-add in block coords: q^2 vectorized adds
    ob = outs.reshape(n_rows, n_cols, q, stride, q, stride, out_c)
    ob = ob.transpose(0, 1, 2, 4, 3, 5, 6).astype(jnp.float32)
    # (n_rows, n_cols, q, q, s, s, out_c)
    nRb, nCb = Xh // stride, Xw // stride
    acc = jnp.zeros((nRb, nCb, stride, stride, out_c), jnp.float32)
    wgt = np.zeros((nRb, nCb, 1, 1, 1), np.float32)
    for i in range(q):
        for j in range(q):
            acc = acc.at[i : i + n_rows, j : j + n_cols].add(ob[:, :, i, j])
            wgt[i : i + n_rows, j : j + n_cols] += 1.0
    acc = acc / jnp.asarray(wgt)
    folded = acc.transpose(0, 2, 1, 3, 4).reshape(Xh, Xw, out_c)
    return folded[None, top : top + H, left : left + W, :]
