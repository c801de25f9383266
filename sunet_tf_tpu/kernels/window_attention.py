"""Pallas TPU kernel: fused window-attention sublayer.

Covers the W-MSA hot loop (reference model/SUNet_detail.py:107-138 plus the
partition/reverse data movement :27-56) as ONE kernel per (batch, window-row)
grid cell: qkv projection -> per-window multi-head attention with
relative-position bias and SW-MSA mask -> head merge -> output projection.
The XLA path materializes qkv / attention probabilities / context in HBM
between fusions; here everything after the x-strip load lives in VMEM, so
the sublayer costs one HBM read + one write of the activation.

Design notes (per /opt/skills/guides/pallas_guide.md):

- grid = (B, H // ws); each program owns a (ws, W, C) strip = one row of
  windows. All weights are VMEM-resident (block index (0, 0) every cell).
- window size is 8 -> N = 64 tokens; per-window matmuls are tiny, so
  windows and heads are kept as dot_general batch dims; the win over XLA is
  the fused data movement, not MXU scheduling (SURVEY §7 "hard parts").
- matmuls accumulate fp32 (preferred_element_type); softmax runs fp32.
- the SW-MSA mask row-strip is selected by the grid index; the cyclic roll
  stays outside (XLA fuses a roll into the producing op for free, and a
  wrapped roll cannot be expressed as a BlockSpec index_map).

The XLA reference implementation lives in models/layers.py
(WindowAttention.__call__); parity is gated in tests/test_pallas.py and the
backend is selectable per-model via TPU.ATTENTION_BACKEND.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref, bias_ref,
            mask_ref, o_ref, *, ws: int, num_heads: int, scale: float,
            has_mask: bool):
    _, _, W, C = x_ref.shape  # block (1, ws, W, C)
    nw = W // ws
    N = ws * ws
    h = num_heads
    d = C // h

    x = x_ref[0]  # (ws, W, C)
    tokens = x.reshape(ws * W, C)
    qkv = jnp.dot(tokens, wqkv_ref[...],
                  preferred_element_type=jnp.float32) + bqkv_ref[0]
    qkv = qkv.astype(x.dtype)
    # (ws, nw, ws, 3, h, d) -> (nw, 3, h, N=ws*ws, d); rows-major tokens
    qkv = qkv.reshape(ws, nw, ws, 3, h, d)
    # windows*heads folded into ONE batch dim (Mosaic tpu.matmul supports
    # at most one batch dimension)
    qkv = qkv.transpose(1, 3, 4, 0, 2, 5).reshape(nw * 3 * h, N, d)
    qkv = qkv.reshape(nw, 3, h, N, d)
    q = qkv[:, 0].reshape(nw * h, N, d).astype(jnp.float32) * scale
    k = qkv[:, 1].reshape(nw * h, N, d).astype(jnp.float32)
    v = qkv[:, 2].reshape(nw * h, N, d)

    scores = jax.lax.dot_general(
        q, k, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (nw*h, N, N)
    scores = scores.reshape(nw, h, N, N) + bias_ref[...][None]
    if has_mask:
        scores = scores + mask_ref[...][:, None]
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    ctx = jax.lax.dot_general(
        probs.reshape(nw * h, N, N), v, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)  # (nw*h, N, d)
    ctx = ctx.astype(x.dtype).reshape(nw, h, N, d)
    # merge heads and restore strip layout (ws, W, C)
    ctx = ctx.transpose(0, 2, 1, 3).reshape(nw, ws, ws, C)
    strip = ctx.transpose(1, 0, 2, 3).reshape(ws * W, C)
    out = jnp.dot(strip, wproj_ref[...],
                  preferred_element_type=jnp.float32) + bproj_ref[0]
    o_ref[0] = out.reshape(ws, W, C).astype(o_ref.dtype)


def fused_window_attention(
    x: jnp.ndarray,
    wqkv: jnp.ndarray,
    bqkv: Optional[jnp.ndarray],
    wproj: jnp.ndarray,
    bproj: jnp.ndarray,
    bias: jnp.ndarray,
    mask: Optional[jnp.ndarray],
    *,
    ws: int,
    num_heads: int,
    scale: float,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused W-MSA sublayer over a pre-normalized, pre-rolled NHWC map.

    x:     (B, H, W, C)  — H, W divisible by ws
    wqkv:  (C, 3C), bqkv: (3C,) or None
    wproj: (C, C),  bproj: (C,)
    bias:  (num_heads, N, N) fp32 relative-position bias matrix
    mask:  (nW, N, N) fp32 additive SW-MSA mask or None
    returns (B, H, W, C) in x.dtype — attention output BEFORE the residual.
    """
    if interpret is None:
        # Mosaic needs real TPU hardware; interpret elsewhere (CPU tests).
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    N = ws * ws
    nw_row = W // ws
    n_rows = H // ws
    if bqkv is None:
        bqkv = jnp.zeros((3 * C,), jnp.float32)
    bqkv2 = bqkv.astype(jnp.float32).reshape(1, 3 * C)
    bproj2 = bproj.astype(jnp.float32).reshape(1, C)
    has_mask = mask is not None
    if mask is None:
        mask = jnp.zeros((n_rows * nw_row, N, N), jnp.float32)
    mask = jnp.asarray(mask, jnp.float32)
    bias = jnp.asarray(bias, jnp.float32)

    grid = (B, n_rows)
    kernel = functools.partial(_kernel, ws=ws, num_heads=num_heads,
                               scale=float(scale), has_mask=has_mask)
    full = lambda *shape: pl.BlockSpec(shape, lambda b, r: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, ws, W, C), lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            full(C, 3 * C),
            full(1, 3 * C),
            full(C, C),
            full(1, C),
            full(num_heads, N, N),
            pl.BlockSpec((nw_row, N, N), lambda b, r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ws, W, C), lambda b, r: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * (3 * C + C) + 4 * B * H * W * N * C,
            bytes_accessed=2 * B * H * W * C * x.dtype.itemsize
            + 4 * C * C * wqkv.dtype.itemsize,
            transcendentals=B * H * W * N,
        ),
    )(x, wqkv, bqkv2, wproj, bproj2, bias, mask)
