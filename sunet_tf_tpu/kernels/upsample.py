"""Pallas TPU kernel: fused dual up-sample x4 head.

Covers the reference's final `UpSample(..., 4)` (model/SUNet_detail.py:
353-363, invoked from up_x4 at :736-746): PixelShuffle branch + bilinear
branch, mixed by a 1x1 conv — here with the algebraic rewrites already
used by the XLA path (models/layers.py::DualUpsample): second 1x1 convs
and the mix fold into per-branch (C, C) projections.

Why this kernel exists (measured on v5e, batch 32 @ 256^2): the XLA path
spends ~9.5 ms/iter (19% of the whole forward) in LAYOUT COPIES around
this head — the (B, 64, 64, 16C) expand relayout (2.4 ms), the 6-D
pixel-shuffle transpose (2.0 ms), two (B, 256, 256, C) relayouts
(3.4 ms) and the resize contractions — because every reshape/transpose
of the upsampled map is an HBM read+write round trip at ~10-80 GB/s.
Fused, the head reads the low-res input once and streams the high-res
output once; all interleaving is VMEM data movement.

Layout rules obeyed (Mosaic, probed empirically — see CLAUDE.md):
- the expand conv's 16C output lanes are never split: the kernel takes
  the expand weights pre-permuted as 16 per-subpixel (C, C) projections
  (host-side weight reshape), so every in-kernel tensor keeps C lanes.
- pixel-shuffle interleaving is built from stacks + leading/sublane
  reshapes only (no lane-dim splits, no 6-D transposes).
- the bilinear x4 half-pixel stencil is separable: 4 H-phase taps on a
  1-row-halo strip, then 4 W-phase taps with edge clamp — pure VMEM
  multiply-adds, replacing jax.image.resize's matmul+transpose chain.

Halo: grid programs own H/S-row input strips; the bilinear needs one
row above/below, delivered by passing x three times with shifted block
index maps (clamped at the image edge in-kernel via program_id selects).

Parity with the XLA path is gated in tests/test_pallas.py; bench.py's
hardware numerics gate covers the compiled Mosaic lowering.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sunet_tf_tpu.kernels.window_attention import (_compiler_params,
                                                   _pad128, _tree_bytes)

# Half-pixel x4 phase weights: output 4h+p samples input at
# h + (2p-3)/8 -> two taps (floor, floor+1) with these weights.
_P4 = ((0.375, 0.625), (0.125, 0.875), (0.875, 0.125), (0.625, 0.375))
# phases 0,1 tap rows (h-1, h); phases 2,3 tap rows (h, h+1)


def _prelu(x: jnp.ndarray, a) -> jnp.ndarray:
    return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


def _up4_kernel(xp_ref, xc_ref, xn_ref, wexp_ref, wb1_ref, bb1_ref,
                wpf_ref, wbf_ref, alpha_ref, o_ref, *, S: int):
    _, Hs, W, C = xc_ref.shape
    f32 = jnp.float32
    dt = xc_ref.dtype
    xc = xc_ref[0]
    ap = alpha_ref[0, 0]
    ab = alpha_ref[0, 1]

    # ---- PixelShuffle branch: 16 per-subpixel expand projections at low
    # res, PReLU, interleave in VMEM, then ONE folded (C, C) projection.
    # Interleave recipe (Mosaic-probed): unit dims may only be inserted at
    # LEADING positions; a 5-D transpose may move the sublane dim; merges
    # of adjacent non-lane dims are free. stack()/unit-insert at the
    # sublane slot and strided stores both fail to lower.
    t = xc.reshape(Hs * W, C)
    ys = []
    for s in range(16):
        z = jnp.dot(t, wexp_ref[s], preferred_element_type=f32)
        ys.append(_prelu(z, ap).astype(dt).reshape(1, 1, Hs, W, C))
    grid5 = jnp.concatenate(
        [jnp.concatenate(ys[i * 4:(i + 1) * 4], axis=1) for i in range(4)],
        axis=0)                                    # (4i, 4j, Hs, W, C)
    P = grid5.transpose(2, 0, 3, 1, 4).reshape(4 * Hs, 4 * W, C)
    Pm = jnp.dot(P.reshape(16 * Hs * W, C), wpf_ref[...],
                 preferred_element_type=f32)

    # ---- bilinear branch at low res (1x1 conv + PReLU + folded mix),
    # then the separable half-pixel x4 stencil.
    sid = pl.program_id(1)
    prev = jnp.where(sid == 0, xc[0:1], xp_ref[0, Hs - 1:Hs])
    nxt = jnp.where(sid == S - 1, xc[Hs - 1:Hs], xn_ref[0, 0:1])
    xch = jnp.concatenate([prev, xc, nxt], axis=0)  # (Hs+2, W, C)
    zb = jnp.dot(xch.reshape((Hs + 2) * W, C), wb1_ref[...],
                 preferred_element_type=f32) + bb1_ref[0]
    zb = _prelu(zb, ab).astype(dt)
    xb = jnp.dot(zb, wbf_ref[...],
                 preferred_element_type=f32).reshape(Hs + 2, W, C)
    s0, s1, s2 = xb[0:Hs], xb[1:Hs + 1], xb[2:Hs + 2]
    taps = (s0, s1), (s0, s1), (s1, s2), (s1, s2)
    yh = jnp.concatenate(
        [(a * lo + b * hi).reshape(1, Hs, W, C)
         for (a, b), (lo, hi) in zip(_P4, taps)],
        axis=0).transpose(1, 0, 2, 3).reshape(4 * Hs, W, C)
    t0 = jnp.concatenate([yh[:, 0:1], yh[:, :W - 1]], axis=1)
    t2 = jnp.concatenate([yh[:, 1:], yh[:, W - 1:]], axis=1)
    wt = (t0, yh), (t0, yh), (yh, t2), (yh, t2)
    yw = jnp.concatenate(
        [(a * lo + b * hi).reshape(1, 4 * Hs, W, C)
         for (a, b), (lo, hi) in zip(_P4, wt)],
        axis=0).transpose(1, 2, 0, 3).reshape(4 * Hs, 4 * W, C)

    o_ref[0] = (Pm.reshape(4 * Hs, 4 * W, C) + yw).astype(o_ref.dtype)


def _up4_tmp_bytes(Hs: int, W: int, C: int) -> int:
    """Peak in-kernel temporaries, lane-padded (measured on v5e: the
    16x(Hs,W,C) bf16 subpixel maps + grid5/P bf16 + Pm/yw fp32 stacks sum
    to ~16*Hs*W*pad(C)*14; a 33.5M request at Hs=16/W=64/C=96 measured
    31.8M actual)."""
    return 16 * Hs * W * _pad128(C) * 16


def _up4_strips(H: int, W: int, C: int) -> int:
    """Input rows per program: bound peak temporaries within a modest VMEM
    window (small strips pipeline better and keep the scoped request from
    constraining XLA's scheduling of surrounding ops)."""
    S = 1
    while H % (S * 2) == 0 and _up4_tmp_bytes(H // S, W, C) > 18 * 1024 * 1024:
        S *= 2
    return S


def fused_dual_upsample4(
    x: jnp.ndarray,
    w_exp: jnp.ndarray,
    alpha_p: jnp.ndarray,
    w_b1: jnp.ndarray,
    b_b1: jnp.ndarray,
    alpha_b: jnp.ndarray,
    wpf: jnp.ndarray,
    wbf: jnp.ndarray,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused x4 dual up-sample head.

    x: (B, H, W, C); w_exp: (C, 16*C) expand conv (torch PixelShuffle
    channel order: column c*16 + i*4 + j feeds output pixel (4h+i, 4w+j)
    channel c); wpf/wbf: folded (C, C) branch projections
    (up_X_conv2 @ mix slice — see models/layers.py::DualUpsample).
    Returns (B, 4H, 4W, C) in x.dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    S = _up4_strips(H, W, C)
    Hs = H // S
    # (C, 16C) -> (16, C, C): per-subpixel projection s = i*4+j
    wexp_s = w_exp.reshape(C, C, 16).transpose(2, 0, 1)
    alphas = jnp.stack([alpha_p.reshape(()), alpha_b.reshape(())]
                       ).astype(jnp.float32).reshape(1, 2)
    f32row = lambda a, n: a.astype(jnp.float32).reshape(1, n)
    full = lambda *shape: pl.BlockSpec(shape, lambda bb, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    strip = lambda fn: pl.BlockSpec((1, Hs, W, C),
                                    lambda bb, g: (bb, fn(g), 0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(_up4_kernel, S=S)
    return pl.pallas_call(
        kernel,
        grid=(B, S),
        in_specs=[
            strip(lambda g: jnp.maximum(g - 1, 0)),
            strip(lambda g: g),
            strip(lambda g: jnp.minimum(g + 1, S - 1)),
            full(16, C, C),
            full(C, C), full(1, C),
            full(C, C), full(C, C),
            pl.BlockSpec((1, 2), lambda bb, g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 4 * Hs, 4 * W, C),
                               lambda bb, g: (bb, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 4 * H, 4 * W, C), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(
            # IO blocks: 3 input strips + output strip + weights
            (3 * Hs + 16 * Hs) * W * C * x.dtype.itemsize
            + _tree_bytes(wexp_s, w_b1, wpf, wbf),
            tmp_bytes=_up4_tmp_bytes(Hs, W, C)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * C * (16 + 2 + 2) + 2 * B * 16 * H * W * C * C,
            bytes_accessed=(3 + 16) * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, wexp_s.astype(x.dtype), w_b1.astype(x.dtype),
      f32row(b_b1, C), wpf.astype(x.dtype), wbf.astype(x.dtype), alphas)
