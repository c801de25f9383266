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
import os as _os
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


def _up4_strips(H: int, W: int, C: int, small: bool = False) -> int:
    """Input rows per program: bound peak temporaries within the VMEM
    window. Default: 18MB target — the stage-0
    S=1 block kernels already hold ~21-30MB scoped windows, so a 22MB
    request changes nothing, and chained single-jit A/B on v5e b16
    measured the large strips FASTER in TRAINING too (102.5 vs 104.0
    ms/step with the whole fwd+bwd head fused; the per-step-dispatch
    measurement that once blamed >16MB windows for a train slowdown
    under-counted device time through the remote tunnel — see
    bench.bench_train). small=True caps at 8MB to stay under the
    default 16MB scoped window — an escape hatch, reachable via
    SUNET_UP4_SMALL=1 (SUNET_UP4_SMALL=0 forces large strips)."""
    env = _os.environ.get("SUNET_UP4_SMALL")
    if env is not None:
        small = env == "1"
    cap = (8 if small else 18) * 1024 * 1024
    S = 1
    while H % (S * 2) == 0 and _up4_tmp_bytes(H // S, W, C) > cap:
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
    train: bool = False,
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
    S = _up4_strips(H, W, C, small=train)
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


# ---------------------------------------------------------------------------
# Trainable head: ONE custom-VJP for the whole x4 dual up-sample. Forward =
# fused_dual_upsample4; backward is a single kernel that recomputes the
# low-res intermediates in VMEM and accumulates fp32 weight grads across
# the sequential grid (same idiom as the Swin block backward). The XLA
# backward of this head pays the same shuffle/resize relayout copies as
# the XLA forward did — in BOTH the dP un-shuffle and the resize adjoint —
# so the fused backward removes them twice over.
#
# Resize adjoint (transpose of the half-pixel x4 stencil, per axis):
#   dX[i] = .625 D0[i] + .875 D1[i] + .875 D2[i] + .625 D3[i]
#         + .375 D0[i+1] + .125 D1[i+1] + .125 D2[i-1] + .375 D3[i-1]
#   edges: i=0 adds .375 D0[0] + .125 D1[0] (clamped top tap);
#          i=n-1 adds .125 D2[n-1] + .375 D3[n-1] (clamped bottom tap),
# where D_p[i] = d(out)[4i+p]. The H-axis needs one phase-row of halo on
# each side: delivered as two 4-row edge blocks of dout with clamped
# index maps, zeroed in-kernel at the image boundary.
# ---------------------------------------------------------------------------


def _stencil_adjoint_w(do: jnp.ndarray) -> jnp.ndarray:
    """W-axis adjoint: (R, 4W, C) fp32 -> (R, W, C) fp32."""
    R, W4, C = do.shape
    W = W4 // 4
    E = do.reshape(R, W, 4, C).transpose(2, 0, 1, 3)  # (4, R, W, C)
    core = (0.625 * E[0] + 0.875 * E[1] + 0.875 * E[2] + 0.625 * E[3])
    plus = 0.375 * E[0] + 0.125 * E[1]    # taken at [j+1], j=0 clamps
    minus = 0.125 * E[2] + 0.375 * E[3]   # taken at [j-1], j=W-1 clamps
    sl = jnp.concatenate([plus[:, 1:2] + plus[:, 0:1], plus[:, 2:],
                          jnp.zeros_like(plus[:, :1])], axis=1)
    sr = jnp.concatenate([jnp.zeros_like(minus[:, :1]), minus[:, :W - 2],
                          minus[:, W - 2:W - 1] + minus[:, W - 1:]], axis=1)
    return core + sl + sr


def _up4_bwd_kernel(xc_ref, dop_ref, doc_ref, don_ref, wexp_ref, wexpT_ref,
                    wb1_ref, wb1T_ref, bb1_ref, wpfT_ref, wbfT_ref,
                    alpha_ref, dx_ref, dwexp_ref, dwb1_ref, dbb1_ref,
                    dwpf_ref, dwbf_ref, dap_ref, dab_ref, *, S: int):
    _, Hs, W, C = xc_ref.shape
    f32 = jnp.float32
    dt = xc_ref.dtype
    T = Hs * W
    ap = alpha_ref[0, 0]
    ab = alpha_ref[0, 1]
    g = pl.program_id(1)
    first = jnp.logical_and(pl.program_id(0) == 0, g == 0)

    @pl.when(first)
    def _init():
        for r in (dwexp_ref, dwb1_ref, dbb1_ref, dwpf_ref, dwbf_ref,
                  dap_ref, dab_ref):
            r[...] = jnp.zeros_like(r)

    xc = xc_ref[0]
    t = xc.reshape(T, C)
    doc = doc_ref[0]                       # (4Hs, 4W, C)
    docf = doc.astype(f32).reshape(16 * T, C)
    doc_b = doc.astype(dt).reshape(16 * T, C)

    # ---- PixelShuffle branch backward
    # recompute z_s / P (same as forward)
    zs, ys = [], []
    for s in range(16):
        z = jnp.dot(t, wexp_ref[s], preferred_element_type=f32)
        zs.append(z)
        ys.append(_prelu(z, ap).astype(dt).reshape(1, 1, Hs, W, C))
    grid5 = jnp.concatenate(
        [jnp.concatenate(ys[i * 4:(i + 1) * 4], axis=1) for i in range(4)],
        axis=0)
    P = grid5.transpose(2, 0, 3, 1, 4).reshape(16 * T, C)
    dwpf_ref[...] += jnp.dot(P.T, doc_b, preferred_element_type=f32)
    dP = jnp.dot(doc_b, wpfT_ref[...], preferred_element_type=f32)
    # de-interleave: (4Hs, 4W, C) -> (4i, 4j, Hs, W, C)
    dP5 = (dP.reshape(4 * Hs, 4 * W, C).astype(dt)
           .reshape(Hs, 4, W, 4, C).transpose(1, 3, 0, 2, 4))
    dx = jnp.zeros((T, C), f32)
    dapc = jnp.zeros((1, C), f32)
    for s in range(16):
        da = dP5[s // 4, s % 4].reshape(T, C).astype(f32)
        z = zs[s]
        dz = jnp.where(z > 0, da, ap * da)
        dapc += jnp.sum(jnp.minimum(z, 0.0) * da, axis=0, keepdims=True)
        dzb16 = dz.astype(dt)
        dwexp_ref[s] += jnp.dot(t.T, dzb16, preferred_element_type=f32)
        dx += jnp.dot(dzb16, wexpT_ref[s], preferred_element_type=f32)
    dap_ref[...] += dapc

    # ---- bilinear branch backward
    # W-axis adjoint over the halo'd rows, then the H-axis adjoint.
    do_h = jnp.concatenate([dop_ref[0], doc, don_ref[0]],
                           axis=0).astype(f32)        # (4Hs+8, 4W, C)
    dyh = _stencil_adjoint_w(do_h)                     # (4Hs+8, W, C)
    D = dyh.reshape(Hs + 2, 4, W, C)                   # [i-(r0-1), phase]
    D0, D1, D2, D3 = D[:, 0], D[:, 1], D[:, 2], D[:, 3]
    coreH = (0.625 * D0[1:Hs + 1] + 0.875 * D1[1:Hs + 1]
             + 0.875 * D2[1:Hs + 1] + 0.625 * D3[1:Hs + 1])
    plusH = 0.375 * D0 + 0.125 * D1
    minusH = 0.125 * D2 + 0.375 * D3
    topv = jnp.where(g == 0, 0.0, 1.0)
    botv = jnp.where(g == S - 1, 0.0, 1.0)
    dxb = (coreH
           + jnp.concatenate([plusH[2:Hs + 1],
                              plusH[Hs + 1:Hs + 2] * botv], axis=0)
           + jnp.concatenate([minusH[0:1] * topv, minusH[1:Hs]], axis=0))
    edge_top = (1.0 - topv) * (0.375 * D0[1] + 0.125 * D1[1])
    edge_bot = (1.0 - botv) * (0.125 * D2[Hs] + 0.375 * D3[Hs])
    dxb = jnp.concatenate([dxb[0:1] + edge_top[None], dxb[1:]], axis=0)
    dxb = jnp.concatenate([dxb[:Hs - 1], dxb[Hs - 1:] + edge_bot[None]],
                          axis=0).reshape(T, C)
    # chain through the folded mix, PReLU, and the 1x1 conv
    zb = jnp.dot(t, wb1_ref[...], preferred_element_type=f32) + bb1_ref[0]
    abv = _prelu(zb, ab).astype(dt)
    dxb_b = dxb.astype(dt)
    dwbf_ref[...] += jnp.dot(abv.T, dxb_b, preferred_element_type=f32)
    dab_mat = jnp.dot(dxb_b, wbfT_ref[...], preferred_element_type=f32)
    dzb = jnp.where(zb > 0, dab_mat, ab * dab_mat)
    dab_ref[...] += jnp.sum(jnp.minimum(zb, 0.0) * dab_mat, axis=0,
                            keepdims=True)
    dzb_b = dzb.astype(dt)
    dwb1_ref[...] += jnp.dot(t.T, dzb_b, preferred_element_type=f32)
    dbb1_ref[...] += jnp.sum(dzb, axis=0, keepdims=True)
    dx += jnp.dot(dzb_b, wb1T_ref[...], preferred_element_type=f32)

    dx_ref[0] = dx.reshape(Hs, W, C).astype(dx_ref.dtype)


def _up4_bwd_impl(x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf, dout,
                  interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    S = _up4_strips(H, W, C)
    Hs = H // S
    wexp_s = w_exp.reshape(C, C, 16).transpose(2, 0, 1)
    wexpT_s = wexp_s.transpose(0, 2, 1)
    alphas = jnp.stack([alpha_p.reshape(()), alpha_b.reshape(())]
                       ).astype(jnp.float32).reshape(1, 2)
    cast = lambda a: a.astype(x.dtype)
    full = lambda *shape: pl.BlockSpec(shape, lambda bb, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    kernel = functools.partial(_up4_bwd_kernel, S=S)
    dob = dout.astype(x.dtype)
    # 4-row edge blocks of dout: previous strip's last phase-row and the
    # next strip's first (content zeroed in-kernel at the image edge)
    edge = lambda fn: pl.BlockSpec(
        (1, 4, 4 * W, C), lambda bb, g: (bb, fn(g), 0, 0),
        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(B, S),
        in_specs=[
            pl.BlockSpec((1, Hs, W, C), lambda bb, g: (bb, g, 0, 0),
                         memory_space=pltpu.VMEM),
            edge(lambda g: jnp.maximum(g * Hs - 1, 0)),
            pl.BlockSpec((1, 4 * Hs, 4 * W, C),
                         lambda bb, g: (bb, g, 0, 0),
                         memory_space=pltpu.VMEM),
            edge(lambda g: jnp.minimum((g + 1) * Hs, H - 1)),
            full(16, C, C), full(16, C, C),
            full(C, C), full(C, C), full(1, C),
            full(C, C), full(C, C),
            pl.BlockSpec((1, 2), lambda bb, g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hs, W, C), lambda bb, g: (bb, g, 0, 0),
                         memory_space=pltpu.VMEM),
            full(16, C, C), full(C, C), full(1, C),
            full(C, C), full(C, C), full(1, C), full(1, C),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((16, C, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(
            (Hs + 2 * 4 + 2 * 4 * Hs + 16 * Hs) * W * C * x.dtype.itemsize
            + 2 * 16 * C * C * (x.dtype.itemsize + 4),
            tmp_bytes=2 * _up4_tmp_bytes(Hs, W, C)),
        cost_estimate=pl.CostEstimate(
            flops=6 * B * H * W * C * C * 20,
            bytes_accessed=2 * 16 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, dob, dob, dob, cast(wexp_s), cast(wexpT_s), cast(w_b1),
      cast(w_b1.T), b_b1.astype(jnp.float32).reshape(1, C), cast(wpf.T),
      cast(wbf.T), alphas)
    dx, dwexp, dwb1, dbb1, dwpf, dwbf, dapc, dabc = outs
    # (16, C, C) per-subpixel grads -> (C, 16C) expand layout
    dw_exp = dwexp.transpose(1, 2, 0).reshape(C, 16 * C)
    return (dx, dw_exp.astype(w_exp.dtype),
            jnp.sum(dapc).reshape(alpha_p.shape).astype(alpha_p.dtype),
            dwb1.astype(w_b1.dtype),
            dbb1.reshape(b_b1.shape).astype(b_b1.dtype),
            jnp.sum(dabc).reshape(alpha_b.shape).astype(alpha_b.dtype),
            dwpf.astype(wpf.dtype), dwbf.astype(wbf.dtype))


@jax.custom_vjp
def dual_upsample4_trainable(x, w_exp, alpha_p, w_b1, b_b1, alpha_b,
                             wpf, wbf):
    """Differentiable fused x4 dual up-sample (Pallas fwd AND bwd).

    Same math as fused_dual_upsample4 (reference model/SUNet_detail.py:
    353-363 with the folded projections); the VJP runs the single-kernel
    backward above."""
    return fused_dual_upsample4(x, w_exp, alpha_p, w_b1, b_b1, alpha_b,
                                wpf, wbf)


def _up4_fwd(x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf):
    out = fused_dual_upsample4(x, w_exp, alpha_p, w_b1, b_b1, alpha_b,
                               wpf, wbf)
    return out, (x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf)


def _up4_bwd(res, dout):
    return _up4_bwd_impl(*res, dout)


dual_upsample4_trainable.defvjp(_up4_fwd, _up4_bwd)


# ---------------------------------------------------------------------------
# Inference head: dual up-sample x4 AND the 3x3 output conv in ONE kernel,
# entirely in phase space (reference model/SUNet_detail.py:736-746 up_x4
# followed by the :753/:680-684 output conv).
#
# The x4-upsampled (B, 4H, 4W, C) map is never materialized — not in HBM,
# not even interleaved in VMEM. The kernel keeps the head's 16 per-subpixel
# phase maps y[i][j](h, w) = head(x)[4h+i, 4w+j] at LOW resolution, and the
# output conv becomes one matmul: output phase (i,j) at base (h, w) taps
# high-res rows 4h+i+dy, cols 4w+j+dx (dy,dx in {-1,0,1}), i.e. phase
# ((i+dy)%4, (j+dx)%4) at base offset (floor((i+dy)/4), floor((j+dx)/4)).
# The union of (base-offset, phase) pairs per axis is 6 slots:
# (-1, 3), (0, 0..3), (+1, 0) — so a lane-concat of 36 shifted phase maps
# (Hs*W, 36C) against a block-sparse folded weight (36C, 16*out) computes
# every output phase in one MXU pass. Conv zero-padding at image edges =
# zeroing the out-of-image slot rows/cols (distinct from the bilinear
# branch's CLAMPED resize taps, which stay inside the phase maps).
#
# Measured motivation (v5e @256^2 batch 32, xprof): the split head spent
# 3.44 ms in the up4 kernel (403 MB HBM write of the upsampled bf16 map)
# plus 1.7 ms in the XLA output-conv fusion reading it back.
# ---------------------------------------------------------------------------

# per-axis (base-offset, phase) slot order for the conv matmul lane-concat
_USLOTS = ((-1, 3), (0, 0), (0, 1), (0, 2), (0, 3), (1, 0))


def fold_output_conv4(wconv: jnp.ndarray) -> jnp.ndarray:
    """(3, 3, C, out) HWIO 3x3 conv weights -> (36*C, 16*out) phase-space
    fold for the x4 head (block-sparse: each output-phase column block
    holds its 9 taps, one per (slot_h, slot_w) row block)."""
    _, _, C, out = wconv.shape
    idx = {u: n for n, u in enumerate(_USLOTS)}
    w = jnp.zeros((36 * C, 16 * out), jnp.float32)
    for i in range(4):
        for j in range(4):
            col = (i * 4 + j) * out
            for dy in (-1, 0, 1):
                hi = i + dy
                uh = idx[(-1 if hi < 0 else (1 if hi > 3 else 0), hi % 4)]
                for dx in (-1, 0, 1):
                    wi = j + dx
                    uw = idx[(-1 if wi < 0 else (1 if wi > 3 else 0),
                              wi % 4)]
                    slot = uh * 6 + uw
                    w = w.at[slot * C:(slot + 1) * C, col:col + out].set(
                        wconv[dy + 1, dx + 1].astype(jnp.float32))
    return w


def _up4_conv_kernel(xp_ref, xc_ref, xn_ref, wexp_ref, wb1_ref, bb1_ref,
                     wpf_ref, wbf_ref, wfold_ref, alpha_ref, o_ref, *,
                     S: int, out_ch: int):
    _, Hs, W, C = xc_ref.shape
    f32 = jnp.float32
    dt = xc_ref.dtype
    xc = xc_ref[0]
    ap = alpha_ref[0, 0]
    ab = alpha_ref[0, 1]
    g = pl.program_id(1)
    top = g == 0
    bot = g == S - 1

    # extended input rows: x1 = rows -1..Hs, x2 = rows -2..Hs+1 (2-row halo
    # from the neighbor strips; at the image edge the halo rows are the
    # CLAMPED edge row — the bilinear resize's tap semantics. Rows beyond
    # the image only ever feed phase rows that the conv zero-pad masks out
    # below, so their clamped content is never read into the output).
    p1 = jnp.where(top, xc[0:1], xp_ref[0, Hs - 1:Hs])
    p2 = jnp.where(top, xc[0:1], xp_ref[0, Hs - 2:Hs - 1])
    n1 = jnp.where(bot, xc[Hs - 1:Hs], xn_ref[0, 0:1])
    n2 = jnp.where(bot, xc[Hs - 1:Hs], xn_ref[0, 1:2])
    x1 = jnp.concatenate([p1, xc, n1], axis=0)           # (Hs+2, W, C)
    x2 = jnp.concatenate([p2, x1, n2], axis=0)           # (Hs+4, W, C)

    # ---- bilinear branch at low res over the 2-halo rows
    zb = jnp.dot(x2.reshape((Hs + 4) * W, C), wb1_ref[...],
                 preferred_element_type=f32) + bb1_ref[0]
    xb = jnp.dot(_prelu(zb, ab).astype(dt), wbf_ref[...],
                 preferred_element_type=f32).reshape(Hs + 4, W, C)
    # H-phase maps for base rows -1..Hs (phases 0,1 tap rows h-1,h;
    # phases 2,3 tap h,h+1 — xb row h lives at index h+2)
    rows = lambda o: xb[o:o + Hs + 2]
    htaps = ((rows(0), rows(1)), (rows(0), rows(1)),
             (rows(1), rows(2)), (rows(1), rows(2)))

    # ---- per-phase head maps y[i*4+j] = pixel-shuffle + bilinear, bf16
    t1 = x1.reshape((Hs + 2) * W, C)
    y = []
    for i in range(4):
        (a, b), (lo, hi) = _P4[i], htaps[i]
        yh = a * lo + b * hi                              # (Hs+2, W, C) f32
        t0 = jnp.concatenate([yh[:, 0:1], yh[:, :W - 1]], axis=1)
        t2 = jnp.concatenate([yh[:, 1:], yh[:, W - 1:]], axis=1)
        wtaps = ((t0, yh), (t0, yh), (yh, t2), (yh, t2))
        for j in range(4):
            z = jnp.dot(t1, wexp_ref[i * 4 + j],
                        preferred_element_type=f32)
            ps = jnp.dot(_prelu(z, ap).astype(dt), wpf_ref[...],
                         preferred_element_type=f32)
            (aw, bw), (wl, wh) = _P4[j], wtaps[j]
            yij = ps.reshape(Hs + 2, W, C) + (aw * wl + bw * wh)
            y.append(yij.astype(dt))

    # ---- conv as one matmul over 36 shifted phase slots
    topv = jnp.where(top, 0.0, 1.0).astype(dt)
    botv = jnp.where(bot, 0.0, 1.0).astype(dt)
    zcol = jnp.zeros((Hs, 1, C), dt)
    slots = []
    for dh, pi in _USLOTS:
        for dw, pj in _USLOTS:
            t = y[pi * 4 + pj][1 + dh:1 + dh + Hs]       # (Hs, W, C)
            if dw == -1:                                  # col w-1, zero-pad
                t = jnp.concatenate([zcol, t[:, :W - 1]], axis=1)
            elif dw == 1:                                 # col w+1, zero-pad
                t = jnp.concatenate([t[:, 1:], zcol], axis=1)
            if dh == -1:                                  # row r-1 @ image top
                t = jnp.concatenate([t[0:1] * topv, t[1:]], axis=0)
            elif dh == 1:                                 # row r+1 @ image bot
                t = jnp.concatenate([t[:Hs - 1], t[Hs - 1:] * botv], axis=0)
            slots.append(t)
    A = jnp.concatenate(slots, axis=-1).reshape(Hs * W, 36 * C)
    O = jnp.dot(A, wfold_ref[...], preferred_element_type=f32)
    o_ref[0] = O.reshape(Hs, W, 16 * out_ch).astype(o_ref.dtype)


def _up4c_tmp_bytes(Hs: int, W: int, C: int) -> int:
    """Peak temporaries: 16 bf16 phase maps + the (Hs*W, 36C) bf16 slot
    concat + fp32 matmul output + the xb/z chains."""
    pc = _pad128(C)
    return (16 * (Hs + 2) * W * pc * 2     # y phases bf16
            + Hs * W * 36 * pc * 2         # A
            + Hs * W * 128 * 4             # O fp32 (out lanes padded)
            + (Hs + 4) * W * pc * 10)      # xb fp32 + z transient


def _up4c_strips(H: int, W: int, C: int) -> int:
    cap = int(_os.environ.get("SUNET_UP4C_CAP_MB", "30")) * 1024 * 1024
    S = 1
    while H % (S * 2) == 0 and _up4c_tmp_bytes(H // S, W, C) > cap:
        S *= 2
    return S


def fused_dual_upsample4_conv_phase(
    x: jnp.ndarray,
    w_exp: jnp.ndarray,
    alpha_p: jnp.ndarray,
    w_b1: jnp.ndarray,
    b_b1: jnp.ndarray,
    alpha_b: jnp.ndarray,
    wpf: jnp.ndarray,
    wbf: jnp.ndarray,
    wconv: jnp.ndarray,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x4 dual up-sample + 3x3 output conv (no bias) in PHASE SPACE:
    returns (B, H, W, 16*out) where channel (i*4+j)*out..+out at base
    (h, w) is the pixel-space output at (4h+i, 4w+j). One kernel; the
    4x-upsampled map never exists. x: (B, H, W, C); wconv: (3, 3, C, out)
    with 16*out <= 128 (the matmul's output lanes)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    out_ch = wconv.shape[-1]
    assert 16 * out_ch <= 128, f"out_chans {out_ch} too wide for the fold"
    S = _up4c_strips(H, W, C)
    Hs = H // S
    wexp_s = w_exp.reshape(C, C, 16).transpose(2, 0, 1)
    wfold = fold_output_conv4(wconv)
    alphas = jnp.stack([alpha_p.reshape(()), alpha_b.reshape(())]
                       ).astype(jnp.float32).reshape(1, 2)
    full = lambda *shape: pl.BlockSpec(shape, lambda bb, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    strip = lambda fn: pl.BlockSpec((1, Hs, W, C),
                                    lambda bb, g: (bb, fn(g), 0, 0),
                                    memory_space=pltpu.VMEM)
    kernel = functools.partial(_up4_conv_kernel, S=S, out_ch=out_ch)
    o = pl.pallas_call(
        kernel,
        grid=(B, S),
        in_specs=[
            strip(lambda g: jnp.maximum(g - 1, 0)),
            strip(lambda g: g),
            strip(lambda g: jnp.minimum(g + 1, S - 1)),
            full(16, C, C),
            full(C, C), full(1, C),
            full(C, C), full(C, C),
            full(36 * C, 16 * out_ch),
            pl.BlockSpec((1, 2), lambda bb, g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, Hs, W, 16 * out_ch),
                               lambda bb, g: (bb, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, H, W, 16 * out_ch), x.dtype),
        interpret=interpret,
        compiler_params=_compiler_params(
            (3 + 1) * Hs * W * C * x.dtype.itemsize
            + _tree_bytes(wexp_s, w_b1, wpf, wbf) + 36 * C * 16 * out_ch * 2,
            tmp_bytes=_up4c_tmp_bytes(Hs, W, C)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * C * 36
            + 2 * B * H * W * 36 * C * 16 * out_ch,
            bytes_accessed=3 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, wexp_s.astype(x.dtype), w_b1.astype(x.dtype),
      b_b1.astype(jnp.float32).reshape(1, C), wpf.astype(x.dtype),
      wbf.astype(x.dtype), wfold.astype(x.dtype), alphas)
    return o


def phase_to_pixel(o: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W, 16*out) phase tensor -> (B, 4H, 4W, out) pixels; a small
    XLA depth-to-space (the tensor is 16*C/out times smaller than the
    upsampled feature map the split head wrote)."""
    B, H, W, O = o.shape
    out_ch = O // 16
    o = o.reshape(B, H, W, 4, 4, out_ch).transpose(0, 1, 3, 2, 4, 5)
    return o.reshape(B, 4 * H, 4 * W, out_ch)


def fused_dual_upsample4_conv(
    x: jnp.ndarray,
    w_exp: jnp.ndarray,
    alpha_p: jnp.ndarray,
    w_b1: jnp.ndarray,
    b_b1: jnp.ndarray,
    alpha_b: jnp.ndarray,
    wpf: jnp.ndarray,
    wbf: jnp.ndarray,
    wconv: jnp.ndarray,
    *,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """x4 dual up-sample + 3x3 output conv (no bias), one kernel + one
    cheap XLA depth-to-space. Returns (B, 4H, 4W, out) in x.dtype.
    Inference path; training routes dual_upsample4_conv_trainable."""
    return phase_to_pixel(fused_dual_upsample4_conv_phase(
        x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf, wconv,
        interpret=interpret))


# ---------------------------------------------------------------------------
# Trainable head+conv: ONE custom-VJP for the phase-space x4 head AND the
# 3x3 output conv. Forward = fused_dual_upsample4_conv_phase; backward is a
# single kernel that recomputes the 16 phase maps in VMEM, pulls the conv
# adjoint back through the 36 slot shifts, runs the per-phase stencil
# adjoints, and accumulates fp32 weight grads across the sequential grid.
#
# Why: the split training head materialized the (B, 4H, 4W, C) map in HBM
# (201 MB bf16 at batch 16) and round-tripped it through the XLA output
# conv in BOTH directions — up4 fwd 1.72 ms + conv fwd 0.99 + relayout
# copy 0.82 + conv dx 0.41 + conv dW 0.69 + up4 bwd 1.54 = 6.2 ms of the
# 84.6 ms b16 train step (xprof, v5e). In phase space the biggest live
# tensor is (B, H, W, 16*out).
#
# Backward halo: output base row o's conv+stencil taps reach x rows
# o-2..o+2, so dx needs TWO dout rows of halo per side — delivered as
# 2-row edge blocks with clamped index maps, zeroed at the image edge
# in-kernel. Adjoint index map (ext phase row my = m+1, m in -1..Hs):
# dy_s[my] += unshiftW(dOe[my - dh + 1] @ wslotT) per contributing slot,
# with the forward's conv zero-pad masks re-applied (top strip: output
# row 0's dh=-1 slot; bottom strip: output row Hs-1's dh=+1 slot).
# Weight grads accumulate over OWN rows only (my 1..Hs) — ext rows are
# recomputed by the neighboring strip, which owns them.
# ---------------------------------------------------------------------------


def _up4c_bwd_kernel(xp_ref, xc_ref, xn_ref, dop_ref, doc_ref, don_ref,
                     wexp_ref, wexpT_ref, wb1_ref, wb1T_ref, bb1_ref,
                     wpf_ref, wpfT_ref, wbf_ref, wbfT_ref, wslotT_ref,
                     alpha_ref, dx_ref, dwexp_ref, dwb1_ref, dbb1_ref,
                     dwpf_ref, dwbf_ref, dap_ref, dab_ref, dwfold_ref, *,
                     S: int, out_ch: int):
    _, Hs, W, C = xc_ref.shape
    O = 16 * out_ch
    f32 = jnp.float32
    dt = xc_ref.dtype
    g = pl.program_id(1)
    top = g == 0
    bot = g == S - 1
    topv = jnp.where(top, 0.0, 1.0)
    botv = jnp.where(bot, 0.0, 1.0)
    tv_dt = topv.astype(dt)
    bv_dt = botv.astype(dt)
    first = jnp.logical_and(pl.program_id(0) == 0, g == 0)

    @pl.when(first)
    def _init():
        for r in (dwexp_ref, dwb1_ref, dbb1_ref, dwpf_ref, dwbf_ref,
                  dap_ref, dab_ref, dwfold_ref):
            r[...] = jnp.zeros_like(r)

    xc = xc_ref[0]
    ap = alpha_ref[0, 0]
    ab = alpha_ref[0, 1]

    # ---- forward recompute (identical to _up4_conv_kernel) ----
    p1 = jnp.where(top, xc[0:1], xp_ref[0, Hs - 1:Hs])
    p2 = jnp.where(top, xc[0:1], xp_ref[0, Hs - 2:Hs - 1])
    n1 = jnp.where(bot, xc[Hs - 1:Hs], xn_ref[0, 0:1])
    n2 = jnp.where(bot, xc[Hs - 1:Hs], xn_ref[0, 1:2])
    x1 = jnp.concatenate([p1, xc, n1], axis=0)           # (Hs+2, W, C)
    x2 = jnp.concatenate([p2, x1, n2], axis=0)           # (Hs+4, W, C)
    zb2 = jnp.dot(x2.reshape((Hs + 4) * W, C), wb1_ref[...],
                  preferred_element_type=f32) + bb1_ref[0]
    xb = jnp.dot(_prelu(zb2, ab).astype(dt), wbf_ref[...],
                 preferred_element_type=f32).reshape(Hs + 4, W, C)
    rows = lambda o: xb[o:o + Hs + 2]
    htaps = ((rows(0), rows(1)), (rows(0), rows(1)),
             (rows(1), rows(2)), (rows(1), rows(2)))
    t1 = x1.reshape((Hs + 2) * W, C)
    y = []
    for i in range(4):
        (a, b), (lo, hi) = _P4[i], htaps[i]
        yh = a * lo + b * hi
        t0 = jnp.concatenate([yh[:, 0:1], yh[:, :W - 1]], axis=1)
        t2 = jnp.concatenate([yh[:, 1:], yh[:, W - 1:]], axis=1)
        wtaps = ((t0, yh), (t0, yh), (yh, t2), (yh, t2))
        for j in range(4):
            z = jnp.dot(t1, wexp_ref[i * 4 + j], preferred_element_type=f32)
            ps = jnp.dot(_prelu(z, ap).astype(dt), wpf_ref[...],
                         preferred_element_type=f32)
            (aw, bw), (wl, wh) = _P4[j], wtaps[j]
            y.append((ps.reshape(Hs + 2, W, C)
                      + (aw * wl + bw * wh)).astype(dt))

    # ---- dwfold: per-slot t^T @ dout over own output rows (forward
    # slot construction, including the conv zero-pad edge masks) ----
    doc_b = doc_ref[0].astype(dt)
    docm = doc_b.reshape(Hs * W, O)
    zcol = jnp.zeros((Hs, 1, C), dt)
    n = 0
    for dh, pi in _USLOTS:
        for dw, pj in _USLOTS:
            t = y[pi * 4 + pj][1 + dh:1 + dh + Hs]
            if dw == -1:
                t = jnp.concatenate([zcol, t[:, :W - 1]], axis=1)
            elif dw == 1:
                t = jnp.concatenate([t[:, 1:], zcol], axis=1)
            if dh == -1:
                t = jnp.concatenate([t[0:1] * tv_dt, t[1:]], axis=0)
            elif dh == 1:
                t = jnp.concatenate([t[:Hs - 1], t[Hs - 1:] * bv_dt], axis=0)
            dwfold_ref[n] += jnp.dot(t.reshape(Hs * W, C).T, docm,
                                     preferred_element_type=f32)
            n += 1

    # ---- dout with 2-row halo (zeroed at image edges) ----
    dope = dop_ref[0].astype(dt) * tv_dt
    done = don_ref[0].astype(dt) * bv_dt
    dOe = jnp.concatenate([dope, doc_b, done], axis=0)   # (Hs+4, W, O)

    dx = jnp.zeros((Hs * W, C), f32)
    dyhb = [jnp.zeros((Hs + 2, W, C), f32) for _ in range(4)]
    dapc = jnp.zeros((1, C), f32)
    t_own = xc.reshape(Hs * W, C)
    zcol_f = jnp.zeros((Hs + 2, 1, C), f32)
    for i in range(4):
        for j in range(4):
            s = i * 4 + j
            dy = jnp.zeros((Hs + 2, W, C), f32)
            for uh, (dh, pi) in enumerate(_USLOTS):
                if pi != i:
                    continue
                for uw, (dw, pj) in enumerate(_USLOTS):
                    if pj != j:
                        continue
                    sl = dOe[1 - dh:Hs + 3 - dh]         # (Hs+2, W, O)
                    if dh == -1:                          # fwd masked o=0@top
                        sl = jnp.concatenate([sl[0:1] * tv_dt, sl[1:]],
                                             axis=0)
                    elif dh == 1:                         # o=Hs-1@bot
                        sl = jnp.concatenate([sl[:Hs + 1],
                                              sl[Hs + 1:] * bv_dt], axis=0)
                    gs = jnp.dot(sl.reshape((Hs + 2) * W, O),
                                 wslotT_ref[uh * 6 + uw],
                                 preferred_element_type=f32
                                 ).reshape(Hs + 2, W, C)
                    if dw == -1:
                        gs = jnp.concatenate([gs[:, 1:], zcol_f], axis=1)
                    elif dw == 1:
                        gs = jnp.concatenate([zcol_f, gs[:, :W - 1]], axis=1)
                    dy = dy + gs
            # -- PixelShuffle path (own rows my = 1..Hs) --
            dy_own_b = dy[1:Hs + 1].reshape(Hs * W, C).astype(dt)
            z_own = jnp.dot(t_own, wexp_ref[s], preferred_element_type=f32)
            a_own = _prelu(z_own, ap).astype(dt)
            dwpf_ref[...] += jnp.dot(a_own.T, dy_own_b,
                                     preferred_element_type=f32)
            dpre = jnp.dot(dy_own_b, wpfT_ref[...],
                           preferred_element_type=f32)
            dz = jnp.where(z_own > 0, dpre, ap * dpre)
            dapc += jnp.sum(jnp.minimum(z_own, 0.0) * dpre, axis=0,
                            keepdims=True)
            dzb16 = dz.astype(dt)
            dwexp_ref[s] += jnp.dot(t_own.T, dzb16,
                                    preferred_element_type=f32)
            dx += jnp.dot(dzb16, wexpT_ref[s], preferred_element_type=f32)
            # -- W-stencil adjoint into the per-i accumulators --
            aw, bw = _P4[j]
            if j < 2:    # y_ij = aw*t0 + bw*yh, t0 left-clamped shift
                d0 = aw * dy
                dyhb[i] = dyhb[i] + bw * dy + jnp.concatenate(
                    [d0[:, 0:1] + d0[:, 1:2], d0[:, 2:],
                     jnp.zeros_like(d0[:, :1])], axis=1)
            else:        # y_ij = aw*yh + bw*t2, t2 right-clamped shift
                d2 = bw * dy
                dyhb[i] = dyhb[i] + aw * dy + jnp.concatenate(
                    [jnp.zeros_like(d2[:, :1]), d2[:, :W - 2],
                     d2[:, W - 2:W - 1] + d2[:, W - 1:]], axis=1)
    dap_ref[...] += dapc

    # ---- H-axis stencil adjoint (same structure/edge rules as
    # _up4_bwd_kernel; dyhb rows my = m+1, m in -1..Hs) ----
    D0, D1, D2, D3 = dyhb
    core = (0.625 * D0[1:Hs + 1] + 0.875 * D1[1:Hs + 1]
            + 0.875 * D2[1:Hs + 1] + 0.625 * D3[1:Hs + 1])
    plusH = 0.375 * D0 + 0.125 * D1      # a-taps of phases 0,1 at [k+2]
    minusH = 0.125 * D2 + 0.375 * D3     # b-taps of phases 2,3 at [k]
    dxb = (core
           + jnp.concatenate([plusH[2:Hs + 1],
                              plusH[Hs + 1:Hs + 2] * botv], axis=0)
           + jnp.concatenate([minusH[0:1] * topv, minusH[1:Hs]], axis=0))
    edge_top = (1.0 - topv) * (0.375 * D0[1] + 0.125 * D1[1])
    edge_bot = (1.0 - botv) * (0.125 * D2[Hs] + 0.375 * D3[Hs])
    dxb = jnp.concatenate([dxb[0:1] + edge_top[None], dxb[1:]], axis=0)
    dxb = jnp.concatenate([dxb[:Hs - 1], dxb[Hs - 1:] + edge_bot[None]],
                          axis=0).reshape(Hs * W, C)

    # ---- bilinear 1x1 chain (own rows; zb row k lives at x2 index k+2) --
    zb_own = zb2.reshape(Hs + 4, W, C)[2:Hs + 2].reshape(Hs * W, C)
    abv = _prelu(zb_own, ab).astype(dt)
    dxb_b = dxb.astype(dt)
    dwbf_ref[...] += jnp.dot(abv.T, dxb_b, preferred_element_type=f32)
    dab_mat = jnp.dot(dxb_b, wbfT_ref[...], preferred_element_type=f32)
    dzb = jnp.where(zb_own > 0, dab_mat, ab * dab_mat)
    dab_ref[...] += jnp.sum(jnp.minimum(zb_own, 0.0) * dab_mat, axis=0,
                            keepdims=True)
    dzb_b = dzb.astype(dt)
    dwb1_ref[...] += jnp.dot(t_own.T, dzb_b, preferred_element_type=f32)
    dbb1_ref[...] += jnp.sum(dzb, axis=0, keepdims=True)
    dx += jnp.dot(dzb_b, wb1T_ref[...], preferred_element_type=f32)

    dx_ref[0] = dx.reshape(Hs, W, C).astype(dx_ref.dtype)


def _up4c_bwd_tmp_bytes(Hs: int, W: int, C: int, out_ch: int) -> int:
    """Peak temporaries: fwd recompute (16 bf16 phase maps + xb/zb2) +
    dOe + 4 fp32 dyhb accumulators + the per-phase dy/slot transients."""
    pc = _pad128(C)
    pO = _pad128(16 * out_ch)
    return (16 * (Hs + 2) * W * pc * 2       # y phases bf16
            + (Hs + 4) * W * pc * 12         # x2/zb2/xb chains
            + (Hs + 4) * W * pO * 4          # dOe + doc copies
            + 4 * (Hs + 2) * W * pc * 4      # dyhb fp32
            + (Hs + 2) * W * pc * 16         # dy + slot matmul transients
            + Hs * W * pc * 12)              # dx + own-row chains


def _up4c_bwd_strips(H: int, W: int, C: int, out_ch: int) -> int:
    cap = int(_os.environ.get("SUNET_UP4C_BWD_CAP_MB", "30")) * 1024 * 1024
    S = 1
    while (H % (S * 2) == 0 and (H // S) % 2 == 0 and H // S > 2
           and _up4c_bwd_tmp_bytes(H // S, W, C, out_ch) > cap):
        S *= 2
    return S


def unfold_output_conv4_grad(dwfold: jnp.ndarray, C: int,
                             out_ch: int) -> jnp.ndarray:
    """Adjoint of fold_output_conv4: (36, C, 16*out) per-slot grads ->
    (3, 3, C, out) conv weight grads (sum over the 16 output-phase
    placements of each tap)."""
    idx = {u: n for n, u in enumerate(_USLOTS)}
    dw = jnp.zeros((3, 3, C, out_ch), dwfold.dtype)
    for i in range(4):
        for j in range(4):
            col = (i * 4 + j) * out_ch
            for dy in (-1, 0, 1):
                hi = i + dy
                uh = idx[(-1 if hi < 0 else (1 if hi > 3 else 0), hi % 4)]
                for dx_ in (-1, 0, 1):
                    wi = j + dx_
                    uw = idx[(-1 if wi < 0 else (1 if wi > 3 else 0),
                              wi % 4)]
                    dw = dw.at[dy + 1, dx_ + 1].add(
                        dwfold[uh * 6 + uw, :, col:col + out_ch])
    return dw


def _up4c_bwd_impl(x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf,
                   wconv, dout, interpret=None):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, W, C = x.shape
    out_ch = wconv.shape[-1]
    O = 16 * out_ch
    S = _up4c_bwd_strips(H, W, C, out_ch)
    Hs = H // S
    h2 = Hs // 2
    wexp_s = w_exp.reshape(C, C, 16).transpose(2, 0, 1)
    wexpT_s = wexp_s.transpose(0, 2, 1)
    wfold = fold_output_conv4(wconv)
    wslotT = wfold.reshape(36, C, O).transpose(0, 2, 1)   # (36, O, C)
    alphas = jnp.stack([alpha_p.reshape(()), alpha_b.reshape(())]
                       ).astype(jnp.float32).reshape(1, 2)
    cast = lambda a: a.astype(x.dtype)
    full = lambda *shape: pl.BlockSpec(shape, lambda bb, g: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    strip = lambda fn: pl.BlockSpec((1, Hs, W, C),
                                    lambda bb, g: (bb, fn(g), 0, 0),
                                    memory_space=pltpu.VMEM)
    # 2-row edge blocks of dout: previous strip's last two rows / next
    # strip's first two (clamped at the image edge, zeroed in-kernel)
    edge = lambda fn: pl.BlockSpec((1, 2, W, O),
                                   lambda bb, g: (bb, fn(g), 0, 0),
                                   memory_space=pltpu.VMEM)
    dob = dout.astype(x.dtype)
    kernel = functools.partial(_up4c_bwd_kernel, S=S, out_ch=out_ch)
    outs = pl.pallas_call(
        kernel,
        grid=(B, S),
        in_specs=[
            strip(lambda g: jnp.maximum(g - 1, 0)),
            strip(lambda g: g),
            strip(lambda g: jnp.minimum(g + 1, S - 1)),
            edge(lambda g: jnp.maximum(g * h2 - 1, 0)),
            pl.BlockSpec((1, Hs, W, O), lambda bb, g: (bb, g, 0, 0),
                         memory_space=pltpu.VMEM),
            edge(lambda g: jnp.minimum((g + 1) * h2, H // 2 - 1)),
            full(16, C, C), full(16, C, C),
            full(C, C), full(C, C), full(1, C),
            full(C, C), full(C, C), full(C, C), full(C, C),
            full(36, O, C),
            pl.BlockSpec((1, 2), lambda bb, g: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, Hs, W, C), lambda bb, g: (bb, g, 0, 0),
                         memory_space=pltpu.VMEM),
            full(16, C, C), full(C, C), full(1, C),
            full(C, C), full(C, C), full(1, C), full(1, C),
            full(36, C, O),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(x.shape, x.dtype),
            jax.ShapeDtypeStruct((16, C, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((C, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((1, C), jnp.float32),
            jax.ShapeDtypeStruct((36, C, O), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(
            (3 * Hs + Hs + 4) * W * max(C, O) * x.dtype.itemsize
            + _tree_bytes(wexp_s, wexpT_s, w_b1, wpf, wbf) * x.dtype.itemsize
            // 4 + 36 * O * C * x.dtype.itemsize,
            tmp_bytes=_up4c_bwd_tmp_bytes(Hs, W, C, out_ch)),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * H * W * C * (C * 60 + O * 72),
            bytes_accessed=5 * B * H * W * C * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x, x, x, dob, dob, dob, cast(wexp_s), cast(wexpT_s), cast(w_b1),
      cast(w_b1.T), b_b1.astype(jnp.float32).reshape(1, C), cast(wpf),
      cast(wpf.T), cast(wbf), cast(wbf.T), cast(wslotT), alphas)
    (dx, dwexp, dwb1, dbb1, dwpf, dwbf, dapc, dabc, dwfold) = outs
    dw_exp = dwexp.transpose(1, 2, 0).reshape(C, 16 * C)
    dwconv = unfold_output_conv4_grad(dwfold, C, out_ch)
    return (dx, dw_exp.astype(w_exp.dtype),
            jnp.sum(dapc).reshape(alpha_p.shape).astype(alpha_p.dtype),
            dwb1.astype(w_b1.dtype),
            dbb1.reshape(b_b1.shape).astype(b_b1.dtype),
            jnp.sum(dabc).reshape(alpha_b.shape).astype(alpha_b.dtype),
            dwpf.astype(wpf.dtype), dwbf.astype(wbf.dtype),
            dwconv.astype(wconv.dtype))


@jax.custom_vjp
def dual_upsample4_conv_trainable(x, w_exp, alpha_p, w_b1, b_b1, alpha_b,
                                  wpf, wbf, wconv):
    """Differentiable phase-space x4 head + 3x3 output conv (Pallas fwd
    AND bwd). Returns (B, H, W, 16*out); phase_to_pixel() gives pixels.
    Same math as fused_dual_upsample4_conv (reference
    model/SUNet_detail.py:353-363 head + :753 output conv)."""
    return fused_dual_upsample4_conv_phase(x, w_exp, alpha_p, w_b1, b_b1,
                                           alpha_b, wpf, wbf, wconv)


def _up4c_fwd(x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf, wconv):
    out = fused_dual_upsample4_conv_phase(x, w_exp, alpha_p, w_b1, b_b1,
                                          alpha_b, wpf, wbf, wconv)
    return out, (x, w_exp, alpha_p, w_b1, b_b1, alpha_b, wpf, wbf, wconv)


def _up4c_bwd(res, dout):
    return _up4c_bwd_impl(*res, dout)


dual_upsample4_conv_trainable.defvjp(_up4c_fwd, _up4c_bwd)
