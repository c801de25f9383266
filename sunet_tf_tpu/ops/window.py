"""Windowing primitives for shifted-window attention, NHWC-native.

Behavioral contracts (established by the reference, re-derived here):

- ``window_partition`` / ``window_reverse`` are exact inverses and tile a
  (B, H, W, C) feature map into (B * nW, ws*ws, C) token windows in
  row-major window order (reference model/SUNet_detail.py:27-56 semantics).
- ``relative_position_index`` reproduces the Swin pairwise index buffer
  used to gather the learnable relative-position-bias table (reference
  model/SUNet_detail.py:86-97).
- ``shift_attn_mask`` reproduces the 9-region SW-MSA mask construction
  with the 0 / -100.0 additive constants (reference
  model/SUNet_detail.py:202-221). Masks are built in numpy at trace time
  (shapes are static under jit) and cached.
- ``effective_window`` reproduces the auto-degrade rule: when
  ``min(resolution) <= window_size`` the window shrinks to the resolution
  and the shift is disabled (reference model/SUNet_detail.py:186-190) —
  e.g. the 8x8 bottleneck with WIN_SIZE=8 runs full-window unshifted.

Everything here is shape-static and jit-friendly; no data-dependent
control flow.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

MASK_NEG = -100.0


def effective_window(resolution: tuple, window_size: int, shift_size: int) -> tuple:
    """Auto-degrade (window, shift) when the window exceeds the resolution."""
    if min(resolution) <= window_size:
        return min(resolution), 0
    return window_size, shift_size


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B * nH * nW, ws*ws, C), windows in row-major order."""
    B, H, W, C = x.shape
    x = x.reshape(B, H // ws, ws, W // ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws * ws, C)


def window_reverse(windows: jnp.ndarray, ws: int, H: int, W: int) -> jnp.ndarray:
    """Inverse of :func:`window_partition`: (B*nW, ws*ws, C) -> (B, H, W, C)."""
    nW = (H // ws) * (W // ws)
    B = windows.shape[0] // nW
    C = windows.shape[-1]
    x = windows.reshape(B, H // ws, W // ws, ws, ws, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, H, W, C)


@functools.lru_cache(maxsize=None)
def relative_position_index(wh: int, ww: int) -> np.ndarray:
    """Pairwise relative-position index, shape (wh*ww, wh*ww), int32.

    Values index a ((2*wh-1)*(2*ww-1),) bias table: for tokens i, j inside
    the window, index = (dy + wh - 1) * (2*ww - 1) + (dx + ww - 1) where
    (dy, dx) = coords[i] - coords[j].
    """
    coords = np.stack(np.meshgrid(np.arange(wh), np.arange(ww), indexing="ij"))
    flat = coords.reshape(2, -1)  # (2, N)
    rel = flat[:, :, None] - flat[:, None, :]  # (2, N, N)
    rel = rel.transpose(1, 2, 0).astype(np.int64)  # (N, N, 2)
    rel[:, :, 0] += wh - 1
    rel[:, :, 1] += ww - 1
    rel[:, :, 0] *= 2 * ww - 1
    return rel.sum(-1).astype(np.int32)


@functools.lru_cache(maxsize=None)
def shift_attn_mask(H: int, W: int, ws: int, shift: int) -> np.ndarray:
    """Additive SW-MSA mask, shape (nW, ws*ws, ws*ws), float32 {0, -100}.

    Region-id image split by the three h/w slices (outside the last window,
    the rolled-in band, the shift remainder); tokens in different regions of
    the same (rolled) window get -100 added to their attention logit.
    Returns an all-zeros mask when shift == 0.
    """
    n = ws * ws
    nW = (H // ws) * (W // ws)
    if shift == 0:
        return np.zeros((nW, n, n), dtype=np.float32)
    img = np.zeros((1, H, W, 1), dtype=np.float32)
    slices = (slice(0, -ws), slice(-ws, -shift), slice(-shift, None))
    cnt = 0
    for hs in slices:
        for wsl in slices:
            img[:, hs, wsl, :] = cnt
            cnt += 1
    # numpy window partition (same layout as window_partition above)
    m = img.reshape(1, H // ws, ws, W // ws, ws, 1).transpose(0, 1, 3, 2, 4, 5)
    m = m.reshape(-1, n)  # (nW, n)
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, np.float32(MASK_NEG), np.float32(0.0))


def roll2d(x: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Cyclic shift on the two spatial axes of an NHWC tensor."""
    if shift == 0:
        return x
    return jnp.roll(x, shift=(shift, shift), axis=(1, 2))
