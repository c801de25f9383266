"""On-device morphology: boundary-ring loss weights.

The reference computes per-batch boundary weights on the host with
skimage.binary_dilation, forcing a device->host sync every training batch
(reference train.py:200-249, the dominant CPU bottleneck per SURVEY §3.1).
Binary dilation with an all-ones 3x3 footprint (8-connectivity) is exactly
a 3x3 max-pool, so the whole computation is a couple of reduce_windows and
stays inside the jitted train step.

Semantics (bit-matched to reference train.py:200-249):

- binarize target: > 0.5 on a [0,1] image (> 127 for 0-255 handled by the
  caller's scaling),
- k dilation rings: ring_i = dilate^i(fg) \\ dilate^{i-1}(fg),
- weights: foreground = stroke_w (3.0), ring_i = ring_w[i] ((3,2,1) with
  k=2 only the first two are used), background = bg_min (0.0),
- optional normalization so the batch-mean weight is 1 (NORM_MEAN_ONE).

Note the reference normalizes over the whole *batch* mean (train.py:247-248),
not per image — reproduced here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

STROKE_W = 3.0
RING_W = (3.0, 2.0, 1.0)
K_RINGS = 2


def binary_dilate3x3(x: jnp.ndarray) -> jnp.ndarray:
    """8-connected binary dilation of an NHWC {0,1} float map (3x3 max-pool)."""
    return jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, 3, 3, 1),
        window_strides=(1, 1, 1, 1),
        padding="SAME",
    )


def boundary_ring_weights(
    target: jnp.ndarray,
    k: int = K_RINGS,
    stroke_w: float = STROKE_W,
    ring_w: tuple = RING_W,
    bg_min: float = 0.0,
    normalize_to_mean_one: bool = True,
    threshold: float = 0.5,
) -> jnp.ndarray:
    """Per-pixel loss weights for a (B, H, W, 1) target in [0, 1].

    Fully on-device equivalent of reference make_weights_from_numpy
    (train.py:226-249).
    """
    fg = (target > threshold).astype(jnp.float32)
    weights = jnp.full_like(fg, float(bg_min))
    weights = jnp.where(fg > 0, float(stroke_w), weights)
    prev = fg
    for i in range(k):
        dil = binary_dilate3x3(prev)
        ring = dil - prev  # in {0,1}
        wv = ring_w[i] if i < len(ring_w) else ring_w[-1]
        weights = jnp.where(ring > 0, float(wv), weights)
        prev = dil
    # Reference: if the weights sum to zero, fall back to all-ones
    # (train.py:245-246), then normalize by the batch mean (:247-248).
    total = jnp.sum(weights)
    weights = jnp.where(total == 0.0, jnp.ones_like(weights), weights)
    if normalize_to_mean_one:
        weights = weights / jnp.maximum(jnp.mean(weights), 1e-8)
    return weights
