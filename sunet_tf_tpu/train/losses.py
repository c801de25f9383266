"""Losses, bit-matched to reference train.py:187-197.

Both support an optional per-pixel weight with the reference's
sum(l * w) / clamp(sum(w), 1e-8) normalization. Loss math runs in fp32
regardless of the model compute dtype (logits are fp32 by contract).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp


def charbonnier_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-3,
) -> jnp.ndarray:
    """sqrt(diff^2 + eps^2), mean or weight-normalized sum."""
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    l = jnp.sqrt(diff * diff + eps * eps)
    if weight is None:
        return jnp.mean(l)
    w = weight.astype(jnp.float32)
    return jnp.sum(l * w) / jnp.maximum(jnp.sum(w), 1e-8)


def mse_loss(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    if weight is None:
        return jnp.mean(diff)
    w = weight.astype(jnp.float32)
    return jnp.sum(diff * w) / jnp.maximum(jnp.sum(w), 1e-8)


# ---------------------------------------------------------------------------
# Per-sample variants (reduce over each sample's own pixels, return (B,)).
# Used by the sharded eval path: the reference evaluates at batch 1
# (train.py:158), so per-sample-then-dataset-mean is its exact protocol —
# batching the eval must not change the numbers.
# ---------------------------------------------------------------------------


def _sample_axes(x: jnp.ndarray) -> tuple:
    return tuple(range(1, x.ndim))


def charbonnier_per_sample(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    eps: float = 1e-3,
) -> jnp.ndarray:
    diff = pred.astype(jnp.float32) - target.astype(jnp.float32)
    l = jnp.sqrt(diff * diff + eps * eps)
    ax = _sample_axes(l)
    if weight is None:
        return jnp.mean(l, axis=ax)
    w = weight.astype(jnp.float32)
    return jnp.sum(l * w, axis=ax) / jnp.maximum(jnp.sum(w, axis=ax), 1e-8)


def mse_per_sample(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    diff = (pred.astype(jnp.float32) - target.astype(jnp.float32)) ** 2
    ax = _sample_axes(diff)
    if weight is None:
        return jnp.mean(diff, axis=ax)
    w = weight.astype(jnp.float32)
    return jnp.sum(diff * w, axis=ax) / jnp.maximum(jnp.sum(w, axis=ax), 1e-8)
