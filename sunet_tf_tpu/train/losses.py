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
