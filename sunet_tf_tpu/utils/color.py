"""RGB <-> HSV/HSL converters, NHWC, jit-friendly.

Capability parity with reference utils/image_utils.py:29-104 (unused by the
reference pipelines but part of its public utils surface). Implemented with
branchless jnp.where (the reference used boolean-mask scatter, which does
not trace); verified against colorsys in tests.

All channels in [0, 1]; hue is fractional (h in [0,1) = degrees/360).
"""

from __future__ import annotations

import jax.numpy as jnp


def rgb2hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """(..., 3) RGB -> HSV."""
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)
    delta = cmax - cmin
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        cmax == r, ((g - b) / safe) % 6.0,
        jnp.where(cmax == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(delta == 0, 0.0, h) / 6.0
    s = jnp.where(cmax == 0, 0.0, delta / jnp.where(cmax == 0, 1.0, cmax))
    return jnp.stack([h, s, cmax], axis=-1)


def hsv2rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    c = v * s
    x = c * (1.0 - jnp.abs((h * 6.0) % 2.0 - 1.0))
    m = v - c
    idx = jnp.floor(h * 6.0).astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    # channel value per sextant
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)


def rgb2hsl(rgb: jnp.ndarray) -> jnp.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    cmax = jnp.max(rgb, axis=-1)
    cmin = jnp.min(rgb, axis=-1)
    delta = cmax - cmin
    safe = jnp.where(delta == 0, 1.0, delta)
    h = jnp.where(
        cmax == r, ((g - b) / safe) % 6.0,
        jnp.where(cmax == g, (b - r) / safe + 2.0, (r - g) / safe + 4.0))
    h = jnp.where(delta == 0, 0.0, h) / 6.0
    l = (cmax + cmin) / 2.0
    denom = 1.0 - jnp.abs(2.0 * l - 1.0)
    s = jnp.where((l <= 0.0) | (l >= 1.0), 0.0,
                  delta / jnp.where(denom == 0, 1.0, denom))
    return jnp.stack([h, s, l], axis=-1)


def hsl2rgb(hsl: jnp.ndarray) -> jnp.ndarray:
    h, s, l = hsl[..., 0], hsl[..., 1], hsl[..., 2]
    c = (1.0 - jnp.abs(2.0 * l - 1.0)) * s
    x = c * (1.0 - jnp.abs((h * 6.0) % 2.0 - 1.0))
    m = l - c / 2.0
    idx = jnp.floor(h * 6.0).astype(jnp.int32) % 6
    z = jnp.zeros_like(c)
    r = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [c, x, z, z, x, c])
    g = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [x, c, c, x, z, z])
    b = jnp.select([idx == 0, idx == 1, idx == 2, idx == 3, idx == 4, idx == 5],
                   [z, z, x, c, c, x])
    return jnp.stack([r + m, g + m, b + m], axis=-1)
