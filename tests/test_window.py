"""Window primitives: round-trip, index tables, shift masks.

These pin the semantics established by reference model/SUNet_detail.py
(window_partition/reverse :27-56, relative index :86-97, SW-MSA mask
:202-221, auto-degrade :186-190).
"""

import jax
import jax.numpy as jnp
import numpy as np

from sunet_tf_tpu.ops.window import (
    MASK_NEG,
    effective_window,
    relative_position_index,
    roll2d,
    shift_attn_mask,
    window_partition,
    window_reverse,
)


def test_partition_reverse_roundtrip():
    key = jax.random.key(0)
    x = jax.random.normal(key, (3, 16, 24, 5))
    for ws in (2, 4, 8):
        w = window_partition(x, ws)
        assert w.shape == (3 * (16 // ws) * (24 // ws), ws * ws, 5)
        back = window_reverse(w, ws, 16, 24)
        np.testing.assert_array_equal(np.asarray(back), np.asarray(x))


def test_partition_window_order():
    # Windows enumerate row-major over the window grid; tokens row-major
    # inside each window.
    H = W = 4
    ws = 2
    x = jnp.arange(H * W).reshape(1, H, W, 1).astype(jnp.float32)
    w = np.asarray(window_partition(x, ws))[..., 0]
    np.testing.assert_array_equal(w[0], [0, 1, 4, 5])
    np.testing.assert_array_equal(w[1], [2, 3, 6, 7])
    np.testing.assert_array_equal(w[2], [8, 9, 12, 13])
    np.testing.assert_array_equal(w[3], [10, 11, 14, 15])


def test_relative_position_index_properties():
    ws = 4
    idx = relative_position_index(ws, ws)
    n = ws * ws
    assert idx.shape == (n, n)
    assert idx.min() == 0 and idx.max() == (2 * ws - 1) ** 2 - 1
    # diagonal = zero displacement = center of the table
    center = (ws - 1) * (2 * ws - 1) + (ws - 1)
    assert (np.diag(idx) == center).all()
    # index depends only on displacement: anti-symmetric pairs share tables
    # via mirrored displacement.
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    flat = coords.reshape(2, -1)
    for i in (0, 5, 9):
        for j in (1, 7, 12):
            dy = flat[0, i] - flat[0, j] + ws - 1
            dx = flat[1, i] - flat[1, j] + ws - 1
            assert idx[i, j] == dy * (2 * ws - 1) + dx


def test_shift_mask_zero_when_unshifted():
    m = shift_attn_mask(8, 8, 4, 0)
    assert m.shape == (4, 16, 16)
    assert (m == 0).all()


def test_shift_mask_structure():
    H = W = 8
    ws, shift = 4, 2
    m = shift_attn_mask(H, W, ws, shift)
    nW = (H // ws) * (W // ws)
    assert m.shape == (nW, ws * ws, ws * ws)
    assert set(np.unique(m)).issubset({0.0, np.float32(MASK_NEG)})
    # First window is interior after the roll: fully unmasked.
    assert (m[0] == 0).all()
    # Masks are symmetric (same-region relation).
    np.testing.assert_array_equal(m, np.transpose(m, (0, 2, 1)))
    # The last window mixes 4 roll regions: for each token exactly the
    # same-region tokens are visible; count must match region sizes.
    last = m[-1]
    visible = (last == 0).sum(axis=1)
    # regions in the last window: (ws-shift)^2, (ws-shift)*shift x2, shift^2
    a, s = ws - shift, shift
    expected = sorted([a * a] * (a * a) + [a * s] * (2 * a * s) + [s * s] * (s * s))
    assert sorted(visible.tolist()) == expected


def test_effective_window_degrade():
    # Bottleneck 8x8 with window 8: full-window, unshifted.
    assert effective_window((8, 8), 8, 4) == (8, 0)
    # Resolution smaller than the window: shrink.
    assert effective_window((4, 4), 8, 4) == (4, 0)
    # Normal case: untouched.
    assert effective_window((64, 64), 8, 4) == (8, 4)


def test_roll2d_roundtrip():
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 3))
    y = roll2d(roll2d(x, -3), 3)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))
