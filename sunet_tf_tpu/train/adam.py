"""Low-precision-state Adam for HBM-roofline-bound updates.

The reference optimizer is Adam(2e-4, betas=(0.9, 0.999), eps=1e-8)
(reference train.py:126-135). On TPU the Adam update of the 99.7M-param
model is HBM-bandwidth-bound: it streams ~7x400 MB of fp32 state
(params, grads, mu, nu reads + params, mu, nu writes) and xprof shows
its multiply-add fusions at the v5e HBM roofline. Storage dtype of the
moments is therefore a direct throughput knob:

- ``mu`` (first moment, decay 0.9): per-step increments are ~10% of the
  running value — far above the bf16 ulp (2^-8 relative). Deterministic
  bf16 storage is noise-level; it is the repo default (TPU.OPT_MU_DTYPE,
  measured +3.6% train step; see train/loop.py::make_optimizer).
- ``nu`` (second moment, decay 0.999): per-step increments are ~0.1% of
  the running value — BELOW the bf16 ulp, so deterministic bf16 rounding
  freezes nu near steady state (the EMA stops tracking slow gradient-
  scale drift; bias bounded by one ulp, ~0.4% of the adaptive LR).
  ``bfloat16_sr`` stores nu with STOCHASTIC rounding instead: each write
  rounds up/down with probability proportional to the fractional ulp
  distance, so the EMA stays unbiased in expectation (the standard
  low-precision-optimizer recipe). nu >= 0 always, so the sign bit never
  participates.

All arithmetic (EMA, bias correction, the update itself) runs in fp32 —
only the *storage* dtype of the moments changes. The state tree is
``optax.ScaleByAdamState``, bit-structure-compatible with
``optax.adam``'s, so orbax checkpoints restore across any dtype choice
(the restore casts to the fresh skeleton's dtypes — tested in
tests/test_round3_fixes.py).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _stochastic_round_bf16(r, x: jax.Array) -> jax.Array:
    """Round fp32 ``x`` (non-negative, finite) to bf16 stochastically.

    ``r`` is a uint32 dither in [0, 2^16) — a SCALAR shared by the whole
    array. Adding it to the fp32 bit pattern and truncating makes the
    carry into the kept mantissa bits fire with probability equal to the
    discarded fraction (mantissa rollover carries into the exponent
    correctly), so each element rounds up with probability proportional
    to its distance from the lower bf16 neighbor — unbiased marginally.
    A scalar dither correlates rounding *within* one write but is
    independent across steps, which is what EMA unbiasedness needs; a
    per-element dither measured −4% train step on v5e (full-shape
    threefry over 100M optimizer elements per step outweighs the ~1
    saved HBM pass of nu), while the scalar is free.
    """
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    kept = (bits + r) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(kept, jnp.float32).astype(jnp.bfloat16)


def scale_by_adam_lp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
    stochastic_round_nu: bool = False,
    sr_seed: int = 0,
) -> optax.GradientTransformation:
    """``optax.scale_by_adam`` with a storage dtype for BOTH moments.

    With ``mu_dtype=nu_dtype=None`` this reproduces ``optax.scale_by_adam``
    exactly (same EMA/bias-correction math in fp32; parity-tested).
    ``stochastic_round_nu`` applies only when ``nu_dtype`` is bf16; the
    SR key is ``fold_in(key(sr_seed), step)`` — deterministic per step
    with no key threading through the optimizer API, and distinct runs
    (different config seeds) get distinct dither sequences.
    """
    mu_dtype = jnp.dtype(mu_dtype) if mu_dtype is not None else None
    nu_dtype = jnp.dtype(nu_dtype) if nu_dtype is not None else None

    def init(params):
        mu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=mu_dtype or p.dtype), params)
        nu = jax.tree.map(
            lambda p: jnp.zeros_like(p, dtype=nu_dtype or p.dtype), params)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=mu, nu=nu)

    def update(updates, state, params=None):
        del params
        count_inc = optax.safe_int32_increment(state.count)
        cf = count_inc.astype(jnp.float32)
        bc1 = 1.0 - jnp.power(jnp.float32(b1), cf)
        bc2 = 1.0 - jnp.power(jnp.float32(b2), cf)
        treedef = jax.tree.structure(updates)
        gl = jax.tree.leaves(updates)
        ml = jax.tree.leaves(state.mu)
        vl = jax.tree.leaves(state.nu)
        sr = stochastic_round_nu and nu_dtype == jnp.bfloat16
        # ONE tiny threefry per step: a (n_leaves,) dither vector, one
        # scalar per leaf (independent across leaves and steps).
        dither = (jax.random.bits(
            jax.random.fold_in(jax.random.key(sr_seed), count_inc),
            (len(gl),), jnp.uint32) & jnp.uint32(0xFFFF)) if sr else None
        outs, new_mu, new_nu = [], [], []
        for i, (g, m, v) in enumerate(zip(gl, ml, vl)):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            outs.append((m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps))
            new_mu.append(m32.astype(mu_dtype) if mu_dtype else m32)
            if nu_dtype is None:
                new_nu.append(v32)
            elif sr:
                # _stochastic_round_bf16 precondition (non-negative,
                # finite): v32 = b2·v + (1−b2)·g² is ≥0 by construction;
                # non-finite grads are caught upstream by the trainer's
                # finite-loss guard before the update applies.
                new_nu.append(_stochastic_round_bf16(dither[i], v32))
            else:
                new_nu.append(v32.astype(nu_dtype))
        return (jax.tree.unflatten(treedef, outs),
                optax.ScaleByAdamState(
                    count=count_inc,
                    mu=jax.tree.unflatten(treedef, new_mu),
                    nu=jax.tree.unflatten(treedef, new_nu)))

    return optax.GradientTransformation(init, update)


def adam_lp(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    mu_dtype: Optional[jnp.dtype] = None,
    nu_dtype: Optional[jnp.dtype] = None,
    stochastic_round_nu: bool = False,
    sr_seed: int = 0,
) -> optax.GradientTransformation:
    """``optax.adam`` with moment storage dtypes; same chained state tree
    (ScaleByAdamState, schedule state), so checkpoints interchange."""
    return optax.chain(
        scale_by_adam_lp(b1=b1, b2=b2, eps=eps, mu_dtype=mu_dtype,
                         nu_dtype=nu_dtype,
                         stochastic_round_nu=stochastic_round_nu,
                         sr_seed=sr_seed),
        optax.scale_by_learning_rate(learning_rate),
    )
