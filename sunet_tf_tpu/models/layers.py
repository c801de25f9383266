"""SUNet building blocks as flax.nnx modules — NHWC, TPU-first.

Design notes (vs the reference's torch modules, cited per class):

- Feature maps stay (B, H, W, C) end to end; there is no (B, L, C)
  flattening anywhere. Window partition/reverse are pure reshapes, LayerNorm
  and MLPs act on the trailing channel axis, so XLA keeps everything in a
  lane-friendly layout.
- Mixed precision: matmuls/convs run in a configurable compute dtype
  (bfloat16 by default) with fp32 accumulation; LayerNorm and softmax run
  in fp32; parameters are stored fp32.
- Randomness (dropout / stochastic depth) is *functional*: callers pass an
  explicit PRNG key that is fold_in-split per block. No hidden RNG state,
  so train steps are pure and trivially jit/shard/remat-able.
- All resolution-dependent constants (shift masks, relative-position
  indices) are computed from static shapes at trace time and cached
  (sunet_tf_tpu.ops.window); nothing is stored as a buffer.

Initialization matches the reference statistics: Linear weights
trunc-normal(0.02) with zero bias (reference model/SUNet_detail.py:688-695),
LayerNorm ones/zeros, convs torch-default kaiming-uniform(a=sqrt(5)), PReLU
slope 0.25.
"""

from __future__ import annotations

import math
import os
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sunet_tf_tpu.ops.image import bilinear_resize, pixel_shuffle
from sunet_tf_tpu.ops.window import (
    effective_window,
    relative_position_index,
    roll2d,
    shift_attn_mask,
    window_partition,
    window_reverse,
)

class _LogitStatsFlag:
    """Process-wide opt-in for attention-logit sowing (obs.py context)."""

    enabled = False


_LOGIT_STATS = _LogitStatsFlag()


def _kernel_max_c(train: bool) -> int:
    """Largest channel dim routed to the fused Pallas kernels.

    The backward kernels carry fp32 weight-grad accumulators in VMEM
    (C=768: ~19MB for the MLP pair alone), past Mosaic's default 16MB
    scoped window — but v5e has 128MB physical VMEM, so the kernels ship
    with a raised per-kernel vmem_limit instead of a hard fallback.
    Training default is 768 (covers every stage of the default model):
    measured on v5e @256² batch 16, whole-block kernels at all stages run
    156 img/s vs 88 with the C≤384 cap (XLA: 74). The scaled EMB-180
    config's C=1440 stage exceeds even the raised window and falls back.
    Overridable for smaller-VMEM targets via SUNET_TRAIN_KERNEL_MAX_C /
    SUNET_INFER_KERNEL_MAX_C (0 disables the kernels entirely).
    """
    if train:
        return int(os.environ.get("SUNET_TRAIN_KERNEL_MAX_C", 768))
    return int(os.environ.get("SUNET_INFER_KERNEL_MAX_C", 384))


# Linear/LN init used by the reference's _init_weights
# (model/SUNet_detail.py:688-695): trunc normal std 0.02 (timm truncates at
# +-2 absolute, i.e. +-100 sigma at std 0.02 — effectively a plain normal).
linear_init = jax.nn.initializers.normal(stddev=0.02)


def torch_conv_kernel_init():
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in))."""
    return jax.nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_conv_bias_init(fan_in: int):
    bound = 1.0 / math.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def _dropout(x: jnp.ndarray, rate: float, key: Optional[jax.Array]) -> jnp.ndarray:
    if rate <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


def drop_path(x: jnp.ndarray, rate: float, key: Optional[jax.Array]) -> jnp.ndarray:
    """Per-sample stochastic depth (reference uses timm DropPath)."""
    if rate <= 0.0 or key is None:
        return x
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    keep = jax.random.bernoulli(key, 1.0 - rate, shape)
    return jnp.where(keep, x / (1.0 - rate), jnp.zeros_like(x))


class PReLU(nnx.Module):
    """Single-parameter PReLU, init 0.25 (torch nn.PReLU default)."""

    def __init__(self, *, param_dtype=jnp.float32, rngs: nnx.Rngs = None):
        self.alpha = nnx.Param(jnp.full((1,), 0.25, dtype=param_dtype))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.alpha[...].astype(x.dtype)
        return jnp.maximum(x, 0) + a * jnp.minimum(x, 0)


class Conv1x1(nnx.Module):
    """1x1 convolution as a channel-axis Linear (identical math, leaner IR).

    Initialized like torch Conv2d so reference checkpoints import 1:1.
    """

    def __init__(self, in_ch: int, out_ch: int, *, use_bias: bool = True,
                 dtype=None, rngs: nnx.Rngs):
        self.lin = nnx.Linear(
            in_ch, out_ch, use_bias=use_bias, dtype=dtype,
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(in_ch),
            rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.lin(x)


class Conv3x3(nnx.Module):
    """3x3 SAME conv, NHWC, torch-default init."""

    def __init__(self, in_ch: int, out_ch: int, *, use_bias: bool = True,
                 dtype=None, rngs: nnx.Rngs):
        self.conv = nnx.Conv(
            in_ch, out_ch, kernel_size=(3, 3), strides=1, padding="SAME",
            use_bias=use_bias, dtype=dtype,
            kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(9 * in_ch),
            rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.conv(x)


class Mlp(nnx.Module):
    """2-layer GELU MLP (reference model/SUNet_detail.py:8-24).

    GELU is the exact erf form (torch nn.GELU default), not tanh-approx.
    """

    def __init__(self, dim: int, hidden: int, *, drop: float = 0.0,
                 dtype=None, rngs: nnx.Rngs):
        self.fc1 = nnx.Linear(dim, hidden, kernel_init=linear_init, dtype=dtype, rngs=rngs)
        self.fc2 = nnx.Linear(hidden, dim, kernel_init=linear_init, dtype=dtype, rngs=rngs)
        self.drop = drop

    def __call__(self, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        k1, k2 = (None, None) if key is None else tuple(jax.random.split(key))
        x = self.fc1(x)
        x = jax.nn.gelu(x, approximate=False)
        x = _dropout(x, self.drop, k1)
        x = self.fc2(x)
        return _dropout(x, self.drop, k2)


class WindowAttention(nnx.Module):
    """W-MSA with learnable relative-position bias (reference
    model/SUNet_detail.py:59-138).

    - qk_scale overrides head_dim**-0.5 when set (the reference recipe uses
      the constant 8, training.yaml:15 — exactly representable in bf16).
    - attention logits accumulate in fp32; softmax runs in fp32.
    - the additive 0/-100 shift mask is applied per window before softmax.
    """

    def __init__(self, dim: int, window_size: int, num_heads: int, *,
                 qkv_bias: bool = True, qk_scale: Optional[float] = None,
                 attn_drop: float = 0.0, proj_drop: float = 0.0,
                 dtype=None, rngs: nnx.Rngs):
        self.dim = dim
        self.window_size = window_size
        self.num_heads = num_heads
        head_dim = dim // num_heads
        self.scale = float(qk_scale) if qk_scale is not None else head_dim**-0.5
        self.qkv = nnx.Linear(dim, 3 * dim, use_bias=qkv_bias,
                              kernel_init=linear_init, dtype=dtype, rngs=rngs)
        self.proj = nnx.Linear(dim, dim, kernel_init=linear_init, dtype=dtype, rngs=rngs)
        n_rel = (2 * window_size - 1) ** 2
        self.relative_position_bias_table = nnx.Param(
            linear_init(rngs.params(), (n_rel, num_heads), jnp.float32))
        self.attn_drop = attn_drop
        self.proj_drop = proj_drop

    def bias_matrix(self) -> jnp.ndarray:
        """(num_heads, N, N) fp32 relative-position bias for this window.

        Computed as one_hot(idx) @ table instead of table[idx]: the
        gather's transpose is a serial scatter-add into the (n_rel, h)
        table that XLA emits once per block — 1.59 ms of the 100 ms b16
        train step across the 56 blocks (xprof 2026-08-18) — while the
        matmul's transpose is another trivial matmul. The one-hot is
        built on device from an iota compare (a static numpy f32 one-hot
        would bloat the remote-compile HLO body) and CSEs across blocks
        sharing a window size.
        """
        ws = self.window_size
        n = ws * ws
        idx = relative_position_index(ws, ws).reshape(-1)  # static numpy
        table = self.relative_position_bias_table[...]  # (n_rel, h) fp32
        n_rel = table.shape[0]
        onehot = (jnp.asarray(idx, jnp.int32)[:, None]
                  == jax.lax.broadcasted_iota(jnp.int32, (1, n_rel), 1))
        bias = jnp.dot(onehot.astype(jnp.float32), table,
                       preferred_element_type=jnp.float32)
        return bias.reshape(n, n, self.num_heads).transpose(2, 0, 1)

    def __call__(self, xw: jnp.ndarray, mask: Optional[np.ndarray] = None,
                 key: Optional[jax.Array] = None) -> jnp.ndarray:
        """xw: (B*nW, N, C) windows; mask: static (nW, N, N) or None."""
        Bn, N, C = xw.shape
        h, d = self.num_heads, C // self.num_heads
        k1, k2 = (None, None) if key is None else tuple(jax.random.split(key))

        qkv = self.qkv(xw).reshape(Bn, N, 3, h, d)
        q = qkv[:, :, 0].transpose(0, 2, 1, 3) * jnp.asarray(self.scale, qkv.dtype)
        k = qkv[:, :, 1].transpose(0, 2, 1, 3)
        v = qkv[:, :, 2].transpose(0, 2, 1, 3)  # (Bn, h, N, d)

        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32)
        attn = attn + self.bias_matrix()[None]
        # observability (opt-in via collect_logit_stats): pre-mask logit
        # extrema — used to validate the fused kernels' shifted-softmax
        # exact band (-47, 80] on TRAINED weights; see obs.py. Opt-in
        # because sowed Intermediates persist on the module and poison
        # later traces (Intermediate mutation across trace levels).
        if _LOGIT_STATS.enabled:
            self.sow(nnx.Intermediate, "logit_max", jnp.max(attn),
                     reduce_fn=jnp.maximum,
                     init_fn=lambda: jnp.float32(-jnp.inf))
            self.sow(nnx.Intermediate, "logit_min", jnp.min(attn),
                     reduce_fn=jnp.minimum,
                     init_fn=lambda: jnp.float32(jnp.inf))
        if mask is not None:
            nW = mask.shape[0]
            m = jnp.asarray(mask, dtype=attn.dtype)  # (nW, N, N)
            attn = attn.reshape(Bn // nW, nW, h, N, N) + m[None, :, None]
            attn = attn.reshape(Bn, h, N, N)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = _dropout(attn, self.attn_drop, k1)

        out = jnp.einsum("bhnm,bhmd->bhnd", attn.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(v.dtype).transpose(0, 2, 1, 3).reshape(Bn, N, C)
        out = self.proj(out)
        return _dropout(out, self.proj_drop, k2)


class SwinBlock(nnx.Module):
    """Swin transformer block: LN -> (shift) -> W-MSA -> (unshift) ->
    residual -> LN -> MLP -> residual (reference model/SUNet_detail.py:157-264).

    The effective (window, shift) pair is resolved at build time from the
    stage's input resolution (auto-degrade rule, reference :186-190), and the
    SW-MSA mask is rebuilt at call time from the *actual* static input shape,
    so the block generalizes to any resolution divisible by the window
    (unlike the reference, whose ctor-time buffers pinned it to IMG_SIZE).
    """

    def __init__(self, dim: int, input_resolution: tuple, num_heads: int, *,
                 window_size: int, shift_size: int, mlp_ratio: float = 4.0,
                 qkv_bias: bool = True, qk_scale: Optional[float] = None,
                 drop: float = 0.0, attn_drop: float = 0.0,
                 drop_path_rate: float = 0.0, backend: str = "xla",
                 ablate: tuple = (), dtype=None, rngs: nnx.Rngs):
        ws, ss = effective_window(input_resolution, window_size, shift_size)
        # profiling aid: 'attn' / 'mlp' skip sublayers; 'shift' forces
        # unshifted windows (no rolls/masks)
        self.ablate = tuple(ablate)
        if "shift" in self.ablate:
            ss = 0
        self.window_size = ws
        self.shift_size = ss
        self.dim = dim
        self.norm1 = nnx.LayerNorm(dim, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
        self.attn = WindowAttention(
            dim, ws, num_heads, qkv_bias=qkv_bias, qk_scale=qk_scale,
            attn_drop=attn_drop, proj_drop=drop, dtype=dtype, rngs=rngs)
        self.norm2 = nnx.LayerNorm(dim, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
        self.mlp = Mlp(dim, int(dim * mlp_ratio), drop=drop, dtype=dtype, rngs=rngs)
        self.drop_path_rate = drop_path_rate
        # 'pallas' fuses qkv+attention+proj into one TPU kernel; only valid
        # when attention/proj dropout are inactive (default recipe: rates 0).
        self.backend = backend
        self._can_fuse = attn_drop == 0.0 and drop == 0.0

    def _attention(self, x: jnp.ndarray, ss: int, key) -> jnp.ndarray:
        """Pre-normed NHWC map -> attention sublayer output (pre-residual)."""
        B, H, W, C = x.shape
        ws = self.window_size
        x = roll2d(x, -ss)
        mask = shift_attn_mask(H, W, ws, ss) if ss > 0 else None
        xw = window_partition(x, ws)
        xw = self.attn(xw, mask, key=key)
        x = window_reverse(xw, ws, H, W)
        return roll2d(x, ss)

    def _attention_fused(self, x_raw: jnp.ndarray, ss: int) -> jnp.ndarray:
        """Raw (pre-LN) NHWC map -> attention sublayer output via the
        Pallas row-strip kernel (LN + partition + W-MSA + proj fused)."""
        from sunet_tf_tpu.kernels.window_attention import (
            fused_ln_window_attention,
            softmax_autoselect,
        )

        B, H, W, C = x_raw.shape
        ws = self.window_size
        x = roll2d(x_raw, -ss)
        mask = shift_attn_mask(H, W, ws, ss) if ss > 0 else None
        a = self.attn
        with softmax_autoselect(a.scale, C // a.num_heads):
            x = fused_ln_window_attention(
                x, self.norm1.scale[...], self.norm1.bias[...],
                a.qkv.kernel[...].astype(x.dtype),
                None if a.qkv.bias is None else a.qkv.bias[...],
                a.proj.kernel[...].astype(x.dtype), a.proj.bias[...],
                a.bias_matrix(),
                None if mask is None else jnp.asarray(mask),
                ws=ws, num_heads=a.num_heads, scale=a.scale)
        return roll2d(x, ss)

    def _fused_block(self, x: jnp.ndarray, ss: int) -> jnp.ndarray:
        """Whole-block Pallas kernel (LN1+W-MSA+res+LN2+MLP+res), rolled
        coordinates handled here. Inference path (no dropout/droppath)."""
        from sunet_tf_tpu.kernels.window_attention import (
            fused_swin_block,
            roll_fusable,
            softmax_autoselect,
        )

        H, W, C = x.shape[1], x.shape[2], x.shape[3]
        ws = self.window_size
        a = self.attn
        # when each kernel program owns the whole image, the SW-MSA roll
        # fuses into the kernel (VMEM data movement, no XLA roll pair)
        fuse_roll = ss > 0 and roll_fusable(H, W, C, ws, train=False,
                                    itemsize=x.dtype.itemsize)
        xr = x if (ss == 0 or fuse_roll) else roll2d(x, -ss)
        mask = shift_attn_mask(H, W, ws, ss) if ss > 0 else None
        with softmax_autoselect(a.scale, C // a.num_heads):
            out = fused_swin_block(
                xr,
                (self.norm1.scale[...], self.norm1.bias[...]),
                a.qkv.kernel[...].astype(x.dtype),
                None if a.qkv.bias is None else a.qkv.bias[...],
                a.proj.kernel[...].astype(x.dtype), a.proj.bias[...],
                (self.norm2.scale[...], self.norm2.bias[...]),
                self.mlp.fc1.kernel[...].astype(x.dtype), self.mlp.fc1.bias[...],
                self.mlp.fc2.kernel[...].astype(x.dtype), self.mlp.fc2.bias[...],
                a.bias_matrix(),
                None if mask is None else jnp.asarray(mask),
                ws=ws, num_heads=a.num_heads, scale=a.scale,
                shift=ss if fuse_roll else 0)
        return out if (ss == 0 or fuse_roll) else roll2d(out, ss)

    def _trainable_block(self, x: jnp.ndarray, ss: int, kd1, kd2) -> jnp.ndarray:
        """Whole-block custom-VJP kernel (Pallas fwd AND bwd) with
        per-sample stochastic-depth scales sampled here."""
        from sunet_tf_tpu.kernels.window_attention import (
            bwd_residuals_enabled,
            roll_fusable,
            static_mask,
            swin_block_trainable,
            swin_block_trainable_res,
        )

        B, H, W, C = x.shape
        rate = self.drop_path_rate
        if rate > 0.0 and kd1 is not None:
            keep = 1.0 - rate
            s1 = jax.random.bernoulli(kd1, keep, (B,)).astype(jnp.float32) / keep
            s2 = jax.random.bernoulli(kd2, keep, (B,)).astype(jnp.float32) / keep
            dp = jnp.stack([s1, s2], axis=1)
        else:
            dp = jnp.ones((B, 2), jnp.float32)
        a = self.attn
        # In-kernel roll in the TRAINING kernels is off by default: fusing
        # it into the backward kernel measured a big regression (v5e b16:
        # 152 vs 212 img/s — the bwd kernel is VMEM-tight and the three
        # extra rolled copies push it over), while the inference kernel
        # gains. SUNET_TRAIN_ROLL_FUSE=1 re-enables for re-measurement.
        fuse_roll = (ss > 0
                     and os.environ.get("SUNET_TRAIN_ROLL_FUSE", "0") == "1"
                     and roll_fusable(H, W, C, self.window_size,
                                      itemsize=x.dtype.itemsize))
        xr = x if (ss == 0 or fuse_roll) else roll2d(x, -ss)
        # Residual-saving variant for blockdiag geometries (default): the
        # fwd kernel stores the softmax state so the bwd kernel skips the
        # score/exp/den recompute (kernels/window_attention.py section
        # comment; SUNET_BWD_RESID=0 opts out).
        block_fn = (swin_block_trainable_res
                    if bwd_residuals_enabled(C, self.attn.num_heads,
                                             self.window_size ** 2)
                    else swin_block_trainable)
        out = block_fn(
            xr, self.norm1.scale[...], self.norm1.bias[...],
            a.qkv.kernel[...],
            None if a.qkv.bias is None else a.qkv.bias[...],
            a.proj.kernel[...], a.proj.bias[...],
            self.norm2.scale[...], self.norm2.bias[...],
            self.mlp.fc1.kernel[...], self.mlp.fc1.bias[...],
            self.mlp.fc2.kernel[...], self.mlp.fc2.bias[...],
            a.bias_matrix(), dp,
            static_mask(H, W, self.window_size, ss),
            self.window_size, a.num_heads, a.scale,
            ss if fuse_roll else 0)
        return out if (ss == 0 or fuse_roll) else roll2d(out, ss)

    def __call__(self, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        B, H, W, C = x.shape
        ws, ss = self.window_size, self.shift_size
        assert H % ws == 0 and W % ws == 0, (
            f"resolution ({H},{W}) not divisible by window {ws}")
        ka, km, kd1, kd2 = (None,) * 4 if key is None else tuple(jax.random.split(key, 4))

        # Whole-block Pallas kernel, inference path (dropout-free).
        if (self.backend == "pallas" and key is None and not self.ablate
                and self.dim <= _kernel_max_c(train=False)):
            return self._fused_block(x, ss)

        # Whole-block Pallas custom-VJP, training path: one fwd + one bwd
        # kernel per block instead of two sublayer pairs (half the launches,
        # 3 activation HBM crossings in backward instead of 6).
        if (self.backend == "pallas" and self._can_fuse and key is not None
                and not self.ablate and self.dim <= _kernel_max_c(train=True)
                and os.environ.get("SUNET_TRAIN_BLOCK_KERNEL", "1") != "0"):
            return self._trainable_block(x, ss, kd1, kd2)

        use_pallas = self.backend == "pallas" and key is None
        if "attn" not in self.ablate:
            shortcut = x
            if use_pallas:
                x = self._attention_fused(x, ss)
            elif (self.backend == "pallas" and self._can_fuse
                  and self.dim <= _kernel_max_c(train=True)):
                # training: differentiable fused sublayer (Pallas fwd+bwd);
                # stochastic depth still applies outside via drop_path.
                from sunet_tf_tpu.kernels.window_attention import (
                    ln_window_attention_trainable,
                    static_mask,
                )

                a = self.attn
                xr = roll2d(x, -ss)
                out = ln_window_attention_trainable(
                    xr, self.norm1.scale[...], self.norm1.bias[...],
                    a.qkv.kernel[...],
                    None if a.qkv.bias is None else a.qkv.bias[...],
                    a.proj.kernel[...], a.proj.bias[...],
                    a.bias_matrix(),
                    static_mask(H, W, self.window_size, ss),
                    self.window_size, a.num_heads, a.scale)
                x = roll2d(out, ss)
            else:
                x = self.norm1(x).astype(shortcut.dtype)
                x = self._attention(x, ss, ka)
            x = shortcut + drop_path(x, self.drop_path_rate, kd1)
        if "mlp" not in self.ablate:
            if use_pallas:
                from sunet_tf_tpu.kernels.window_attention import fused_ln_mlp

                x = fused_ln_mlp(
                    x, (self.norm2.scale[...], self.norm2.bias[...]),
                    self.mlp.fc1.kernel[...].astype(x.dtype),
                    self.mlp.fc1.bias[...],
                    self.mlp.fc2.kernel[...].astype(x.dtype),
                    self.mlp.fc2.bias[...])
            elif (self.backend == "pallas" and self._can_fuse
                  and self.dim <= _kernel_max_c(train=True)):
                from sunet_tf_tpu.kernels.window_attention import ln_mlp_trainable

                y = ln_mlp_trainable(
                    x, self.norm2.scale[...], self.norm2.bias[...],
                    self.mlp.fc1.kernel[...], self.mlp.fc1.bias[...],
                    self.mlp.fc2.kernel[...], self.mlp.fc2.bias[...])
                x = x + drop_path(y, self.drop_path_rate, kd2)
            else:
                y = self.mlp(self.norm2(x).astype(x.dtype), key=km)
                x = x + drop_path(y, self.drop_path_rate, kd2)
        return x


def chain_fusable_len(blocks, start: int, x: jnp.ndarray) -> int:
    """Length K >= 2 of the maximal run of consecutive inference blocks
    starting at ``start`` that can run as ONE chain kernel
    (kernels/window_attention.py::fused_swin_block_chain), else 0.

    Per-block conditions: pallas path, no ablation, same dim/window,
    equal shift among the SW blocks; whole image fits one program
    (roll_fusable) so the SW rolls stay in VMEM. Knobs: SUNET_PAIR_FUSE=0
    disables; SUNET_CHAIN_MAX caps K (default 2 = W->SW pairs, the
    measured-win configuration); SUNET_PAIR_MIN_C excludes small-C
    stages (stage-0 measured SLOWER fused — see CLAUDE.md round-5
    ledger: the ~15MB blockdiag score phases co-scheduled across blocks
    cost more than the inter-block HBM crossing, which the grid pipeline
    already fully overlaps)."""
    from sunet_tf_tpu.kernels.window_attention import roll_fusable

    if os.environ.get("SUNET_PAIR_FUSE", "1") == "0":
        return 0
    kmax = int(os.environ.get("SUNET_CHAIN_MAX", "2"))
    if kmax < 2:
        return 0
    B, H, W, C = x.shape
    if C < int(os.environ.get("SUNET_PAIR_MIN_C", "192")):
        return 0
    b0 = blocks[start]
    if not (b0.backend == "pallas" and not b0.ablate and b0.dim == C
            and C <= _kernel_max_c(train=False)
            and roll_fusable(H, W, C, b0.window_size, train=False,
                             itemsize=x.dtype.itemsize)):
        return 0
    n = 1
    ss = b0.shift_size or None
    while start + n < len(blocks) and n < kmax:
        b = blocks[start + n]
        if not (b.backend == "pallas" and not b.ablate and b.dim == C
                and b.window_size == b0.window_size):
            break
        if b.shift_size > 0:
            if ss is None:
                ss = b.shift_size
            elif b.shift_size != ss:
                break
        n += 1
    return n if n >= 2 else 0


def run_fused_chain(blocks, x: jnp.ndarray) -> jnp.ndarray:
    """Run a list of consecutive Swin blocks through the single chain
    kernel (gate with chain_fusable_len)."""
    from sunet_tf_tpu.kernels.window_attention import (
        fused_swin_block_chain,
        softmax_autoselect,
    )

    B, H, W, C = x.shape
    ws = blocks[0].window_size
    shifts = tuple(b.shift_size for b in blocks)
    ss = max(shifts)

    def params(blk):
        a = blk.attn
        return (blk.norm1.scale[...], blk.norm1.bias[...],
                a.qkv.kernel[...].astype(x.dtype),
                (jnp.zeros((3 * C,), jnp.float32) if a.qkv.bias is None
                 else a.qkv.bias[...]),
                a.proj.kernel[...].astype(x.dtype), a.proj.bias[...],
                blk.norm2.scale[...], blk.norm2.bias[...],
                blk.mlp.fc1.kernel[...].astype(x.dtype),
                blk.mlp.fc1.bias[...],
                blk.mlp.fc2.kernel[...].astype(x.dtype),
                blk.mlp.fc2.bias[...])

    nW = (H // ws) * (W // ws)
    N = ws * ws
    mask = (jnp.asarray(shift_attn_mask(H, W, ws, ss)) if ss > 0
            else jnp.zeros((nW, N, N), jnp.float32))
    a = blocks[0].attn
    with softmax_autoselect(a.scale, C // a.num_heads):
        return fused_swin_block_chain(
            x, [params(b) for b in blocks],
            [b.attn.bias_matrix() for b in blocks], mask,
            ws=ws, num_heads=a.num_heads, scale=a.scale, shifts=shifts)


class PatchMerging(nnx.Module):
    """2x2 space-to-depth -> LN(4C) -> Linear(4C->2C, no bias) downsample
    (reference model/SUNet_detail.py:285-322). Gather order [x0,x1,x2,x3] =
    [(even,even),(odd,even),(even,odd),(odd,odd)] is load-bearing for
    checkpoint import parity.
    """

    def __init__(self, dim: int, *, dtype=None, rngs: nnx.Rngs):
        self.norm = nnx.LayerNorm(4 * dim, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
        self.reduction = nnx.Linear(4 * dim, 2 * dim, use_bias=False,
                                    kernel_init=linear_init, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        assert H % 2 == 0 and W % 2 == 0, f"({H},{W}) not even"
        x0 = x[:, 0::2, 0::2, :]
        x1 = x[:, 1::2, 0::2, :]
        x2 = x[:, 0::2, 1::2, :]
        x3 = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([x0, x1, x2, x3], axis=-1)
        dtype = x.dtype
        return self.reduction(self.norm(x).astype(dtype))


class PatchEmbed(nnx.Module):
    """Patch tokenizer: k=s=patch_size conv + optional LN (reference
    model/SUNet_detail.py:518-556). In SUNet it is applied after conv_first,
    so it maps embed_dim -> embed_dim. Output stays NHWC at (H/p, W/p).
    """

    def __init__(self, in_ch: int, embed_dim: int, patch_size: int, *,
                 patch_norm: bool = True, dtype=None, rngs: nnx.Rngs):
        p = patch_size
        self.proj = nnx.Conv(
            in_ch, embed_dim, kernel_size=(p, p), strides=(p, p), padding="VALID",
            dtype=dtype, kernel_init=torch_conv_kernel_init(),
            bias_init=torch_conv_bias_init(p * p * in_ch), rngs=rngs)
        self.norm = (nnx.LayerNorm(embed_dim, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
                     if patch_norm else None)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = self.proj(x)
        if self.norm is not None:
            x = self.norm(x).astype(x.dtype)
        return x


class DualUpsample(nnx.Module):
    """Dual up-sample: PixelShuffle branch + bilinear branch, concat, 1x1 mix
    (reference model/SUNet_detail.py:335-386).

    factor=2: C -> C/2 at 2x resolution; factor=4: C -> C at 4x resolution.
    Branch p: 1x1 conv expand (no bias) -> PReLU -> PixelShuffle -> 1x1 conv.
    Branch b: 1x1 conv (bias) -> PReLU -> bilinear x{2,4} -> 1x1 conv.
    """

    def __init__(self, in_ch: int, factor: int, *, dtype=None,
                 backend: str = "xla", rngs: nnx.Rngs):
        assert factor in (2, 4)
        self.factor = factor
        self.backend = backend
        out_ch = in_ch // 2 if factor == 2 else in_ch
        expand = 2 * in_ch if factor == 2 else 16 * in_ch
        self.up_p_conv1 = Conv1x1(in_ch, expand, use_bias=False, dtype=dtype, rngs=rngs)
        self.up_p_act = PReLU(rngs=rngs)
        self.up_p_conv2 = Conv1x1(out_ch, out_ch, use_bias=False, dtype=dtype, rngs=rngs)
        self.up_b_conv1 = Conv1x1(in_ch, in_ch, use_bias=True, dtype=dtype, rngs=rngs)
        self.up_b_act = PReLU(rngs=rngs)
        self.up_b_conv2 = Conv1x1(in_ch, out_ch, use_bias=False, dtype=dtype, rngs=rngs)
        self.mix = Conv1x1(2 * out_ch, out_ch, use_bias=False, dtype=dtype, rngs=rngs)

    def __call__(self, x: jnp.ndarray, fused: bool = True) -> jnp.ndarray:
        r = self.factor
        out_ch = self.mix.lin.kernel.shape[1]
        # Three algebraic rewrites of the reference dataflow (bit-equivalent
        # up to fp reassociation, big HBM savings at the upsampled res):
        # 1. 1x1 convs commute with bilinear resize -> run up_b's branch
        #    math at LOW resolution, resize last.
        # 2. mix(concat(xp, xb)) == xp @ Wp + xb @ Wb -> no concat tensor.
        # 3. both second 1x1 convs are bias-free, so they fold into the mix
        #    projections in WEIGHT space: W2 @ Wmix is a tiny (out, out)
        #    matmul, deleting a full-resolution activation matmul (an HBM
        #    read+write round trip of the upsampled tensor) per branch.
        wp = self.mix.lin.kernel[...][:out_ch]
        wb = self.mix.lin.kernel[...][out_ch:]
        wpf = self.up_p_conv2.lin.kernel[...] @ wp
        wbf = self.up_b_conv2.lin.kernel[...] @ wb
        import os as _os

        if (r == 4 and fused and self.backend == "pallas"
                and _os.environ.get("SUNET_UP4_FUSED", "1") != "0"):
            # Whole head in one Pallas kernel: kills the expand/shuffle/
            # resize HBM relayout copies in BOTH directions — custom-VJP
            # backward is a single kernel too (kernels/upsample.py).
            # Default in BOTH modes: +14% inference headline; train 104.0
            # vs 107.9 ms/step (b16, v5e) under the chained single-jit
            # harness (per-step host timing through the remote tunnel
            # once suggested the opposite — it under-counts device time;
            # see bench.bench_train). SUNET_UP4_FUSED_TRAIN=0 opts the
            # training path out; small=True strips keep the train-path
            # scoped-VMEM windows under the 16 MB default.
            from sunet_tf_tpu.kernels.upsample import dual_upsample4_trainable

            return dual_upsample4_trainable(
                x, self.up_p_conv1.lin.kernel[...], self.up_p_act.alpha[...],
                self.up_b_conv1.lin.kernel[...], self.up_b_conv1.lin.bias[...],
                self.up_b_act.alpha[...], wpf, wbf)
        xp_pre = pixel_shuffle(self.up_p_act(self.up_p_conv1(x)), r)
        xb_pre = self.up_b_act(self.up_b_conv1(x))
        dt = xp_pre.dtype
        return (xp_pre @ wpf.astype(dt)
                + bilinear_resize(xb_pre @ wbf.astype(dt), r))

    def fused_conv_head(self, x: jnp.ndarray, wconv: jnp.ndarray) -> jnp.ndarray:
        """x4 head AND a following 3x3 bias-free conv (the model's output
        conv, reference model/SUNet_detail.py:753) in one phase-space
        Pallas kernel — the upsampled (B, 4H, 4W, C) map never exists
        (kernels/upsample.py::fused_dual_upsample4_conv). Forward only —
        training routes conv_head_trainable (custom-VJP variant)."""
        assert self.factor == 4
        out_ch = self.mix.lin.kernel.shape[1]
        wp = self.mix.lin.kernel[...][:out_ch]
        wb = self.mix.lin.kernel[...][out_ch:]
        from sunet_tf_tpu.kernels.upsample import fused_dual_upsample4_conv

        return fused_dual_upsample4_conv(
            x, self.up_p_conv1.lin.kernel[...], self.up_p_act.alpha[...],
            self.up_b_conv1.lin.kernel[...], self.up_b_conv1.lin.bias[...],
            self.up_b_act.alpha[...],
            self.up_p_conv2.lin.kernel[...] @ wp,
            self.up_b_conv2.lin.kernel[...] @ wb, wconv)

    def conv_head_trainable(self, x: jnp.ndarray,
                            wconv: jnp.ndarray) -> jnp.ndarray:
        """Differentiable x4 head + 3x3 output conv: single-kernel Pallas
        forward AND backward (kernels/upsample.py custom VJP), returning
        PIXEL-space logits via a cheap depth-to-space. Unlike the split
        training path this never materializes the (B, 4H, 4W, C) head
        output in HBM (reference model/SUNet_detail.py:736-746 + :753)."""
        assert self.factor == 4
        out_ch = self.mix.lin.kernel.shape[1]
        wp = self.mix.lin.kernel[...][:out_ch]
        wb = self.mix.lin.kernel[...][out_ch:]
        from sunet_tf_tpu.kernels.upsample import (
            dual_upsample4_conv_trainable, phase_to_pixel)

        phase = dual_upsample4_conv_trainable(
            x, self.up_p_conv1.lin.kernel[...], self.up_p_act.alpha[...],
            self.up_b_conv1.lin.kernel[...], self.up_b_conv1.lin.bias[...],
            self.up_b_act.alpha[...],
            self.up_p_conv2.lin.kernel[...] @ wp,
            self.up_b_conv2.lin.kernel[...] @ wb, wconv)
        return phase_to_pixel(phase)
