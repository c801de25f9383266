"""SUNet: Swin-Transformer UNet, assembled TPU-first.

Topology matches the reference (model/SUNet_detail.py:566-755) so recipes
and checkpoints carry over:

  conv_first 3x3 (in_chans -> C) at pixel res
  PatchEmbed conv k4 s4 (C -> C) + LN              -> (H/4, W/4, C)
  4 encoder stages, dims (C, 2C, 4C, 8C), PatchMerging between
  bottleneck LN(8C)
  DualUpsample x2 (8C -> 4C)
  3 decoder stages with UNet skip concat + Linear(2D -> D)
  LN(C), DualUpsample x4 (C -> C) back to pixel res
  output conv 3x3 (C -> out_chans, no bias) -> raw logits

Deliberate reference-bug fixes (SURVEY §2 "known defects"):
  - use_checkpoint actually enables jax.checkpoint rematerialization per
    block (the reference's `u1se_checkpoint` typo made it dead, :597).
  - the model runs at any resolution divisible by patch_size * 2^(stages-1)
    * window granularity; masks/bias indices derive from static call-time
    shapes instead of ctor-time buffers.

Kept quirks (for parity):
  - global residual is NOT added (commented out in the reference, :754).
  - an unused top-level PReLU parameter exists (reference :609), kept so the
    parameter count (99,681,993 for the default config) and torch checkpoint
    import are exactly 1:1.
  - grayscale inputs are repeated to 3 channels when in_chans==3
    (reference model/SUNet.py:27-28).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import nnx

from sunet_tf_tpu.config import Config, SwinUNetConfig
from sunet_tf_tpu.models.layers import (
    Conv3x3,
    DualUpsample,
    Mlp,
    PatchEmbed,
    PatchMerging,
    PReLU,
    SwinBlock,
    _dropout,
    linear_init,
)


def _dpr_schedule(depths: tuple, drop_path_rate: float) -> list:
    """Global stochastic-depth schedule linspace(0, rate, sum(depths))
    (reference model/SUNet_detail.py:628)."""
    total = sum(depths)
    if total <= 1:
        return [0.0] * total
    return list(np.linspace(0.0, drop_path_rate, total))


class SwinStage(nnx.Module):
    """A stack of Swin blocks with alternating 0 / ws//2 shifts, plus an
    optional resampler (PatchMerging for the encoder, DualUpsample for the
    decoder). Covers reference BasicLayer (:389-445) and BasicLayer_up
    (:459-515)."""

    def __init__(self, dim: int, input_resolution: tuple, depth: int,
                 num_heads: int, *, window_size: int, mlp_ratio: float,
                 qkv_bias: bool, qk_scale: Optional[float], drop: float,
                 attn_drop: float, drop_path_rates: list,
                 resample: Optional[str] = None, use_checkpoint: bool = False,
                 backend: str = "xla", ablate: tuple = (),
                 dtype=None, rngs: nnx.Rngs):
        self.blocks = nnx.List([
            SwinBlock(
                dim, input_resolution, num_heads, window_size=window_size,
                shift_size=0 if i % 2 == 0 else window_size // 2,
                mlp_ratio=mlp_ratio, qkv_bias=qkv_bias, qk_scale=qk_scale,
                drop=drop, attn_drop=attn_drop,
                drop_path_rate=drop_path_rates[i], backend=backend,
                ablate=ablate, dtype=dtype, rngs=rngs)
            for i in range(depth)
        ])
        self.use_checkpoint = use_checkpoint
        if resample == "down":
            self.resample = PatchMerging(dim, dtype=dtype, rngs=rngs)
        elif resample == "up":
            self.resample = DualUpsample(dim, 2, dtype=dtype, rngs=rngs)
        else:
            self.resample = None

    def __call__(self, x: jnp.ndarray, key: Optional[jax.Array] = None,
                 runner=None) -> jnp.ndarray:
        # Spatially-sharded Pallas stage path (parallel.spatial.
        # PallasSpatialStageRunner): the whole block stack runs inside one
        # shard_map with per-shard fused kernels. Falls through to the
        # normal loop when the stage geometry/config rules it out.
        if (runner is not None and not self.use_checkpoint
                and runner.applies(self.blocks, x.shape, key is not None)):
            x = runner(self.blocks, x, key)
            if self.resample is not None:
                x = self.resample(x)
            return x
        from sunet_tf_tpu.models.layers import (
            chain_fusable_len,
            run_fused_chain,
        )

        blocks = list(self.blocks)
        i = 0
        while i < len(blocks):
            blk = blocks[i]
            bk = None if key is None else jax.random.fold_in(key, i)
            # Block-chain fusion (inference): K consecutive blocks as ONE
            # Pallas program — inter-block activations never cross HBM
            # (default K=2 W->SW pairs; SUNET_CHAIN_MAX raises)
            if key is None and not self.use_checkpoint:
                k = chain_fusable_len(blocks, i, x)
                if k >= 2:
                    x = run_fused_chain(blocks[i:i + k], x)
                    i += k
                    continue
            if self.use_checkpoint:
                gd, params = nnx.split(blk, nnx.Param)

                def run(p, xx, kk):
                    return nnx.merge(gd, p)(xx, kk)

                if bk is None:
                    x = jax.checkpoint(lambda p, xx: run(p, xx, None))(params, x)
                else:
                    x = jax.checkpoint(run)(params, x, bk)
            else:
                x = blk(x, bk)
            i += 1
        if self.resample is not None:
            x = self.resample(x)
        return x


class SUNet(nnx.Module):
    def __init__(self, cfg: SwinUNetConfig, *, dtype=None,
                 attention_backend: str = "xla", ablate: tuple = (),
                 rngs: nnx.Rngs):
        self.cfg = cfg
        backend = attention_backend
        self._ablate = tuple(ablate)
        C = cfg.emb_dim
        n = cfg.num_stages
        pres = cfg.patches_resolution
        dpr = _dpr_schedule(cfg.depth_en, cfg.drop_path_rate)
        depths = cfg.depth_en

        # Unused in forward; kept for 1:1 parameter parity with the
        # reference's stray nn.PReLU (model/SUNet_detail.py:609).
        self.prelu = PReLU(rngs=rngs)
        self.conv_first = Conv3x3(cfg.in_chans, C, use_bias=True, dtype=dtype, rngs=rngs)
        self.patch_embed = PatchEmbed(C, C, cfg.patch_size,
                                      patch_norm=cfg.patch_norm, dtype=dtype, rngs=rngs)
        if cfg.ape:
            self.absolute_pos_embed = nnx.Param(
                linear_init(rngs.params(), (1, pres[0], pres[1], C), jnp.float32))
        else:
            self.absolute_pos_embed = None
        self.drop_rate = cfg.drop_rate

        def stage_slice(i):
            return dpr[sum(depths[:i]):sum(depths[: i + 1])]

        # Encoder: stage i at dim C*2^i, res pres/2^i; merge after stages 0..n-2.
        self.layers = nnx.List([
            SwinStage(
                C * 2**i, (pres[0] // 2**i, pres[1] // 2**i), depths[i],
                cfg.head_num[i], window_size=cfg.win_size,
                mlp_ratio=cfg.mlp_ratio, qkv_bias=cfg.qkv_bias,
                qk_scale=cfg.qk_scale, drop=cfg.drop_rate,
                attn_drop=cfg.attn_drop_rate, drop_path_rates=stage_slice(i),
                resample="down" if i < n - 1 else None,
                use_checkpoint=cfg.use_checkpoint, backend=backend,
                ablate=ablate, dtype=dtype, rngs=rngs)
            for i in range(n)
        ])
        self.norm = nnx.LayerNorm(C * 2 ** (n - 1), epsilon=1e-5,
                                  dtype=jnp.float32, rngs=rngs)

        # Decoder. First hop is a bare DualUpsample x2 at the bottleneck
        # (reference layers_up[0], :655-657), then n-1 Swin stages with skip
        # concat + Linear(2D->D) (reference :659-675). Decoder stage j
        # mirrors encoder stage (n-2-j) and reuses its dpr slice.
        self.up_first = DualUpsample(C * 2 ** (n - 1), 2, dtype=dtype, rngs=rngs)
        self.concat_back_dim = nnx.List([])
        self.layers_up = nnx.List([])
        for j in range(n - 1):
            enc_i = n - 2 - j  # 2, 1, 0 for n=4
            dim = C * 2**enc_i
            res = (pres[0] // 2**enc_i, pres[1] // 2**enc_i)
            self.concat_back_dim.append(
                nnx.Linear(2 * dim, dim, kernel_init=linear_init,
                           dtype=dtype, rngs=rngs))
            self.layers_up.append(
                SwinStage(
                    dim, res, depths[enc_i], cfg.head_num[enc_i],
                    window_size=cfg.win_size, mlp_ratio=cfg.mlp_ratio,
                    qkv_bias=cfg.qkv_bias, qk_scale=cfg.qk_scale,
                    drop=cfg.drop_rate, attn_drop=cfg.attn_drop_rate,
                    drop_path_rates=stage_slice(enc_i),
                    resample="up" if j < n - 2 else None,
                    use_checkpoint=cfg.use_checkpoint, backend=backend,
                    ablate=ablate, dtype=dtype, rngs=rngs))
        self.norm_up = nnx.LayerNorm(C, epsilon=1e-5, dtype=jnp.float32, rngs=rngs)
        self.up_final = DualUpsample(C, 4, dtype=dtype, backend=backend,
                                     rngs=rngs)
        self.output = Conv3x3(C, cfg.out_chans, use_bias=False, dtype=dtype, rngs=rngs)
        self.compute_dtype = dtype

    def _stem(self, x: jnp.ndarray, constrained: bool = False) -> jnp.ndarray:
        """conv_first 3x3 (pad 1) + PatchEmbed conv (k=s=p, VALID) + LN.

        Default path folds the two convs into ONE composite (p+2)x(p+2)
        stride-p pad-1 conv: conv(conv(x, W1), W2) == conv(x, W1 ⊛ W2)
        because nothing nonlinear sits between them (the reference's
        top-level PReLU is a stray unused parameter,
        model/SUNet_detail.py:609,749; patch_embed applies directly at
        :750->:706-713). Measured on v5e @256² batch 32: the sequential
        path writes the (B, H, W, C) conv_first map to HBM (403 MB at
        batch 32) and reads it back through a {3,0,2,1} relayout —
        ~1.5 ms/iter of the inference step; the composite conv reads only
        the (B, H, W, in_chans) input. Weight-space fold costs ~8 MFLOP
        per step and autodiff routes gradients to BOTH parameter sets, so
        the fold is exact for training too (fp difference: the composite
        skips one bf16 rounding of the intermediate — strictly closer to
        the fp32 reference). SUNET_FUSED_STEM=0 opts out; the spatially
        constrained path keeps the sequential form (its sharding hooks
        pin the pixel-res intermediate).
        """
        if constrained or os.environ.get("SUNET_FUSED_STEM", "1") == "0":
            return self.patch_embed(self.conv_first(x))
        p = self.cfg.patch_size
        w1 = self.conv_first.conv.kernel[...]          # (3, 3, in, C) fp32
        b1 = self.conv_first.conv.bias[...]            # (C,)
        w2 = self.patch_embed.proj.kernel[...]         # (p, p, C, C)
        b2 = self.patch_embed.proj.bias[...]           # (C,)
        cin, C = w1.shape[2], w1.shape[3]
        wc = jnp.zeros((p + 2, p + 2, cin, C), jnp.float32)
        for pp in range(3):
            for q in range(3):
                wc = wc.at[pp:pp + p, q:q + p].add(
                    jnp.einsum("ac,ijco->ijao", w1[pp, q], w2))
        bc = jnp.einsum("c,ijco->o", b1, jnp.asarray(w2, jnp.float32)) + b2
        # Conv in the compute dtype (no preferred_element_type=fp32): the
        # MXU accumulates bf16 inputs in fp32 internally either way, and
        # the fp32-output form breaks under value_and_grad — JAX's conv
        # transpose rule feeds the fp32 cotangent against the bf16
        # operand and conv_general_dilated rejects mixed dtypes. The
        # bias add is lifted to fp32; the sequential path rounds to bf16
        # at the same point (conv_first's own bf16 output).
        y = jax.lax.conv_general_dilated(
            x, wc.astype(x.dtype), window_strides=(p, p),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        y = (y.astype(jnp.float32) + bc).astype(x.dtype)
        if self.patch_embed.norm is not None:
            y = self.patch_embed.norm(y).astype(y.dtype)
        return y

    def __call__(self, x: jnp.ndarray, key: Optional[jax.Array] = None,
                 constrain=None, stage_runner=None) -> jnp.ndarray:
        """x: (B, H, W, in_chans) in [0,1] -> (B, H, W, out_chans) raw logits.

        Pass ``key`` to enable dropout/stochastic-depth (training); omit it
        for deterministic (eval/inference) behavior.

        ``constrain`` (optional): activation -> activation hook applied at
        every stage boundary. Used by parallel.spatial.spatial_constrainer
        to pin intermediate shardings (H over the 'spatial' mesh axis
        where shards own whole window rows, data-only below) — GSPMD then
        partitions the stage math and inserts the halo collectives;
        semantics are unchanged by construction.

        ``stage_runner`` (optional): parallel.spatial.
        PallasSpatialStageRunner — routes eligible Swin stages through a
        shard_map with per-shard fused Pallas kernels (the spatial tier
        keeps the kernel path; GSPMD cannot partition a Mosaic custom
        call). Combine with ``constrain`` so the non-Swin layers stay
        GSPMD-partitioned between runner stages.
        """
        # compute_dtype float32 means FLOAT32: on TPU, XLA's DEFAULT
        # matmul/conv precision truncates fp32 operands to bf16 for the
        # MXU, which made the whole "fp32" forward effectively
        # bf16-input precision — a uniform ~1e-3 divergence from the
        # exact math that the round-5 fp64 oracle pinned to conv_first
        # (torch fp32 tracks its fp64 at 2e-7; ours sat at 1.1e-3).
        # HIGHEST = 3-pass bf16x3 ≈ true fp32 on the MXU; no-op on CPU
        # and for the bf16 shipping path (bf16 operands are native).
        if self.compute_dtype is None:
            with jax.default_matmul_precision("highest"):
                return self._forward(x, key, constrain, stage_runner)
        return self._forward(x, key, constrain, stage_runner)

    def _forward(self, x: jnp.ndarray, key, constrain, stage_runner) -> jnp.ndarray:
        cfg = self.cfg
        c = (lambda t: t) if constrain is None else constrain
        if x.shape[-1] == 1 and cfg.in_chans == 3:
            x = jnp.repeat(x, 3, axis=-1)
        if self.compute_dtype is not None:
            x = x.astype(self.compute_dtype)
        n = cfg.num_stages
        gran = cfg.patch_size * 2 ** (n - 1)
        assert x.shape[1] % gran == 0 and x.shape[2] % gran == 0, (
            f"input {x.shape[1]}x{x.shape[2]} must be divisible by {gran}")

        feats = c(self._stem(c(x), constrained=constrain is not None))
        if self.absolute_pos_embed is not None:
            feats = feats + self.absolute_pos_embed[...].astype(feats.dtype)
        if key is not None and self.drop_rate > 0:
            feats = _dropout(feats, self.drop_rate, jax.random.fold_in(key, 1000))

        skips = []
        for i, layer in enumerate(self.layers):
            skips.append(feats)
            feats = c(layer(feats, None if key is None else jax.random.fold_in(key, i),
                            runner=stage_runner))
        feats = self.norm(feats).astype(x.dtype)

        feats = c(self.up_first(feats))
        for j, layer_up in enumerate(self.layers_up):
            feats = jnp.concatenate([feats, skips[len(skips) - 1 - (j + 1)]], axis=-1)
            feats = self.concat_back_dim[j](feats)
            feats = c(layer_up(feats, None if key is None else jax.random.fold_in(key, 100 + j),
                               runner=stage_runner))
        feats = self.norm_up(feats).astype(x.dtype)

        # Fused up4 head by default in BOTH modes: +14% inference; train
        # 104.0 vs 107.9 ms/step b16 under the chained (single-jit)
        # harness — the per-step-dispatch harness that once suggested a
        # train regression under-counts device time through the remote
        # tunnel (see bench.bench_train). SUNET_UP4_FUSED_TRAIN=0 opts
        # the training path out.
        up4_train = os.environ.get("SUNET_UP4_FUSED_TRAIN", "1") == "1"
        # Default in BOTH modes: x4 head + output conv in ONE phase-space
        # kernel (the upsampled (B, 4H, 4W, C) map never exists — see
        # kernels/upsample.py). Inference uses the forward-only kernel;
        # training the custom-VJP variant (single-kernel backward too).
        # SUNET_UP4_CONV_FUSED=0 opts out entirely (split head below).
        if (constrain is None
                and getattr(self.up_final, "backend", "xla") == "pallas"
                and os.environ.get("SUNET_UP4_CONV_FUSED", "1") != "0"
                and os.environ.get("SUNET_UP4_FUSED", "1") != "0"
                and 16 * cfg.out_chans <= 128):
            wconv = self.output.conv.kernel[...].astype(feats.dtype)
            if key is None:
                out = self.up_final.fused_conv_head(feats, wconv)
                return out.astype(jnp.float32)
            # Training: same phase-space kernel behind a custom VJP whose
            # backward is a single kernel too — the split path's
            # (B, 4H, 4W, C) head output + XLA conv round trips cost
            # 6.2 ms of the 84.6 ms b16 train step (xprof, v5e).
            # SUNET_UP4_CONV_FUSED_TRAIN=0 opts out (falls through to the
            # split head + XLA output conv below).
            if (up4_train
                    and os.environ.get("SUNET_UP4_CONV_FUSED_TRAIN", "1")
                    == "1"):
                out = self.up_final.conv_head_trainable(feats, wconv)
                return out.astype(jnp.float32)
        feats = c(self.up_final(feats, fused=key is None or up4_train))
        out = self.output(feats)
        return out.astype(jnp.float32)

    def flops(self, resolution: Optional[tuple] = None) -> int:
        """Analytic forward FLOPs (multiply-accumulate counted as 2).

        Unlike the reference's flops() (which omits the decoder,
        model/SUNet_detail.py:757-764), this counts the full network.
        """
        cfg = self.cfg
        H = W = cfg.img_size
        if resolution is not None:
            H, W = resolution
        p = cfg.patch_size
        C = cfg.emb_dim
        n = cfg.num_stages
        total = 2 * H * W * 9 * cfg.in_chans * C  # conv_first
        hp, wp = H // p, W // p
        total += 2 * hp * wp * C * C * p * p  # patch embed

        def block_flops(h, w, D, heads, ws):
            nW = (h // ws) * (w // ws)
            N = ws * ws
            f = 2 * h * w * D * 3 * D          # qkv
            f += 2 * nW * heads * N * N * (D // heads) * 2  # qk^T and att@v
            f += 2 * h * w * D * D             # proj
            f += 2 * 2 * h * w * D * int(D * cfg.mlp_ratio)  # mlp
            return f

        def up_flops(h, w, D, factor):
            expand = 2 * D if factor == 2 else 16 * D
            out = D // 2 if factor == 2 else D
            f = 2 * h * w * D * expand
            f += 2 * (h * factor) * (w * factor) * out * out  # up_p conv2
            f += 2 * h * w * D * D + 2 * (h * factor) * (w * factor) * D * out
            f += 2 * (h * factor) * (w * factor) * (2 * out) * out  # mix
            return f

        for i in range(n):
            h, w, D = hp // 2**i, wp // 2**i, C * 2**i
            ws = min(cfg.win_size, h, w)
            total += cfg.depth_en[i] * block_flops(h, w, D, cfg.head_num[i], ws)
            if i < n - 1:
                total += 2 * (h // 2) * (w // 2) * 4 * D * 2 * D  # merge
        bh, bw, bD = hp // 2 ** (n - 1), wp // 2 ** (n - 1), C * 2 ** (n - 1)
        total += up_flops(bh, bw, bD, 2)
        for j in range(n - 1):
            enc_i = n - 2 - j
            h, w, D = hp // 2**enc_i, wp // 2**enc_i, C * 2**enc_i
            ws = min(cfg.win_size, h, w)
            total += 2 * h * w * 2 * D * D  # concat_back_dim
            total += cfg.depth_en[enc_i] * block_flops(h, w, D, cfg.head_num[enc_i], ws)
            if j < n - 2:
                total += up_flops(h, w, D, 2)
        total += up_flops(hp, wp, C, 4)
        total += 2 * H * W * 9 * C * cfg.out_chans  # output conv
        return int(total)


def build_model(cfg: Config, seed: int = 0) -> SUNet:
    """Build a SUNet from a full Config (compute dtype from cfg.tpu)."""
    dtype = {"bfloat16": jnp.bfloat16, "float32": None,
             "float16": jnp.float16}.get(cfg.tpu.compute_dtype, None)
    backend = cfg.tpu.attention_backend
    if backend == "auto":
        backend = "pallas" if jax.default_backend() == "tpu" else "xla"
    return SUNet(cfg.swinunet, dtype=dtype,
                 attention_backend=backend,
                 rngs=nnx.Rngs(seed))


def param_count(model: nnx.Module) -> int:
    state = nnx.state(model, nnx.Param)
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(state))
