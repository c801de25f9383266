#!/usr/bin/env python
"""Export this framework's params to a reference-format torch .pth.

Inverse of import_torch_checkpoint.py: writes {'epoch', 'state_dict'} with
keys under 'swin_unet.' exactly as the reference saves them
(train.py:720-725), so models trained here can be loaded by the original
torch codebase (demo.py:33-43 loaders).

Usage:
  python tools/export_torch_checkpoint.py --ckpt ckpt/.../models/latest \
      --config training.yaml --out model_latest.pth
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def params_to_state_dict(model) -> dict:
    """nnx SUNet -> reference-keyed numpy state_dict (torch layouts)."""
    sd = {}

    def put(key, arr):
        sd[key] = np.asarray(arr)

    def put_linear(mod, key):
        put(f"{key}.weight", np.transpose(mod.kernel[...], (1, 0)))
        if mod.bias is not None:
            put(f"{key}.bias", mod.bias[...])

    def put_ln(mod, key):
        put(f"{key}.weight", mod.scale[...])
        put(f"{key}.bias", mod.bias[...])

    def put_conv(mod, key, bias):
        put(f"{key}.weight", np.transpose(mod.conv.kernel[...], (3, 2, 0, 1)))
        if bias:
            put(f"{key}.bias", mod.conv.bias[...])

    def put_c1(mod, key, bias):
        w = np.transpose(mod.lin.kernel[...], (1, 0))[:, :, None, None]
        put(f"{key}.weight", w)
        if bias:
            put(f"{key}.bias", mod.lin.bias[...])

    def put_block(blk, key, resolution):
        from sunet_tf_tpu.ops.window import relative_position_index, shift_attn_mask

        put_ln(blk.norm1, f"{key}.norm1")
        put(f"{key}.attn.relative_position_bias_table",
            blk.attn.relative_position_bias_table[...])
        ws = blk.attn.window_size
        put(f"{key}.attn.relative_position_index",
            relative_position_index(ws, ws).astype(np.int64))
        if blk.shift_size > 0:
            # reference registers the ctor-time SW-MSA mask as a buffer
            put(f"{key}.attn_mask",
                shift_attn_mask(resolution[0], resolution[1], ws,
                                blk.shift_size))
        put_linear(blk.attn.qkv, f"{key}.attn.qkv")
        put_linear(blk.attn.proj, f"{key}.attn.proj")
        put_ln(blk.norm2, f"{key}.norm2")
        put_linear(blk.mlp.fc1, f"{key}.mlp.fc1")
        put_linear(blk.mlp.fc2, f"{key}.mlp.fc2")

    def put_upsample(up, key):
        put_c1(up.mix, f"{key}.conv", bias=False)
        put_c1(up.up_p_conv1, f"{key}.up_p.0", bias=False)
        put(f"{key}.up_p.1.weight", up.up_p_act.alpha[...])
        put_c1(up.up_p_conv2, f"{key}.up_p.3", bias=False)
        put_c1(up.up_b_conv1, f"{key}.up_b.0", bias=True)
        put(f"{key}.up_b.1.weight", up.up_b_act.alpha[...])
        put_c1(up.up_b_conv2, f"{key}.up_b.3", bias=False)

    put("prelu.weight", model.prelu.alpha[...])
    put_conv(model.conv_first, "conv_first", bias=True)
    put("patch_embed.proj.weight",
        np.transpose(model.patch_embed.proj.kernel[...], (3, 2, 0, 1)))
    put("patch_embed.proj.bias", model.patch_embed.proj.bias[...])
    if model.patch_embed.norm is not None:
        put_ln(model.patch_embed.norm, "patch_embed.norm")
    if model.absolute_pos_embed is not None:
        ape = np.asarray(model.absolute_pos_embed[...])
        put("absolute_pos_embed", ape.reshape(1, -1, ape.shape[-1]))

    cfg = model.cfg
    pres = cfg.patches_resolution
    for i, layer in enumerate(model.layers):
        res = (pres[0] // 2**i, pres[1] // 2**i)
        for j, blk in enumerate(layer.blocks):
            put_block(blk, f"layers.{i}.blocks.{j}", res)
        if layer.resample is not None:
            put_ln(layer.resample.norm, f"layers.{i}.downsample.norm")
            put_linear(layer.resample.reduction, f"layers.{i}.downsample.reduction")
    put_ln(model.norm, "norm")

    put_upsample(model.up_first, "layers_up.0")
    n = cfg.num_stages
    for j, stage in enumerate(model.layers_up):
        t = j + 1
        enc_i = n - 2 - j
        res = (pres[0] // 2**enc_i, pres[1] // 2**enc_i)
        put_linear(model.concat_back_dim[j], f"concat_back_dim.{t}")
        for b, blk in enumerate(stage.blocks):
            put_block(blk, f"layers_up.{t}.blocks.{b}", res)
        if stage.resample is not None:
            put_upsample(stage.resample, f"layers_up.{t}.upsample")
    put_ln(model.norm_up, "norm_up")
    put_upsample(model.up_final, "up")
    put("output.weight", np.transpose(model.output.conv.kernel[...], (3, 2, 0, 1)))
    # the reference wraps the model as SUNet_model.swin_unet
    return {f"swin_unet.{k}": v for k, v in sd.items()}


def main():
    import argparse

    p = argparse.ArgumentParser(description="Export to torch .pth")
    p.add_argument("--ckpt", required=True, help="Orbax checkpoint dir")
    p.add_argument("--config", default="training.yaml")
    p.add_argument("--out", required=True)
    args = p.parse_args()

    import torch
    from flax import nnx

    from sunet_tf_tpu.ckpt import restore_checkpoint
    from sunet_tf_tpu.config import Config, load_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = load_config(args.config) if os.path.exists(args.config) else Config()
    model = build_model(cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32")))
    graphdef, params = nnx.split(model, nnx.Param)
    restored = restore_checkpoint(args.ckpt, params)
    model = nnx.merge(graphdef, restored["params"])
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(model).items()}
    torch.save({"epoch": restored["epoch"], "state_dict": sd}, args.out)
    print(f"exported {len(sd)} tensors (epoch {restored['epoch']}) -> {args.out}")


if __name__ == "__main__":
    main()
