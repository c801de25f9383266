#!/usr/bin/env python
"""Convert a reference torch checkpoint (.pth) into this framework's params.

The reference saves {'epoch', 'state_dict', 'optimizer'} (train.py:720-725)
with optional DataParallel 'module.' prefixes (utils/model_utils.py:27-47)
and model keys under 'swin_unet.' (model/SUNet.py:9). This maps every torch
tensor 1:1 onto the nnx parameter tree (the architectures are parameter-
identical, including the vestigial top-level PReLU).

Layout conversions:
  torch Conv2d weight (O, I, kh, kw) -> flax kernel (kh, kw, I, O)
  torch 1x1 Conv2d    (O, I, 1, 1)  -> Linear kernel (I, O)
  torch Linear weight (O, I)        -> Linear kernel (I, O)
  LayerNorm weight/bias             -> scale/bias

Usage:
  python tools/import_torch_checkpoint.py --pth model_latest.pth \
      --config training.yaml --out ckpt_dir/imported
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def strip_prefixes(state_dict: dict) -> dict:
    """Remove DataParallel 'module.' and wrapper 'swin_unet.' prefixes."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("module."):
            k = k[len("module."):]
        if k.startswith("swin_unet."):
            k = k[len("swin_unet."):]
        out[k] = v
    return out


def _conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _linear_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def _conv1x1_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w[:, :, 0, 0], (1, 0))


def torch_to_params(state_dict: dict, model) -> "object":
    """Fill an nnx SUNet's Param state from a reference state_dict.

    Returns the new params State; raises if any tensor is unmapped on
    either side.
    """
    from flax import nnx

    sd = {k: np.asarray(v) for k, v in strip_prefixes(state_dict).items()}
    used = set()

    def take(key: str) -> np.ndarray:
        used.add(key)
        return sd[key]

    def fill_linear(mod, key: str, bias: bool = True):
        mod.kernel[...] = _linear_kernel(take(f"{key}.weight"))
        if bias and mod.bias is not None:
            mod.bias[...] = take(f"{key}.bias")

    def fill_ln(mod, key: str):
        mod.scale[...] = take(f"{key}.weight")
        mod.bias[...] = take(f"{key}.bias")

    def fill_conv(mod, key: str, bias: bool):
        mod.conv.kernel[...] = _conv_kernel(take(f"{key}.weight"))
        if bias:
            mod.conv.bias[...] = take(f"{key}.bias")

    def fill_c1(mod, key: str, bias: bool):
        mod.lin.kernel[...] = _conv1x1_kernel(take(f"{key}.weight"))
        if bias:
            mod.lin.bias[...] = take(f"{key}.bias")

    def fill_block(blk, key: str):
        fill_ln(blk.norm1, f"{key}.norm1")
        blk.attn.relative_position_bias_table[...] = take(
            f"{key}.attn.relative_position_bias_table")
        used.add(f"{key}.attn.relative_position_index")  # buffer, recomputed
        fill_linear(blk.attn.qkv, f"{key}.attn.qkv")
        fill_linear(blk.attn.proj, f"{key}.attn.proj")
        fill_ln(blk.norm2, f"{key}.norm2")
        fill_linear(blk.mlp.fc1, f"{key}.mlp.fc1")
        fill_linear(blk.mlp.fc2, f"{key}.mlp.fc2")

    def fill_upsample(up, key: str):
        fill_c1(up.mix, f"{key}.conv", bias=False)
        fill_c1(up.up_p_conv1, f"{key}.up_p.0", bias=False)
        up.up_p_act.alpha[...] = take(f"{key}.up_p.1.weight")
        fill_c1(up.up_p_conv2, f"{key}.up_p.3", bias=False)
        fill_c1(up.up_b_conv1, f"{key}.up_b.0", bias=True)
        up.up_b_act.alpha[...] = take(f"{key}.up_b.1.weight")
        fill_c1(up.up_b_conv2, f"{key}.up_b.3", bias=False)

    model.prelu.alpha[...] = take("prelu.weight")
    fill_conv(model.conv_first, "conv_first", bias=True)
    model.patch_embed.proj.kernel[...] = _conv_kernel(take("patch_embed.proj.weight"))
    model.patch_embed.proj.bias[...] = take("patch_embed.proj.bias")
    if model.patch_embed.norm is not None:
        fill_ln(model.patch_embed.norm, "patch_embed.norm")
    if model.absolute_pos_embed is not None:
        ape = take("absolute_pos_embed")  # (1, L, C) -> (1, H, W, C)
        _, hp, wp, c = model.absolute_pos_embed.shape
        model.absolute_pos_embed[...] = ape.reshape(1, hp, wp, c)

    for i, layer in enumerate(model.layers):
        for j, blk in enumerate(layer.blocks):
            fill_block(blk, f"layers.{i}.blocks.{j}")
        if layer.resample is not None:
            fill_ln(layer.resample.norm, f"layers.{i}.downsample.norm")
            fill_linear(layer.resample.reduction,
                        f"layers.{i}.downsample.reduction", bias=False)
    fill_ln(model.norm, "norm")

    fill_upsample(model.up_first, "layers_up.0")
    for j, stage in enumerate(model.layers_up):
        t = j + 1  # torch decoder index
        fill_linear(model.concat_back_dim[j], f"concat_back_dim.{t}")
        for b, blk in enumerate(stage.blocks):
            fill_block(blk, f"layers_up.{t}.blocks.{b}")
        if stage.resample is not None:
            fill_upsample(stage.resample, f"layers_up.{t}.upsample")
    fill_ln(model.norm_up, "norm_up")
    fill_upsample(model.up_final, "up")
    model.output.conv.kernel[...] = _conv_kernel(take("output.weight"))

    leftovers = {k for k in sd if k not in used
                 and not k.endswith("relative_position_index")
                 and not k.endswith("attn_mask")}
    if leftovers:
        raise ValueError(f"unmapped torch tensors: {sorted(leftovers)[:10]} "
                         f"(+{max(0, len(leftovers) - 10)} more)")
    from flax import nnx as _nnx

    return _nnx.state(model, _nnx.Param)


def main():
    import argparse

    p = argparse.ArgumentParser(description="Import reference .pth checkpoint")
    p.add_argument("--pth", required=True)
    p.add_argument("--config", default="training.yaml")
    p.add_argument("--out", required=True, help="output Orbax checkpoint dir")
    args = p.parse_args()

    import torch

    from sunet_tf_tpu.ckpt import save_checkpoint
    from sunet_tf_tpu.config import Config, load_config
    from sunet_tf_tpu.models.sunet import build_model

    cfg = load_config(args.config) if os.path.exists(args.config) else Config()
    model = build_model(cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32")))
    ck = torch.load(args.pth, map_location="cpu")
    sd = ck.get("state_dict", ck)
    sd = {k: v.numpy() for k, v in sd.items()}
    params = torch_to_params(sd, model)
    epoch = int(ck.get("epoch", 0))
    out_dir, name = os.path.split(os.path.abspath(args.out))
    path = save_checkpoint(out_dir, name, params, epoch=epoch)
    print(f"imported {args.pth} (epoch {epoch}) -> {path}")


if __name__ == "__main__":
    main()
