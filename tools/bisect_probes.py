#!/usr/bin/env python
"""Phase (b) of the fp64 bisection: layer-probe comparison.

Runs the trained checkpoint through our fp32 XLA forward (decomposed
into submodule probes) and through the torch reference in float64 with
forward hooks, then reports the relative divergence at every pipeline
point — the first probe that jumps above fp32 noise is the culprit.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from tools.parity_run import build_cfg, make_data


def torch_probes(params_model, x_np):
    import torch

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    "..", "tests"))
    from test_reference_parity import _import_reference_sunet

    from tools.export_torch_checkpoint import params_to_state_dict

    RefSUNet = _import_reference_sunet()
    ref = RefSUNet(img_size=256, patch_size=4, in_chans=3, out_chans=3,
                   embed_dim=96, depths=[8, 8, 8, 8], num_heads=[8, 8, 8, 8],
                   window_size=8, mlp_ratio=4.0, qkv_bias=True, qk_scale=8,
                   drop_rate=0.0, attn_drop_rate=0.0,
                   drop_path_rate=0.1).eval()
    sd = {k.removeprefix("swin_unet."): torch.from_numpy(np.ascontiguousarray(v))
          for k, v in params_to_state_dict(params_model).items()}
    ref.load_state_dict(sd, strict=True)
    ref = ref.double()

    probes = {}

    def hook(name):
        def fn(mod, inp, out):
            probes[name] = out.detach().cpu().numpy()
        return fn

    ref.conv_first.register_forward_hook(hook("conv_first"))
    ref.patch_embed.register_forward_hook(hook("patch_embed"))
    for i, layer in enumerate(ref.layers):
        layer.register_forward_hook(hook(f"enc{i}"))
    ref.norm.register_forward_hook(hook("norm"))
    for i, layer in enumerate(ref.layers_up):
        layer.register_forward_hook(hook(f"up{i}"))
    ref.norm_up.register_forward_hook(hook("norm_up"))
    ref.up.register_forward_hook(hook("up4"))
    with torch.no_grad():
        out = ref(torch.from_numpy(x_np).permute(0, 3, 1, 2).double())
    probes["final"] = out.cpu().numpy()
    return probes


def main():
    import jax
    import jax.numpy as jnp
    from flax import nnx

    from sunet_tf_tpu.ckpt import latest_path, restore_checkpoint
    from sunet_tf_tpu.data.pipeline import PairDataset, batch_iterator
    from sunet_tf_tpu.models.sunet import build_model
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    os.environ["SUNET_FUSED_STEM"] = "0"
    os.environ["SUNET_UP4_CONV_FUSED"] = "0"
    os.environ["SUNET_UP4_FUSED"] = "0"

    tdir, vdir = make_data("/tmp/parity_data", 400, 8)

    class A:
        batch, epochs, steps_per_epoch, val_every = 4, 40, 250, 10
        out = "runs/parity"

    cfg = build_cfg(A, tdir, vdir)
    val_ds = PairDataset(vdir, patch_size=256, train=False)
    batches = list(batch_iterator(val_ds, 1, shuffle=False))
    noisy = batches[1]["input"].astype(np.float32) / 255.0  # worst image

    cfg_x = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                              attention_backend="xla"))
    model = build_model(cfg_x, seed=0)
    gd, params = nnx.split(model, nnx.Param)
    p = latest_path(os.path.join("runs/parity", "Denoising", "models"))
    params = restore_checkpoint(p, params)["params"]

    def probes_fn(pp, x):
        m = nnx.merge(gd, pp)
        out = {}
        cf = m.conv_first(x)
        out["conv_first"] = cf
        feats = m.patch_embed(cf)
        out["patch_embed"] = feats
        skips = []
        for i, layer in enumerate(m.layers):
            skips.append(feats)
            feats = layer(feats)
            out[f"enc{i}"] = feats
        feats = m.norm(feats).astype(x.dtype)
        out["norm"] = feats
        feats = m.up_first(feats)
        out["up0"] = feats
        for j, layer_up in enumerate(m.layers_up):
            feats = jnp.concatenate(
                [feats, skips[len(skips) - 1 - (j + 1)]], axis=-1)
            feats = m.concat_back_dim[j](feats)
            feats = layer_up(feats)
            out[f"up{j + 1}"] = feats
        feats = m.norm_up(feats).astype(x.dtype)
        out["norm_up"] = feats
        up = m.up_final(feats)
        out["up4"] = up
        out["final"] = m.output(up)
        return out

    ours = jax.jit(probes_fn)(params, jnp.asarray(noisy))
    ours = {k: np.asarray(v, np.float64) for k, v in ours.items()}
    print("# ours probes done", flush=True)
    tp = torch_probes(nnx.merge(gd, params), noisy)
    print("# torch fp64 probes done", flush=True)

    def to_nhwc(name, a):
        # torch layouts: conv_first (B,C,H,W); tokens (B,L,C); up4
        # (B,4H,4W,C) BHWC? up_x4 permutes after; the UpSample module
        # returns channels-last? match by shape instead.
        return a

    for name in ["conv_first", "patch_embed", "enc0", "enc1", "enc2",
                 "enc3", "norm", "up0", "up1", "up2", "up3", "norm_up",
                 "up4", "final"]:
        a = ours.get(name)
        b = tp.get(name)
        if a is None or b is None:
            print(f"{name:12s} missing ({a is None}, {b is None})")
            continue
        a2 = a
        if a.shape != b.shape:
            # try NHWC->NCHW and NHWC->tokens
            if b.ndim == 4 and a.ndim == 4 and a.shape[3] == b.shape[1]:
                a2 = a.transpose(0, 3, 1, 2)
            elif b.ndim == 3 and a.ndim == 4:
                a2 = a.reshape(a.shape[0], -1, a.shape[-1])
            elif b.ndim == 4 and a.ndim == 3 and b.shape[1] == a.shape[-1]:
                a2 = a  # handled below if still mismatched
        if a2.shape != b.shape:
            print(f"{name:12s} shape mismatch ours{a.shape} torch{b.shape}")
            continue
        scale = np.mean(np.abs(b)) + 1e-12
        d = np.mean(np.abs(a2 - b))
        print(f"{name:12s} rel={d/scale:.3e}  mean|d|={d:.3e} "
              f"mean|ref|={scale:.3e}", flush=True)


if __name__ == "__main__":
    main()
