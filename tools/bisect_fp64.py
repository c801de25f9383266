#!/usr/bin/env python
"""Bisect the ~1e-3 uniform divergence between our forward and the
torch-double oracle (tools/fp64_oracle.py verdict: ours is the diverging
side). Strategy: (a) toggle the two model-level algebraic rewrites that
BOTH our backends share (fused stem, phase-space up4+conv head) and see
which closes the gap vs torch fp64; (b) if neither, compare layer-probe
intermediates to find the first divergence point.

Usage: python tools/bisect_fp64.py [--out runs/parity]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from tools.fp64_oracle import torch_eval
from tools.parity_run import build_cfg, make_data, np_psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/parity_data")
    ap.add_argument("--out", default="runs/parity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from sunet_tf_tpu.ckpt import latest_path, restore_checkpoint
    from sunet_tf_tpu.data.pipeline import PairDataset, batch_iterator
    from sunet_tf_tpu.models.sunet import build_model
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    tdir, vdir = make_data(args.data, 400, 8)

    class A:
        batch, epochs, steps_per_epoch, val_every = 4, 40, 250, 10
        out = args.out

    cfg = build_cfg(A, tdir, vdir)
    val_ds = PairDataset(vdir, patch_size=256, train=False)
    batches = list(batch_iterator(val_ds, 1, shuffle=False))
    idx = [1, 2]
    targets = np.concatenate([batches[i]["target"] for i in idx]).astype(
        np.float32) / 255.0
    noisy = np.concatenate([batches[i]["input"] for i in idx]).astype(
        np.float32) / 255.0

    cfg_x = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                              attention_backend="xla"))
    model = build_model(cfg_x, seed=0)
    gd, params = nnx.split(model, nnx.Param)
    p = latest_path(os.path.join(args.out, "Denoising", "models"))
    params = restore_checkpoint(p, params)["params"]

    # torch fp64 oracle outputs (cache to disk — 5 min per run)
    cache = "/tmp/torch64_imgs12.npy"
    if os.path.exists(cache):
        torch64 = np.load(cache)
    else:
        torch64 = torch_eval(nnx.merge(gd, params),
                             [noisy[i:i + 1] for i in range(len(noisy))],
                             double=True)
        np.save(cache, torch64)

    def run_variant(env: dict):
        for k, v in env.items():
            os.environ[k] = v
        try:
            out = jax.jit(lambda pp, xx: nnx.merge(gd, pp)(xx))(
                params, jnp.asarray(noisy))
            return np.asarray(out, np.float64)
        finally:
            for k in env:
                os.environ.pop(k, None)

    variants = {
        "default": {},
        "no_fused_stem": {"SUNET_FUSED_STEM": "0"},
        "no_up4_conv": {"SUNET_UP4_CONV_FUSED": "0"},
        "no_up4_any": {"SUNET_UP4_CONV_FUSED": "0", "SUNET_UP4_FUSED": "0"},
        "neither": {"SUNET_FUSED_STEM": "0", "SUNET_UP4_CONV_FUSED": "0",
                    "SUNET_UP4_FUSED": "0"},
    }
    report = {}
    for name, env in variants.items():
        out = run_variant(env)
        d = float(np.mean(np.abs(out - torch64)))
        psnr = [round(float(v), 4) for v in np_psnr(targets, out)]
        report[name] = {"mean_abs_vs_fp64": d, "psnr": psnr}
        print(f"{name:16s} mean|out-torch64| = {d:.3e}  psnr={psnr}",
              flush=True)
    psnr64 = [round(float(v), 4)
              for v in np_psnr(targets, torch64.astype(np.float32))]
    print("fp64 oracle psnr:", psnr64)
    report["fp64_psnr"] = psnr64
    with open("/tmp/bisect_fp64.json", "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
