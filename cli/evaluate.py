#!/usr/bin/env python
"""Directory-vs-directory PSNR/SSIM evaluation (reference evaluation.m
equivalent, no MATLAB required).

Protocol (evaluation.m:42-64): per image, PSNR on RGB in [0,1]; SSIM on
grayscale; report per-image values and the directory means. Pairs files by
natural-sorted order.

    python cli/evaluate.py --gt_dir GT/ --pred_dir results/ [--noisy_dir N/]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def _list(d):
    from sunet_tf_tpu.data.pipeline import natural_sorted

    return natural_sorted(
        f for f in glob.glob(os.path.join(d, "*.*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))


def main():
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="PSNR/SSIM directory evaluation")
    p.add_argument("--gt_dir", required=True)
    p.add_argument("--pred_dir", required=True)
    p.add_argument("--noisy_dir", default=None,
                   help="also report the degraded baseline like evaluation.m")
    args = p.parse_args()

    import jax.numpy as jnp
    from PIL import Image

    from sunet_tf_tpu.ops.image import psnr, rgb_to_gray, ssim

    def load(f):
        return np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0

    gts, preds = _list(args.gt_dir), _list(args.pred_dir)
    assert len(gts) == len(preds), f"{len(gts)} GT vs {len(preds)} predictions"
    noisies = _list(args.noisy_dir) if args.noisy_dir else [None] * len(gts)

    rows = []
    for g, pr, nz in zip(gts, preds, noisies):
        gt, pd = jnp.asarray(load(g))[None], jnp.asarray(load(pr))[None]
        row = {
            "name": os.path.basename(g),
            "psnr": float(psnr(gt, pd)),
            "ssim": float(ssim(rgb_to_gray(gt), rgb_to_gray(pd))),
        }
        if nz:
            nzi = jnp.asarray(load(nz))[None]
            row["psnr_noisy"] = float(psnr(gt, nzi))
            row["ssim_noisy"] = float(ssim(rgb_to_gray(gt), rgb_to_gray(nzi)))
        rows.append(row)
        extra = (f"  (noisy: {row['psnr_noisy']:.2f}/{row['ssim_noisy']:.4f})"
                 if nz else "")
        print(f"{row['name']}: PSNR {row['psnr']:.2f} dB  SSIM {row['ssim']:.4f}{extra}")

    print("-" * 60)
    print(f"mean PSNR: {np.mean([r['psnr'] for r in rows]):.4f} dB")
    print(f"mean SSIM: {np.mean([r['ssim'] for r in rows]):.4f}")
    if args.noisy_dir:
        print(f"mean noisy PSNR: {np.mean([r['psnr_noisy'] for r in rows]):.4f} dB")
        print(f"mean noisy SSIM: {np.mean([r['ssim_noisy'] for r in rows]):.4f}")


if __name__ == "__main__":
    main()
