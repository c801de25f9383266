#!/usr/bin/env python
"""The M7 parity run: train the reference recipe end to end, then validate
the trained checkpoint across implementations (BASELINE.json north star:
"sigma=50 PSNR within 0.05 dB of reference").

The environment has no egress, so DIV2K cannot be fetched — the run uses a
deterministic procedural natural-image corpus (sunet_tf_tpu/data/synth.py)
instead. That substitution does NOT weaken the parity statement, which is
about math, not a corpus: the trained weights are exported to a reference
-format .pth and run through the ACTUAL torch reference implementation
(/root/reference/model/SUNet_detail.py, imported read-only) on identical
noisy inputs; PSNR must agree within 0.05 dB per image.

Also validated on the trained weights (VERDICT round-1 items):
- fused Pallas path vs XLA path output agreement (the shifted-softmax /
  tanh-GELU approximations under trained magnitudes);
- pre-mask attention logit extrema inside the shifted-softmax exact band
  (-47, 80] (QK_SCALE=8 logit-explosion concern).

Usage (defaults give a ~15 min run on v5e):
  python tools/parity_run.py [--steps-per-epoch 250] [--epochs 40]
      [--data /tmp/parity_data] [--out runs/parity]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

SIGMA = 50.0


def make_data(root: str, n_train: int, n_val: int):
    from sunet_tf_tpu.data.synth import generate_dataset

    tdir, vdir = os.path.join(root, "train"), os.path.join(root, "val")
    if not os.path.isdir(os.path.join(tdir, "input")):
        t0 = time.time()
        generate_dataset(tdir, n_train, 256, seed=1, pair_mode="same")
        # fixed noise on the val split (the reference evaluated on
        # offline-prepared noisy/clean pairs)
        generate_dataset(vdir, n_val, 256, seed=2, pair_mode="awgn",
                         sigma=SIGMA)
        print(f"# data: {n_train}+{n_val} images in {time.time()-t0:.0f}s")
    return tdir, vdir


def build_cfg(args, tdir, vdir, backend="pallas"):
    from sunet_tf_tpu.config import Config

    cfg = Config()
    # the reference recipe (training.yaml:28-44): batch 4, Adam 2e-4 ->
    # 1e-6, 3-epoch warmup + cosine, 256^2 patches, seed 85 — epoch count
    # shortened from 500 (wall-clock bound), cosine T_max follows.
    cfg = cfg.replace(
        swinunet=cfg.swinunet.__class__(
            **{**cfg.swinunet.__dict__, "out_chans": 3}),
        optim=cfg.optim.__class__(batch=args.batch, epochs=args.epochs,
                                  lr_initial=2e-4, lr_min=1e-6,
                                  warmup_epochs=3),
        training=cfg.training.__class__(
            train_ps=256, val_ps=256, train_dir=tdir, val_dir=vdir,
            save_dir=args.out, seed=85, val_after_every=args.val_every,
            steps_per_epoch=args.steps_per_epoch),
        tpu=cfg.tpu.__class__(compute_dtype="bfloat16",
                              attention_backend=backend),
    )
    return cfg


def eval_backend(cfg, params, backend: str, dtype: str):
    """Val PSNR/SSIM of `params` under a given attention backend/dtype."""
    from sunet_tf_tpu.train.trainer import Trainer

    cfg_b = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype=dtype,
                                              attention_backend=backend))
    t = Trainer(cfg_b, task="denoise", sigma=SIGMA, verbose=False)
    t.params = params
    out = t.eval_epoch(t.val_ds)
    out.pop("_hists", None)
    return out


def torch_reference_eval(params_model, val_batches):
    """Export trained params -> torch .pth -> run the ACTUAL reference
    implementation on the same noisy inputs; per-image outputs + PSNR."""
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
    outs = []
    with torch.no_grad():
        for x in val_batches:  # (1, H, W, 3) float32 in [0,1]
            t = torch.from_numpy(x).permute(0, 3, 1, 2)
            y = ref(t).permute(0, 2, 3, 1).numpy()
            outs.append(y)
    return np.concatenate(outs, 0)


def np_psnr(target, pred):
    """Reference PSNR math (utils/image_utils.py:6-10), numpy."""
    t = np.clip(target, 0.0, 1.0)
    p = np.clip(pred, 0.0, 1.0)
    rmse = np.sqrt(np.mean((t - p) ** 2, axis=(1, 2, 3)))
    return 20.0 * np.log10(1.0 / np.maximum(rmse, 1e-12))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/parity_data")
    ap.add_argument("--out", default="runs/parity")
    ap.add_argument("--n-train", type=int, default=400)
    ap.add_argument("--n-val", type=int, default=8)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--steps-per-epoch", type=int, default=250)
    ap.add_argument("--val-every", type=int, default=10)
    ap.add_argument("--skip-train", action="store_true",
                    help="resume/evaluate an existing checkpoint")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from flax import nnx

    from sunet_tf_tpu.data.pipeline import PairDataset, batch_iterator
    from sunet_tf_tpu.models.sunet import build_model
    from sunet_tf_tpu.obs import attention_logit_stats
    from sunet_tf_tpu.train.trainer import Trainer

    tdir, vdir = make_data(args.data, args.n_train, args.n_val)
    cfg = build_cfg(args, tdir, vdir)
    results = {"recipe": {"batch": args.batch, "epochs": args.epochs,
                          "steps_per_epoch": args.steps_per_epoch,
                          "sigma": SIGMA, "lr": [2e-4, 1e-6], "warmup": 3}}

    t = Trainer(cfg, task="denoise", sigma=SIGMA, verbose=True)
    if args.skip_train:
        from sunet_tf_tpu.ckpt import latest_path, restore_checkpoint

        p = latest_path(t.model_dir)
        assert p, "no checkpoint to evaluate"
        t.params = restore_checkpoint(p, t.params)["params"]
    else:
        t0 = time.time()
        summary = t.fit()
        results["train_time_s"] = round(time.time() - t0, 1)
        results["best"] = summary["best"]

    params = t.params
    val_ds = t.val_ds

    # ---- backend cross-check on the trained weights
    for backend in ("pallas", "xla"):
        ev = eval_backend(cfg, params, backend, "bfloat16")
        results[f"val_{backend}"] = {k: round(float(v), 4)
                                     for k, v in ev.items()}
        print(f"# val[{backend}]: {results[f'val_{backend}']}")

    # ---- per-image outputs: pallas/xla (fp32 for the dB gate, bf16 for
    # the deployment path) vs the torch reference (fp32, like its GPUs)
    targets = np.concatenate(
        [b["target"].astype(np.float32) / 255.0
         for b in batch_iterator(val_ds, 1, shuffle=False)], 0)
    noisy = np.concatenate(
        [b["input"].astype(np.float32) / 255.0
         for b in batch_iterator(val_ds, 1, shuffle=False)], 0)

    outs = {}
    for backend in ("pallas", "xla"):
        for dtype in ("float32", "bfloat16"):
            cfg_b = cfg.replace(tpu=cfg.tpu.__class__(
                compute_dtype=dtype, attention_backend=backend))
            model = build_model(cfg_b, seed=0)
            gd, _ = nnx.split(model, nnx.Param)
            fwd = jax.jit(lambda p, x: nnx.merge(gd, p)(x))
            outs[f"{backend}_{dtype}"] = np.asarray(
                fwd(params, jnp.asarray(noisy)), dtype=np.float32)
    results["pallas_vs_xla_mean_abs"] = {
        dt: float(np.mean(np.abs(outs[f"pallas_{dt}"] - outs[f"xla_{dt}"])))
        for dt in ("float32", "bfloat16")}

    # ---- attention logit band on trained weights (XLA path, fp32)
    cfg_x = cfg.replace(tpu=cfg.tpu.__class__(compute_dtype="float32",
                                              attention_backend="xla"))
    model_x = build_model(cfg_x, seed=0)
    gd_x, _ = nnx.split(model_x, nnx.Param)
    model_x = nnx.merge(gd_x, params)
    results["attn_logits"] = attention_logit_stats(
        model_x, jnp.asarray(noisy[:2]))

    # ---- the torch reference with the exported trained weights
    model_for_export = nnx.merge(gd_x, params)
    t0 = time.time()
    ref_out = torch_reference_eval(model_for_export,
                                   [noisy[i:i + 1] for i in range(len(noisy))])
    results["torch_eval_time_s"] = round(time.time() - t0, 1)

    psnr = {"noisy": np_psnr(targets, noisy),
            "torch_reference": np_psnr(targets, ref_out)}
    for k, v in outs.items():
        psnr[f"ours_{k}"] = np_psnr(targets, v)
    results["per_image_psnr"] = {k: [round(float(x), 3) for x in v]
                                 for k, v in psnr.items()}
    results["psnr_mean"] = {k: round(float(v.mean()), 3)
                            for k, v in psnr.items()}

    # ---- per-image SSIM across frameworks (the reference eval protocol
    # is half SSIM, evaluation.m:61-64) — scored by the independent
    # float64 scipy oracle (tools/ssim_oracle.py, itself pinned against
    # ops/image.py::ssim in tests) on clipped outputs. Scored on RGB
    # (channel-mean) for cross-framework comparison; the Trainer's
    # val ssim is the evaluation.m GRAYSCALE protocol — the two are
    # different statistics of the same outputs, not a discrepancy.
    from tools.ssim_oracle import ssim_oracle

    def clip01(a):
        return np.clip(a, 0.0, 1.0)

    ssim_cols = {"noisy": ssim_oracle(targets, clip01(noisy)),
                 "torch_reference": ssim_oracle(targets, clip01(ref_out))}
    for k in ("pallas_float32", "pallas_bfloat16"):
        ssim_cols[f"ours_{k}"] = ssim_oracle(targets, clip01(outs[k]))
    results["per_image_ssim"] = {k: [round(float(x), 5) for x in v]
                                 for k, v in ssim_cols.items()}
    results["ssim_mean"] = {k: round(float(v.mean()), 5)
                            for k, v in ssim_cols.items()}
    results["ssim_gap_vs_torch"] = {
        k: round(float(np.max(np.abs(ssim_cols[k]
                                     - ssim_cols["torch_reference"]))), 5)
        for k in ssim_cols if k.startswith("ours_")}
    # same one-sided no-regression reading as PSNR
    results["ssim_no_regression_0.002"] = bool(np.all(
        ssim_cols["ours_pallas_float32"]
        - ssim_cols["torch_reference"] >= -0.002))
    ref_p = psnr["torch_reference"]
    results["psnr_gap_db"] = {
        k: round(float(np.max(np.abs(psnr[f"ours_{k}"] - ref_p))), 4)
        for k in outs}
    results["parity_within_0.05dB"] = bool(
        results["psnr_gap_db"]["pallas_float32"] <= 0.05)
    # One-sided quality gate: a user switching from the reference must
    # lose nothing — ours may only trail torch by <=0.05 dB per image.
    # (The symmetric gate above can fail in OUR favor: the round-4
    # checkpoint evaluates 0.016-0.057 dB BETTER through our forward on
    # every image — a spatially-uniform ~1e-3 output difference between
    # frameworks in the saturated-logit regime |logit|~5e3, border ==
    # interior, so not an export/stem/padding defect.)
    results["quality_no_regression_0.05dB"] = bool(
        np.all(psnr["ours_pallas_float32"] - ref_p >= -0.05))
    results["per_image_delta_vs_torch_db"] = [
        round(float(x), 4) for x in (psnr["ours_pallas_float32"] - ref_p)]

    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "RESULTS.json"), "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items()
                      if k not in ("per_image_psnr",)}, indent=1))


if __name__ == "__main__":
    main()
