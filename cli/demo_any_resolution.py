#!/usr/bin/env python
"""Arbitrary-resolution tiled inference CLI (reference
demo_any_resolution.py equivalent).

Overlap-tiled restoration at --size tiles / --stride step with fold-average
reconstruction, batched over tiles (the reference ran tiles one at a time,
demo_any_resolution.py:118-123). Optional TPR/FPR evaluation against
--mask_dir ground truth at the reference thresholds (pred>127, gt>200),
written to tpr_fpr_results.txt (:107-159).
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Demo Image Restoration (any resolution)")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--mask_dir", default=None)
    p.add_argument("--result_dir", required=True)
    p.add_argument("--weights", default=None)
    p.add_argument("--config", default="training.yaml")
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--stride", type=int, default=128)
    p.add_argument("--tile_batch", type=int, default=64,
                   help="tiles per forward; <= this many tiles run as one "
                        "batched call (1024^2/stride-128 = 49 tiles)")
    p.add_argument("--square_pad", action="store_true",
                   help="bit-parity with the reference's square padding")
    p.add_argument("--backend", default="pallas", choices=["pallas", "xla"],
                   help="attention backend; pallas = fused TPU kernels")
    p.add_argument("--out_chans", type=int, default=None,
                   help="model head channels (3 = denoise RGB, 1 = mask "
                        "logits); overrides the config so checkpoints of "
                        "either personality load without a YAML")
    args = p.parse_args()

    import jax
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from flax import nnx
    from PIL import Image

    from sunet_tf_tpu.ckpt import restore_checkpoint
    from sunet_tf_tpu.config import Config, load_config
    from sunet_tf_tpu.data.pipeline import natural_sorted
    from sunet_tf_tpu.infer.tiled import TiledRunner
    from sunet_tf_tpu.models.sunet import build_model
    from sunet_tf_tpu.ops.metrics import tpr_fpr

    cfg = load_config(args.config) if os.path.exists(args.config) else Config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(
        compute_dtype=cfg.tpu.compute_dtype, attention_backend=args.backend))
    if args.out_chans is not None:
        cfg = cfg.replace(swinunet=cfg.swinunet.__class__(
            **{**cfg.swinunet.__dict__, "out_chans": args.out_chans}))
    model = build_model(cfg)
    graphdef, params = nnx.split(model, nnx.Param)
    if args.weights:
        params = restore_checkpoint(args.weights, params)["params"]

    # params stay a traced argument (closure-captured weights become HLO
    # constants and explode compile payloads).
    def model_fn(p, t):
        return nnx.merge(graphdef, p)(t)

    files = natural_sorted(
        f for f in glob.glob(os.path.join(args.input_dir, "*.*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not files:
        raise SystemExit(f"No image files found in {args.input_dir}")
    os.makedirs(args.result_dir, exist_ok=True)

    # bucketed: mixed-size corpora reuse one model compile per
    # padded-canvas shape instead of recompiling per exact image shape
    runner = TiledRunner(model_fn, params, kernel=args.size,
                         stride=args.stride, tile_batch=args.tile_batch,
                         square_pad=args.square_pad)

    print("Restoring images...")
    # batched corpus path: same-bucket canvases run as one forward (the
    # reference loops images serially, demo_any_resolution.py:111-146).
    # Decode in bounded chunks: run_corpus wants a slab of decoded images
    # to bucket, but an unbounded corpus of large images would exhaust
    # host RAM on the 1-core host — cap resident decoded pixels per chunk
    # (bucket grouping still batches within each chunk).
    CHUNK = 256
    results_txt = os.path.join(args.result_dir, "tpr_fpr_results.txt")
    with open(results_txt, "w") as rf:
        rf.write("Filename\tTPR\tFPR\n")
        for files_c, outs in _chunked_corpus(files, runner, CHUNK):
            _write_results(files_c, outs, args, rf)
    print(f"\nAll results saved in: {args.result_dir}")


def _chunked_corpus(files, runner, chunk):
    import numpy as np
    from PIL import Image

    for i in range(0, len(files), chunk):
        files_c = files[i:i + chunk]
        images = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
                  for f in files_c]
        yield files_c, runner.run_corpus(images)


def _write_results(files, outs, args, rf):
    import jax.numpy as jnp
    import numpy as np
    from PIL import Image

    from sunet_tf_tpu.ops.metrics import tpr_fpr

    for f, y in zip(files, outs):
        y = np.asarray(jnp.clip(y, 0.0, 1.0))[0]
        if y.shape[-1] == 1:
            y = np.repeat(y, 3, axis=-1)
        out = (y * 255.0 + 0.5).astype(np.uint8)
        name = os.path.splitext(os.path.basename(f))[0]
        Image.fromarray(out).save(os.path.join(args.result_dir, name + ".bmp"))

        if args.mask_dir:
            mask_path = os.path.join(args.mask_dir, os.path.basename(f))
            if os.path.exists(mask_path):
                mask = np.asarray(Image.open(mask_path).convert("L"))
                pred_gray = (0.2989 * out[..., 0] + 0.5870 * out[..., 1]
                             + 0.1140 * out[..., 2]).astype(np.uint8)
                tpr, fpr = tpr_fpr(pred_gray, mask)
                print(f"{os.path.basename(f)} — TPR: {tpr:.4f}, FPR: {fpr:.4f}")
                rf.write(f"{os.path.basename(f)}\t{tpr:.4f}\t{fpr:.4f}\n")
            else:
                print(f"Mask not found for {f}, skipping TPR/FPR.")


if __name__ == "__main__":
    main()
