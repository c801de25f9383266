#!/usr/bin/env python
"""Fixed-size inference CLI (reference demo.py equivalent).

Glob images from --input_dir, run the model (reflect-padded to the model's
granularity — the reference silently misbehaved off the training resolution),
clamp to [0,1], save as .bmp into --result_dir (reference demo.py:70-82).

    python cli/demo.py --input_dir in/ --result_dir out/ \
        [--weights ckpt_dir] [--config training.yaml] [--batch 16]
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser(description="Demo Image Restoration")
    p.add_argument("--input_dir", required=True)
    p.add_argument("--result_dir", required=True)
    p.add_argument("--weights", default=None,
                   help="Orbax checkpoint dir (e.g. .../models/latest); "
                        "random init if omitted")
    p.add_argument("--config", default="training.yaml")
    p.add_argument("--batch", type=int, default=8)
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
    from sunet_tf_tpu.config import load_config
    from sunet_tf_tpu.data.pipeline import natural_sorted
    from sunet_tf_tpu.infer.tiled import padded_inference, required_granularity
    from sunet_tf_tpu.models.sunet import build_model

    cfg = load_config(args.config) if os.path.exists(args.config) else None
    if cfg is None:
        from sunet_tf_tpu.config import Config

        cfg = Config()
    cfg = cfg.replace(tpu=cfg.tpu.__class__(
        compute_dtype=cfg.tpu.compute_dtype, attention_backend=args.backend))
    if args.out_chans is not None:
        cfg = cfg.replace(swinunet=cfg.swinunet.__class__(
            **{**cfg.swinunet.__dict__, "out_chans": args.out_chans}))
    model = build_model(cfg)
    graphdef, params = nnx.split(model, nnx.Param)
    if args.weights:
        params = restore_checkpoint(args.weights, params)["params"]

    fwd = jax.jit(lambda p, x: nnx.merge(graphdef, p)(x))
    gran = required_granularity(cfg.swinunet.patch_size,
                                cfg.swinunet.num_stages, cfg.swinunet.win_size)

    files = natural_sorted(
        f for f in glob.glob(os.path.join(args.input_dir, "*.*"))
        if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp")))
    if not files:
        raise SystemExit(f"No files found at {args.input_dir}")
    os.makedirs(args.result_dir, exist_ok=True)

    print("restoring images......")
    # group same-shape images into --batch stacks: one forward per stack
    # (the reference ran one image at a time, demo.py:70-82; a dead --batch
    # flag here was round-1 review finding #4)
    from collections import defaultdict

    by_shape = defaultdict(list)
    for f in files:
        img = np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
        by_shape[img.shape].append((f, img))

    def save(f, y):
        y = np.asarray(y)
        if y.shape[-1] == 1:
            y = np.repeat(y, 3, axis=-1)
        out = (np.clip(y, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8)
        name = os.path.splitext(os.path.basename(f))[0]
        Image.fromarray(out).save(os.path.join(args.result_dir, name + ".bmp"))

    for shape, items in by_shape.items():
        bsz = max(args.batch, 1)
        for start in range(0, len(items), bsz):
            chunk = items[start : start + bsz]
            x = np.stack([im for _, im in chunk])
            if len(items) > bsz and len(chunk) < bsz:
                # pad the trailing chunk so only ONE shape is compiled
                x = np.concatenate(
                    [x, np.zeros((bsz - len(chunk),) + shape, np.float32)])
            y = padded_inference(lambda t: fwd(params, t), jnp.asarray(x), gran)
            y = np.asarray(jnp.clip(y, 0.0, 1.0))
            for (f, _), yi in zip(chunk, y):
                save(f, yi)
    print(f"Files saved at {args.result_dir}")
    print("finish !")


if __name__ == "__main__":
    main()
