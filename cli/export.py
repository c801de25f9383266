#!/usr/bin/env python
"""Export the model forward as an AOT serving artifact (jax.export).

The reference has no deployment path (serving = running demo.py inside the
training checkout, reference demo.py:20-76). This produces a versioned
StableHLO artifact a serving process loads without the model code:

    python cli/export.py --out runs/export --batches 1,8 \
        [--config training.yaml] [--weights ckpt_dir/latest] [--check]

Weights stay outside the artifact (orbax checkpoints, sunet_tf_tpu.ckpt);
at serve time restore params and call ServingModel(params, x). --check
reloads the artifact and asserts bit-parity with the live jitted model.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--config", default=None, help="training.yaml (default recipe if omitted)")
    ap.add_argument("--weights", default=None,
                    help="checkpoint to verify against with --check (artifact itself is weights-agnostic)")
    ap.add_argument("--batches", default="1",
                    help="comma-separated static batch buckets, e.g. 1,8,32")
    ap.add_argument("--resolution", type=int, default=None,
                    help="input resolution (default: config img_size)")
    ap.add_argument("--check", action="store_true",
                    help="reload the artifact and assert parity vs the live model")
    ap.add_argument("--tiled", default=None,
                    help="also export tiled canvas buckets for arbitrary-"
                         "resolution serving: comma-separated XhxXw shapes "
                         "(multiples of --tile-kernel), e.g. 512x768,512x512")
    ap.add_argument("--tile-kernel", type=int, default=256)
    ap.add_argument("--tile-stride", type=int, default=128)
    args = ap.parse_args()

    import jax
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax.numpy as jnp
    from flax import nnx

    from sunet_tf_tpu.config import Config, load_config
    from sunet_tf_tpu.infer.export import ServingModel, save_exported
    from sunet_tf_tpu.models.sunet import build_model

    cfg = load_config(args.config) if args.config else Config()
    res = args.resolution or cfg.swinunet.img_size
    batches = [int(b) for b in args.batches.split(",")]
    model = build_model(cfg)
    graphdef, params = nnx.split(model, nnx.Param)
    if args.weights:
        from sunet_tf_tpu.ckpt import restore_checkpoint

        params = restore_checkpoint(args.weights, params)["params"]

    meta = save_exported(args.out, graphdef, params, resolution=res,
                         batches=batches, in_chans=cfg.swinunet.in_chans,
                         extra_meta={"img_size": cfg.swinunet.img_size,
                                     "out_chans": cfg.swinunet.out_chans})
    sizes = {b: os.path.getsize(os.path.join(args.out, f"forward_b{b}.jaxexport"))
             for b in meta["batches"]}
    print(f"exported {meta['batches']} @ {res}x{res} for platforms "
          f"{meta['platforms']} -> {args.out} "
          f"({', '.join(f'b{b}: {s/1e6:.2f} MB' for b, s in sizes.items())})")

    if args.tiled:
        from sunet_tf_tpu.infer.export import (
            TiledServingModel,
            save_exported_tiled,
        )

        buckets = [tuple(int(v) for v in b.split("x"))
                   for b in args.tiled.split(",")]
        tmeta = save_exported_tiled(
            args.out, graphdef, params, buckets,
            kernel=args.tile_kernel, stride=args.tile_stride,
            in_chans=cfg.swinunet.in_chans)
        print(f"exported tiled buckets {tmeta['buckets']} "
              f"(kernel {args.tile_kernel}, stride {args.tile_stride})")
        if args.check:
            import numpy as np

            from sunet_tf_tpu.infer.tiled import TiledRunner

            Xh, Xw = buckets[0]
            H, W = Xh - 7, Xw - 13  # force real pad/crop offsets
            img = jax.random.uniform(jax.random.key(1), (1, H, W,
                                                         cfg.swinunet.in_chans))
            tsm = TiledServingModel(args.out)
            got = tsm(params, img)
            runner = TiledRunner(
                lambda p, t: nnx.merge(graphdef, p)(t), params,
                kernel=args.tile_kernel, stride=args.tile_stride)
            live = runner(img)
            tdiff = float(jnp.max(jnp.abs(got - live)))
            print(f"check(tiled): reloaded-vs-live max|diff| = {tdiff:.2e}")
            assert tdiff == 0.0, "tiled artifact diverges from live runner"

    if args.check:
        sm = ServingModel(args.out)
        x = jax.random.uniform(jax.random.key(0),
                               (batches[0], res, res, cfg.swinunet.in_chans))
        y = sm(params, x)
        ylive = jax.jit(lambda p, t: nnx.merge(graphdef, p)(t))(params, x)
        diff = float(jnp.max(jnp.abs(y - ylive)))
        print(f"check: reloaded-vs-live max|diff| = {diff:.2e}")
        assert diff == 0.0, "exported artifact diverges from live model"


if __name__ == "__main__":
    main()
