#!/usr/bin/env python
"""End-to-end train throughput WITH real disk input (VERDICT r4 #2).

Every published train number (BENCH_SUITE 219 img/s b32) comes from the
chained harness on synthetic in-memory batches; this tool measures
`Trainer.train_epoch` feeding from an on-disk PNG patch corpus through
the real input pipeline, under:

  - the default thread-prefetch pipeline with the decoded-pair LRU cache
    (steady state for patch corpora that fit the 4 GiB cache);
  - the same pipeline with the cache disabled (SUNET_CACHE_BYTES=1) —
    the steady state for corpora LARGER than host RAM, i.e. the honest
    "can one host core decode fast enough?" number (reference defect #9,
    train.py:156 num_workers=0);
  - the grain multiprocess decode pipeline at TPU.DATA_WORKERS in {2,4};
  - the packed uint8 memmap shard pipeline (data/packed.py) — decode
    cost paid once at pack time, epochs stream raw bytes.

Usage: python tools/train_io_bench.py [--n 1280] [--batch 32] [--epochs 3]
Writes /tmp/train_io_bench.json and prints one line per variant.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def run_variant(name: str, cfg, sigma: float, epochs: int, env: dict,
                packed_dir=None) -> dict:
    import numpy as np

    from sunet_tf_tpu.train.trainer import Trainer

    for k, v in env.items():
        os.environ[k] = v
    try:
        t = Trainer(cfg, task="denoise", sigma=sigma, verbose=False)
        if packed_dir is not None:
            from sunet_tf_tpu.data.packed import PackedPairDataset

            t.train_ds = PackedPairDataset(packed_dir,
                                           cfg.training.train_ps,
                                           train=True,
                                           seed=cfg.training.seed)
        rates = []
        for epoch in range(1, epochs + 1):
            t0 = time.time()
            out = t.train_epoch(epoch)
            dt = time.time() - t0
            imgs = out["steps"] * cfg.optim.batch
            rates.append(imgs / dt)
            print(f"#   {name} epoch {epoch}: {imgs} imgs in {dt:.1f}s "
                  f"= {imgs/dt:.1f} img/s", flush=True)
        # epoch 1 includes compile (cached) + cold cache; steady state =
        # best of the later epochs
        return {"epochs_img_per_s": [round(r, 1) for r in rates],
                "steady_img_per_s": round(max(rates[1:] or rates), 1)}
    finally:
        for k in env:
            os.environ.pop(k, None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default="/tmp/io_bench_data")
    ap.add_argument("--n", type=int, default=1280)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    from sunet_tf_tpu.config import Config
    from sunet_tf_tpu.data.synth import generate_dataset
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    tdir = os.path.join(args.data, "train")
    if not os.path.isdir(os.path.join(tdir, "input")):
        t0 = time.time()
        generate_dataset(tdir, args.n, 256, seed=11, pair_mode="same")
        print(f"# corpus: {args.n} x 256^2 pairs in {time.time()-t0:.0f}s")

    base = Config()
    cfg = base.replace(
        swinunet=base.swinunet.__class__(
            **{**base.swinunet.__dict__, "out_chans": 3}),
        optim=base.optim.__class__(batch=args.batch, epochs=args.epochs),
        training=base.training.__class__(
            train_ps=256, train_dir=tdir, save_dir="/tmp/io_bench_ckpt",
            seed=85, steps_per_epoch=0),
        tpu=base.tpu.__class__(compute_dtype="bfloat16",
                               attention_backend="pallas"),
    )

    report = {}
    report["cached_workers0"] = run_variant(
        "cached_workers0", cfg, 50.0, args.epochs, {})
    report["nocache_workers0"] = run_variant(
        "nocache_workers0", cfg, 50.0, args.epochs,
        {"SUNET_CACHE_BYTES": "1"})
    for w in (2, 4):
        cfg_w = cfg.replace(tpu=cfg.tpu.__class__(
            **{**cfg.tpu.__dict__, "data_workers": w}))
        report[f"grain_workers{w}"] = run_variant(
            f"grain_workers{w}", cfg_w, 50.0, args.epochs,
            {"SUNET_CACHE_BYTES": "1"})

    # packed memmap shards: pack once, stream raw uint8
    from sunet_tf_tpu.data.packed import pack_pair_dataset

    packed_dir = os.path.join(args.data, "packed")
    if not os.path.exists(os.path.join(packed_dir, "input.npy")):
        t0 = time.time()
        pack_pair_dataset(tdir, packed_dir, 256)
        print(f"# packed shards in {time.time()-t0:.0f}s")
    report["packed_memmap"] = run_variant(
        "packed_memmap", cfg, 50.0, args.epochs,
        {"SUNET_CACHE_BYTES": "1"}, packed_dir=packed_dir)

    with open("/tmp/train_io_bench.json", "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
