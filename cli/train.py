#!/usr/bin/env python
"""Training CLI (reference `python train.py` equivalent).

Reads a reference-schema training.yaml (default ./training.yaml like the
reference, train.py:61-64), builds the Trainer, runs the fit loop.

    python cli/train.py --config training.yaml [--task mask|denoise]
                        [--sigma 50] [--epochs N] [--steps-per-epoch N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    from sunet_tf_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    p = argparse.ArgumentParser(description="Train SUNet (TPU-native)")
    p.add_argument("--config", default="training.yaml")
    p.add_argument("--task", default=None, choices=[None, "mask", "denoise"],
                   help="default: mask if OUT_CHANS==1 else denoise")
    p.add_argument("--sigma", type=float, default=50.0,
                   help="AWGN sigma (0-255 scale) for the denoise task")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--steps-per-epoch", type=int, default=None)
    p.add_argument("--train-dir", default=None)
    p.add_argument("--val-dir", default=None)
    p.add_argument("--save-dir", default=None)
    args = p.parse_args()

    from sunet_tf_tpu.config import load_config
    from sunet_tf_tpu.models.sunet import param_count
    from sunet_tf_tpu.train.trainer import Trainer

    cfg = load_config(args.config)
    tr = dict(cfg.training.__dict__)
    if args.train_dir:
        tr["train_dir"] = args.train_dir
    if args.val_dir:
        tr["val_dir"] = args.val_dir
    if args.save_dir:
        tr["save_dir"] = args.save_dir
    if args.steps_per_epoch:
        tr["steps_per_epoch"] = args.steps_per_epoch
    op = dict(cfg.optim.__dict__)
    if args.epochs:
        op["epochs"] = args.epochs
    cfg = cfg.replace(training=cfg.training.__class__(**tr),
                      optim=cfg.optim.__class__(**op))

    print("==> Build the model")
    trainer = Trainer(cfg, task=args.task, sigma=args.sigma)
    print(f"""==> Training details:
------------------------------------------------------------------
    Mode / task:        {cfg.mode} / {trainer.task}
    Train patch size:   {cfg.training.train_ps}
    Model parameters:   {param_count(trainer.model)}
    Start/End epochs:   {trainer.start_epoch}~{cfg.optim.epochs}
    Batch size:         {cfg.optim.batch}
    Learning rate:      {cfg.optim.lr_initial}
    Mesh:               {dict(zip(trainer.mesh.axis_names, trainer.mesh.devices.shape))}
------------------------------------------------------------------""")
    trainer.fit()


if __name__ == "__main__":
    main()
