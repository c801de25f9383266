#!/usr/bin/env python
"""Print the LR schedule table (reference warmup_scheduler/run.py demo
equivalent): per-epoch learning rates under the reference recipe.

    python cli/lr_schedule.py [--epochs 20] [--lr 2e-4] [--lr-min 1e-6]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(description="LR schedule demo")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--lr-min", type=float, default=1e-6)
    p.add_argument("--warmup", type=int, default=3)
    args = p.parse_args()

    from sunet_tf_tpu.train.schedule import reference_lr_schedule

    print(f"{'epoch':>6}  {'lr':>12}")
    for e in range(1, args.epochs + 1):
        lr = reference_lr_schedule(e, args.lr, args.lr_min, args.epochs,
                                   args.warmup)
        print(f"{e:>6}  {lr:>12.8f}")


if __name__ == "__main__":
    main()
