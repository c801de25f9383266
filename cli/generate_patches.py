#!/usr/bin/env python
"""Offline patch extraction CLI (reference generate_patches.py equivalent).

    python cli/generate_patches.py --src_dir DIV2K/ --tar_dir data/train \
        --ps 256 --num_patches 100 [--pair_mode same|tagged]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    p = argparse.ArgumentParser(
        description="Generate patches from full-resolution images")
    p.add_argument("--src_dir", required=True)
    p.add_argument("--tar_dir", required=True)
    p.add_argument("--ps", type=int, default=256)
    p.add_argument("--num_patches", type=int, default=100)
    p.add_argument("--num_cores", type=int, default=4)
    p.add_argument("--pair_mode", default="tagged", choices=["tagged", "same"],
                   help="'tagged': pair *GT* with *hazy* files (reference); "
                        "'same': clean-only dataset, noise added on device")
    p.add_argument("--clean_tag", default="GT")
    p.add_argument("--degraded_tag", default="hazy")
    p.add_argument("--pattern", default="*/*.*")
    args = p.parse_args()

    from sunet_tf_tpu.data.patches import generate_patches

    n = generate_patches(
        args.src_dir, args.tar_dir, ps=args.ps, num_patches=args.num_patches,
        num_workers=args.num_cores, pair_mode=args.pair_mode,
        clean_tag=args.clean_tag, degraded_tag=args.degraded_tag,
        pattern=args.pattern)
    print(f"wrote {n} patch pairs to {args.tar_dir}")


if __name__ == "__main__":
    main()
