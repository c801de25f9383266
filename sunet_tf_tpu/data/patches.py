"""Offline patch extraction (reference generate_patches.py equivalent).

Reference behavior (generate_patches.py:12-66): delete+recreate the target
dir, glob src/*/*.JPG, pair files whose names contain 'GT' (clean) and
'hazy' (degraded), save NUM_PATCHES random aligned crops per pair into
input/ + target/, joblib CPU parallelism.

This version also supports the denoise workflow directly: with
pair_mode='same', every image is its own clean target (noise is synthesized
on device at train time — BASELINE.json's on-device AWGN recipe), which is
how DIV2K-style single-folder datasets are consumed.
"""

from __future__ import annotations

import glob
import os
import shutil
from concurrent.futures import ThreadPoolExecutor
from typing import Optional

import numpy as np

from sunet_tf_tpu.data.pipeline import load_image_u8, natural_sorted


def _save(path: str, img: np.ndarray) -> None:
    from PIL import Image

    Image.fromarray(img).save(path)


def find_pairs(src_dir: str, clean_tag: str = "GT", degraded_tag: str = "hazy",
               pattern: str = "*/*.*", pair_mode: str = "tagged") -> list:
    """-> [(degraded_path, clean_path)]."""
    files = natural_sorted(glob.glob(os.path.join(src_dir, pattern)))
    files = [f for f in files if f.lower().endswith((".jpg", ".jpeg", ".png", ".bmp"))]
    if pair_mode == "same":
        return [(f, f) for f in files]
    clean = [f for f in files if clean_tag in os.path.basename(f)]
    degraded = [f for f in files if degraded_tag in os.path.basename(f)]
    assert len(clean) == len(degraded), (
        f"unpaired dataset: {len(clean)} '{clean_tag}' vs {len(degraded)} "
        f"'{degraded_tag}' files")
    return list(zip(degraded, clean))


def generate_patches(
    src_dir: str,
    tar_dir: str,
    ps: int = 256,
    num_patches: int = 100,
    num_workers: int = 4,
    pair_mode: str = "tagged",
    clean_tag: str = "GT",
    degraded_tag: str = "hazy",
    pattern: str = "*/*.*",
    seed: int = 0,
) -> int:
    """Extract aligned random patches; returns number of patch pairs written."""
    if os.path.exists(tar_dir):
        shutil.rmtree(tar_dir)
    inp_dir = os.path.join(tar_dir, "input")
    out_dir = os.path.join(tar_dir, "target")
    os.makedirs(inp_dir)
    os.makedirs(out_dir)
    pairs = find_pairs(src_dir, clean_tag, degraded_tag, pattern, pair_mode)

    def work(args):
        i, (deg_path, clean_path) = args
        rng = np.random.default_rng(seed + i)
        deg = load_image_u8(deg_path)
        clean = deg if deg_path == clean_path else load_image_u8(clean_path)
        h, w = clean.shape[:2]
        if h < ps or w < ps:
            pad = ((0, max(ps - h, 0)), (0, max(ps - w, 0)), (0, 0))
            deg = np.pad(deg, pad, mode="reflect")
            clean = np.pad(clean, pad, mode="reflect")
            h, w = clean.shape[:2]
        n = 0
        for j in range(num_patches):
            r = int(rng.integers(0, h - ps + 1))
            c = int(rng.integers(0, w - ps + 1))
            _save(os.path.join(inp_dir, f"{i}_{j + 1}.png"),
                  deg[r : r + ps, c : c + ps])
            _save(os.path.join(out_dir, f"{i}_{j + 1}.png"),
                  clean[r : r + ps, c : c + ps])
            n += 1
        return n

    with ThreadPoolExecutor(max_workers=max(1, num_workers)) as ex:
        counts = list(ex.map(work, enumerate(pairs)))
    return sum(counts)
