"""Packed uint8 memmap shards: decode-free training input.

PNG decode on the single host core tops out well below the TPU's train
rate for uncached corpora (tools/train_io_bench.py), which is the
reference's ``num_workers=0`` bottleneck reborn (reference train.py:156,
SURVEY defect #9). The TPU-native fix is to pay the decode once,
offline: ``pack_pair_dataset`` writes the whole corpus as two raw uint8
``.npy`` arrays (input.npy / target.npy, shape (N, ps, ps, 3)) plus
names.json; ``PackedPairDataset`` memory-maps them and serves pairs as
zero-copy slices — an epoch streams bytes at disk/page-cache speed with
no per-image Python or codec work.

API-compatible with ``PairDataset`` (len/get/train-crop contract), so
``batch_iterator``/``Trainer`` take it unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from sunet_tf_tpu.data.pipeline import (
    center_crop_np,
    list_image_pairs,
    load_image_u8,
    reflect_pad_to,
)


def pack_pair_dataset(root: str, out_dir: str, ps: int) -> dict:
    """Decode an input/-target/ image-pair folder into packed shards.

    Images are reflect-padded to at least (ps, ps) and center-cropped to
    exactly (ps, ps) — for patch corpora (the training layout produced by
    cli/generate_patches.py) this is the identity."""
    pairs = list_image_pairs(root)
    os.makedirs(out_dir, exist_ok=True)
    n = len(pairs)
    inp = np.lib.format.open_memmap(
        os.path.join(out_dir, "input.npy"), mode="w+", dtype=np.uint8,
        shape=(n, ps, ps, 3))
    tar = np.lib.format.open_memmap(
        os.path.join(out_dir, "target.npy"), mode="w+", dtype=np.uint8,
        shape=(n, ps, ps, 3))
    names = []
    for i, (ip, tp) in enumerate(pairs):
        a = center_crop_np(reflect_pad_to(load_image_u8(ip), ps), ps)
        b = center_crop_np(reflect_pad_to(load_image_u8(tp), ps), ps)
        inp[i], tar[i] = a, b
        names.append(os.path.splitext(os.path.basename(tp))[0])
    inp.flush()
    tar.flush()
    with open(os.path.join(out_dir, "names.json"), "w") as f:
        json.dump({"ps": ps, "names": names}, f)
    return {"n": n, "ps": ps}


class PackedPairDataset:
    """Memmap-backed drop-in for ``PairDataset`` (train random-crop /
    eval center-crop semantics; crops are identity when patch_size equals
    the packed ps)."""

    def __init__(self, packed_dir: str, patch_size: int, train: bool = True,
                 seed: int = 85):
        with open(os.path.join(packed_dir, "names.json")) as f:
            meta = json.load(f)
        self.names = meta["names"]
        self.packed_ps = int(meta["ps"])
        self.ps = patch_size
        assert patch_size <= self.packed_ps, (
            f"patch_size {patch_size} exceeds packed ps {self.packed_ps}")
        self.train = train
        self.rng = np.random.default_rng(seed)
        self._inp = np.load(os.path.join(packed_dir, "input.npy"),
                            mmap_mode="r")
        self._tar = np.load(os.path.join(packed_dir, "target.npy"),
                            mmap_mode="r")

    def __len__(self):
        return len(self.names)

    def get(self, i: int):
        """-> (input u8 (ps,ps,3), target u8 (ps,ps,3), name)"""
        inp, tar = self._inp[i], self._tar[i]
        ps = self.ps
        if ps == self.packed_ps:
            return inp, tar, self.names[i]
        if self.train:
            h = w = self.packed_ps
            r = int(self.rng.integers(0, h - ps + 1))
            c = int(self.rng.integers(0, w - ps + 1))
            return (inp[r:r + ps, c:c + ps], tar[r:r + ps, c:c + ps],
                    self.names[i])
        return (center_crop_np(np.asarray(inp), ps),
                center_crop_np(np.asarray(tar), ps), self.names[i])
