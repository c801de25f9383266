"""Optional grain-based input pipeline (multiprocess decode).

The default pipeline (data/pipeline.py) decodes on the main thread with a
background-prefetch thread — fine for cached patch folders, but a
single-core bottleneck for full-size corpora (DIV2K-scale, BASELINE config
#4) where per-epoch decode work is real. This module provides the same
batch contract via ``grain`` (SURVEY §7 named it the multi-worker host
pipeline for the rebuild; the reference ran ``DataLoader(num_workers=0)``,
train.py:156,158 — defect #9): `worker_count` subprocesses decode + crop
independently, so the host input path scales with cores.

Enabled by ``TPU.DATA_WORKERS > 0`` in the config (Trainer.train_epoch);
import is deferred/gated so environments without grain keep working.

Contract (same as data/pipeline.py::batch_iterator): yields
``{"input": u8 (B,ps,ps,3), "target": u8 (B,ps,ps,3), "valid": f32 (B,),
"names": [...]}``. Filenames are recovered host-side from record indices
threaded through the worker processes (arrays cross the process boundary;
the string lookup happens in the parent), so eval/demo callers that need
names can use this path too. ``pad_to`` pads a trailing partial batch by
wrapping (valid=0 rows) exactly like ``batch_iterator`` — required for
mesh-sharded eval.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from sunet_tf_tpu.data.pipeline import (center_crop_np, list_image_pairs,
                                        load_image_u8, reflect_pad_to)


def grain_available() -> bool:
    try:
        import grain.python  # noqa: F401

        return True
    except Exception:
        return False


def _make_classes():
    """Build the grain transform classes lazily (grain import gated)."""
    import grain.python as pg

    class DecodedPairSource(pg.RandomAccessDataSource):
        """Decode-on-access pair source; each worker process decodes its
        own records (no shared cache — parallelism replaces caching)."""

        def __init__(self, root: str):
            self.pairs = list_image_pairs(root)

        def __len__(self):
            return len(self.pairs)

        def __getitem__(self, i: int):
            ip, tp = self.pairs[int(i)]
            # idx rides along as an array (strings do not cross the worker
            # process boundary); the parent maps it back to a filename.
            return {"input": load_image_u8(ip), "target": load_image_u8(tp),
                    "idx": np.int64(i)}

    class PadCrop(pg.RandomMapTransform):
        """Reflect-pad below patch size, then random (train) / center (eval)
        aligned crop — reference dataset_RGB.py:45-58,120-122 semantics
        (with the small-image center-crop crash fixed, defect #12)."""

        def __init__(self, ps: int, train: bool):
            self.ps = ps
            self.train = train

        def random_map(self, x, rng: np.random.Generator):
            ps = self.ps
            inp = reflect_pad_to(x["input"], ps)
            tar = reflect_pad_to(x["target"], ps)
            if self.train:
                h, w = tar.shape[:2]
                r = int(rng.integers(0, h - ps + 1))
                c = int(rng.integers(0, w - ps + 1))
                return {"input": inp[r:r + ps, c:c + ps],
                        "target": tar[r:r + ps, c:c + ps], "idx": x["idx"]}
            return {"input": center_crop_np(inp, ps),
                    "target": center_crop_np(tar, ps), "idx": x["idx"]}

    return pg, DecodedPairSource, PadCrop


def grain_batch_iterator(root: str, patch_size: int, batch: int,
                         train: bool = True, shuffle: bool = True,
                         drop_last: bool = True, seed: int = 0,
                         workers: int = 0, pad_to: int = 0) -> Iterator[dict]:
    """Multiprocess equivalent of ``batch_iterator`` over a data root.

    workers=0 runs in-process (still useful: identical semantics for
    tests); workers=N decodes/crops in N subprocesses with prefetch.
    pad_to > 1 pads a trailing partial batch by repeating its rows so the
    leading dim is a multiple of the data-mesh axis; pad rows carry
    valid=0 (batch_iterator contract — exact eval masks them out).
    """
    import os as _os

    pg, DecodedPairSource, PadCrop = _make_classes()
    src = DecodedPairSource(root)
    stems = [_os.path.splitext(_os.path.basename(tp))[0]
             for _, tp in src.pairs]
    loader = pg.DataLoader(
        data_source=src,
        sampler=pg.IndexSampler(
            num_records=len(src), shuffle=shuffle, seed=seed,
            shard_options=pg.NoSharding(), num_epochs=1),
        operations=[PadCrop(patch_size, train),
                    pg.Batch(batch_size=batch, drop_remainder=drop_last)],
        worker_count=int(workers),
    )
    for b in loader:
        inp, tar = np.asarray(b["input"]), np.asarray(b["target"])
        idx = np.asarray(b["idx"], np.int64)
        n_real = inp.shape[0]
        if pad_to > 1 and n_real % pad_to:
            need = -(-n_real // pad_to) * pad_to - n_real
            rows = np.resize(np.arange(n_real), need)
            inp = np.concatenate([inp, inp[rows]])
            tar = np.concatenate([tar, tar[rows]])
            idx = np.concatenate([idx, idx[rows]])
        valid = np.zeros((inp.shape[0],), np.float32)
        valid[:n_real] = 1.0
        yield {"input": inp, "target": tar, "valid": valid,
               "names": [stems[int(i)] for i in idx]}
