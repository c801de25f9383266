"""Directory helpers (reference utils/dir_utils.py parity)."""

from __future__ import annotations

import glob
import os

from sunet_tf_tpu.data.pipeline import natural_sorted


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)


def mkdirs(paths) -> None:
    if isinstance(paths, (list, tuple)):
        for p in paths:
            mkdir(p)
    else:
        mkdir(paths)


def get_last_path(path: str, suffix: str) -> str:
    """Newest (natural-sorted) entry matching *suffix (reference
    utils/dir_utils.py:19-21)."""
    matches = natural_sorted(glob.glob(os.path.join(path, f"*{suffix}")))
    if not matches:
        raise FileNotFoundError(f"no '*{suffix}' under {path}")
    return matches[-1]
