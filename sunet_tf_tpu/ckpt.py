"""Checkpoint save/restore: Orbax-backed, latest + best-by-metric.

Reference behavior being covered (utils/model_utils.py:21-58, train.py:
137-148,720-725): per-epoch 'latest' checkpoint holding
{epoch, state_dict, optimizer}; resume restores model + optimizer + epoch
and replays the LR schedule (our schedule is closed-form, so replay is just
evaluating at the resumed step). Reference bug #2 (best-AUROC/AUPRC paths
computed but never written, train.py:516-526) is fixed: best-metric
checkpoints are actually saved.

Layout: <save_dir>/<mode>/models/{latest,best_<metric>}/ as Orbax composite
checkpoints with items {params, opt_state?, meta} — composite so inference
tools can restore params without knowing the optimizer structure
(partial restore), mirroring the reference's prefix-tolerant loaders.
"""

from __future__ import annotations

import os
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _atomic_save(path: str, composite_args) -> None:
    """Orbax save with overwrite-by-rotation (orbax refuses to overwrite)."""
    path = os.path.abspath(path)
    tmp = path + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        ckptr.save(tmp, args=composite_args)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.replace(tmp, path)


def save_checkpoint(directory: str, name: str, params, opt_state=None,
                    epoch: int = 0, extra: Optional[dict] = None) -> str:
    """Save a named checkpoint; returns its path."""
    items = {
        "params": ocp.args.StandardSave(params),
        "meta": ocp.args.JsonSave({"epoch": int(epoch), **(extra or {})}),
    }
    if opt_state is not None:
        items["opt_state"] = ocp.args.StandardSave(opt_state)
    path = os.path.join(directory, name)
    os.makedirs(directory, exist_ok=True)
    _atomic_save(path, ocp.args.Composite(**items))
    return path


def restore_checkpoint(path: str, params_like, opt_state_like=None) -> dict:
    """Restore into abstract targets (shapes/dtypes from a fresh model).

    opt_state is restored only when a skeleton is provided AND the
    checkpoint contains one — params-only restore works on full training
    checkpoints (partial composite restore).
    """
    path = os.path.abspath(path)
    items = {
        "params": ocp.args.StandardRestore(
            jax.tree.map(ocp.utils.to_shape_dtype_struct, params_like)),
        "meta": ocp.args.JsonRestore(),
    }
    if opt_state_like is not None and os.path.isdir(os.path.join(path, "opt_state")):
        items["opt_state"] = ocp.args.StandardRestore(
            jax.tree.map(ocp.utils.to_shape_dtype_struct, opt_state_like))
    with ocp.Checkpointer(ocp.CompositeCheckpointHandler()) as ckptr:
        restored = ckptr.restore(path, args=ocp.args.Composite(**items))
    out = {
        "params": restored["params"],
        "epoch": int(restored["meta"]["epoch"]),
        "meta": restored["meta"],
    }
    if "opt_state" in items:
        out["opt_state"] = restored["opt_state"]
    return out


def latest_path(directory: str) -> Optional[str]:
    p = os.path.join(directory, "latest")
    return p if os.path.isdir(p) else None


class BestTracker:
    """Track best values per metric and persist best checkpoints."""

    def __init__(self, directory: str, metrics: tuple, mode: str = "max"):
        self.directory = directory
        self.best = {m: (-np.inf if mode == "max" else np.inf) for m in metrics}
        self.best_epoch = {m: None for m in metrics}
        self.mode = mode

    def update(self, metric: str, value: float, epoch: int, params) -> bool:
        if metric not in self.best or value is None or np.isnan(value):
            return False
        better = value > self.best[metric] if self.mode == "max" else value < self.best[metric]
        if better:
            self.best[metric] = float(value)
            self.best_epoch[metric] = epoch
            save_checkpoint(self.directory, f"best_{metric}", params, epoch=epoch)
            return True
        return False

    def summary(self) -> dict:
        return {m: {"value": self.best[m], "epoch": self.best_epoch[m]}
                for m in self.best}

    def state(self) -> dict:
        """JSON-safe snapshot for checkpoint meta (None = never updated —
        JSON cannot carry the ±inf sentinel)."""
        return {m: {"value": (float(self.best[m])
                              if np.isfinite(self.best[m]) else None),
                    "epoch": self.best_epoch[m]}
                for m in self.best}

    def load_state(self, state: Optional[dict]) -> None:
        """Restore bests saved by state() (used on trainer resume)."""
        for m, s in (state or {}).items():
            if m in self.best and s.get("value") is not None:
                self.best[m] = float(s["value"])
                self.best_epoch[m] = s.get("epoch")
