"""Checkpointing: save/restore round trip, rotation, best tracking."""

import os

import jax.numpy as jnp
import numpy as np

from sunet_tf_tpu.ckpt import (
    BestTracker,
    latest_path,
    restore_checkpoint,
    save_checkpoint,
)


def _params():
    return {"w": jnp.arange(6.0).reshape(2, 3), "b": jnp.ones(3)}


def test_save_restore_roundtrip(tmp_path):
    p = _params()
    opt = {"m": jnp.zeros((2, 3)), "count": jnp.asarray(7, jnp.int32)}
    save_checkpoint(str(tmp_path), "latest", p, opt, epoch=4)
    out = restore_checkpoint(os.path.join(tmp_path, "latest"), p, opt)
    assert int(out["epoch"]) == 4
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]), np.asarray(p["w"]))
    assert int(out["opt_state"]["count"]) == 7


def test_overwrite_rotation(tmp_path):
    p = _params()
    save_checkpoint(str(tmp_path), "latest", p, epoch=1)
    p2 = {"w": p["w"] * 2, "b": p["b"]}
    save_checkpoint(str(tmp_path), "latest", p2, epoch=2)
    out = restore_checkpoint(os.path.join(tmp_path, "latest"), p)
    assert int(out["epoch"]) == 2
    np.testing.assert_array_equal(np.asarray(out["params"]["w"]),
                                  np.asarray(p2["w"]))


def test_latest_path(tmp_path):
    assert latest_path(str(tmp_path)) is None
    save_checkpoint(str(tmp_path), "latest", _params(), epoch=1)
    assert latest_path(str(tmp_path)) is not None


def test_best_tracker_saves_only_improvements(tmp_path):
    bt = BestTracker(str(tmp_path), ("auroc",))
    p = _params()
    assert bt.update("auroc", 0.7, 1, p)
    assert not bt.update("auroc", 0.6, 2, p)
    assert bt.update("auroc", 0.9, 3, p)
    assert not bt.update("auroc", float("nan"), 4, p)
    assert bt.summary()["auroc"] == {"value": 0.9, "epoch": 3}
    assert os.path.isdir(os.path.join(tmp_path, "best_auroc"))
    out = restore_checkpoint(os.path.join(tmp_path, "best_auroc"), p)
    assert int(out["epoch"]) == 3
