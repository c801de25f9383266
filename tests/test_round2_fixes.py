"""Regression tests for round-2 fixes (VERDICT weak #1, ADVICE low items):

- LR schedule / steps_per_epoch alignment under drop_last (epoch drift).
- ATTENTION_BACKEND loader default 'auto' (was 'xla', silently disabling
  the Pallas kernels for YAML-driven runs).
- Prefetcher error propagation (a decode error must fail the epoch, not
  silently truncate it).
- Partial-batch padding to the data-mesh multiple.
- BestTracker state persistence across resume.
"""

import os

import numpy as np
import pytest
from PIL import Image

from sunet_tf_tpu.config import config_from_dict, tiny_config


def _make_dataset(root, n, size=64, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "input"), exist_ok=True)
    os.makedirs(os.path.join(root, "target"), exist_ok=True)
    for i in range(n):
        tar = np.zeros((size, size, 3), np.uint8)
        r, c = rng.integers(8, size - 24, 2)
        tar[r : r + 16, c : c + 16] = 255
        Image.fromarray(tar).save(os.path.join(root, "input", f"i_{i:03d}.png"))
        Image.fromarray(tar).save(os.path.join(root, "target", f"i_{i:03d}.png"))


def test_config_default_backend_auto():
    cfg = config_from_dict({})
    assert cfg.tpu.attention_backend == "auto"
    # dataclass default and loader default must agree (ADVICE #2)
    assert cfg.tpu.attention_backend == type(cfg.tpu)().attention_backend


def test_lr_schedule_epoch_alignment_uneven_dataset(tmp_path):
    """n % batch != 0: the optax schedule must hand epoch e's reference LR
    to every optimizer step actually executed during epoch e
    (VERDICT weak #1 — ceil steps_per_epoch vs drop_last floor)."""
    from sunet_tf_tpu.data.pipeline import batch_iterator
    from sunet_tf_tpu.train.loop import make_optax_lr_schedule
    from sunet_tf_tpu.train.schedule import reference_lr_schedule
    from sunet_tf_tpu.train.trainer import Trainer

    _make_dataset(str(tmp_path / "train"), n=7)  # 7 % 4 != 0
    cfg = tiny_config()
    cfg = cfg.replace(
        optim=cfg.optim.__class__(batch=4, epochs=10, lr_initial=2e-4,
                                  lr_min=1e-6, warmup_epochs=3),
        training=cfg.training.__class__(
            train_ps=64, val_ps=64, train_dir=str(tmp_path / "train"),
            save_dir=str(tmp_path / "ckpt"), seed=85),
        tpu=cfg.tpu.__class__(compute_dtype="float32", data_parallel=1),
    )
    t = Trainer(cfg, task="mask", verbose=False)

    # steps_per_epoch must equal what train_epoch actually runs
    it = batch_iterator(t.train_ds, cfg.optim.batch, shuffle=True,
                        drop_last=len(t.train_ds) > cfg.optim.batch,
                        seed=cfg.training.seed + 1,
                        pad_to=t.mesh.shape.get("data", 1))
    actual_steps = sum(1 for _ in it)
    assert actual_steps == t.steps_per_epoch == 1  # floor(7/4)

    sched = make_optax_lr_schedule(cfg, t.steps_per_epoch)
    import jax.numpy as jnp

    for epoch in range(1, cfg.optim.epochs + 1):
        want = reference_lr_schedule(epoch, cfg.optim.lr_initial,
                                     cfg.optim.lr_min, cfg.optim.epochs,
                                     cfg.optim.warmup_epochs)
        for step_in_epoch in range(t.steps_per_epoch):
            count = (epoch - 1) * t.steps_per_epoch + step_in_epoch
            got = float(sched(jnp.uint32(count)))
            assert got == pytest.approx(want, rel=1e-6), (
                f"epoch {epoch} step {step_in_epoch}: {got} != {want}")


def test_prefetcher_propagates_errors():
    from sunet_tf_tpu.data.pipeline import Prefetcher

    def bad_iter():
        yield {"input": np.zeros(1), "names": ["a"]}
        raise ValueError("decode failed")

    pf = Prefetcher(bad_iter())
    got = []
    with pytest.raises(ValueError, match="decode failed"):
        for item, _names in pf:
            got.append(item)
    assert len(got) == 1  # the good batch was delivered first


def test_batch_iterator_pads_partial_to_multiple(tmp_path):
    from sunet_tf_tpu.data.pipeline import PairDataset, batch_iterator

    _make_dataset(str(tmp_path / "d"), n=6)
    ds = PairDataset(str(tmp_path / "d"), 64, train=False)
    batches = list(batch_iterator(ds, 4, shuffle=False, pad_to=4))
    assert [b["input"].shape[0] for b in batches] == [4, 4]
    assert len(batches[1]["names"]) == 4
    # the pad wraps to the epoch's first samples
    assert batches[1]["names"][2:] == batches[0]["names"][:2]
    # pad_to=1 keeps the partial batch untouched
    batches = list(batch_iterator(ds, 4, shuffle=False, pad_to=1))
    assert [b["input"].shape[0] for b in batches] == [4, 2]


def test_best_tracker_state_roundtrip(tmp_path):
    from sunet_tf_tpu.ckpt import BestTracker

    bt = BestTracker(str(tmp_path), ("auroc", "auprc"), mode="max")
    bt.update("auroc", 0.9, 3, {"w": np.zeros(2, np.float32)})
    state = bt.state()
    assert state["auroc"] == {"value": 0.9, "epoch": 3}
    assert state["auprc"]["value"] is None  # -inf is not JSON-safe

    bt2 = BestTracker(str(tmp_path), ("auroc", "auprc"), mode="max")
    bt2.load_state(state)
    # a worse value after restore must NOT overwrite the best checkpoint
    assert not bt2.update("auroc", 0.5, 4, {"w": np.zeros(2, np.float32)})
    assert bt2.update("auroc", 0.95, 5, {"w": np.zeros(2, np.float32)})
    assert bt2.best_epoch["auroc"] == 5


def test_shift_softmax_overflow_guard(monkeypatch):
    """r2 ADVICE finding: exp(s-40) overflowed for logits > ~127. The
    opt-in 'shift' form must stay finite for ANY input and remain exact
    inside the (-47, 80] band; the DEFAULT (rowmax, r3 flip) is exact
    everywhere including super-band logits."""
    import jax
    import jax.numpy as jnp

    from sunet_tf_tpu.kernels.window_attention import _shift_softmax

    hot = jnp.array([[200.0, 100.0, 0.0], [500.0, 499.0, -500.0]])

    # default path (no env): exact softmax for any logit scale
    monkeypatch.delenv("SUNET_SOFTMAX", raising=False)
    np.testing.assert_allclose(np.asarray(_shift_softmax(hot)),
                               np.asarray(jax.nn.softmax(hot, axis=-1)),
                               rtol=1e-5, atol=1e-8)

    monkeypatch.setenv("SUNET_SOFTMAX", "shift")
    p = np.asarray(_shift_softmax(hot))
    assert np.all(np.isfinite(p))
    assert np.allclose(p.sum(-1), 1.0, atol=1e-6)

    band = jnp.array([[5.0, -3.0, 0.5], [79.0, 60.0, -40.0]])
    np.testing.assert_allclose(np.asarray(_shift_softmax(band)),
                               np.asarray(jax.nn.softmax(band, axis=-1)),
                               rtol=1e-5, atol=1e-8)


def test_best_state_persists_in_latest_checkpoint(tmp_path):
    from sunet_tf_tpu.ckpt import restore_checkpoint, save_checkpoint

    params = {"w": np.arange(4, dtype=np.float32)}
    save_checkpoint(str(tmp_path), "latest", params, epoch=7,
                    extra={"best": {"auroc": {"value": 0.88, "epoch": 5}}})
    out = restore_checkpoint(os.path.join(str(tmp_path), "latest"), params)
    assert out["meta"]["best"]["auroc"]["value"] == pytest.approx(0.88)
    assert out["epoch"] == 7


def test_train_iterator_selects_grain_when_workers_set(tmp_path, monkeypatch):
    """TPU.DATA_WORKERS > 0 routes training batches through the grain
    multiprocess pipeline; 0 keeps the default thread-prefetch path."""
    from sunet_tf_tpu.data import grain_pipeline
    from sunet_tf_tpu.train.trainer import Trainer

    calls = {}

    def fake_grain(root, ps, batch, **kw):
        calls["args"] = (root, ps, batch, kw)
        return iter(())

    monkeypatch.setattr(grain_pipeline, "grain_batch_iterator", fake_grain)

    t = object.__new__(Trainer)  # _train_iterator uses only these attrs
    cfg = tiny_config()
    t.cfg = cfg.replace(
        training=cfg.training.__class__(train_dir="/data/train", train_ps=64,
                                        seed=85),
        tpu=cfg.tpu.__class__(data_workers=3),
        optim=cfg.optim.__class__(batch=4),
    )
    t.train_ds = list(range(10))  # len > batch -> drop_last -> grain eligible

    class _Mesh:
        shape = {"data": 1}

    t.mesh = _Mesh()
    it = t._train_iterator(epoch=2)
    list(it)
    root, ps, batch, kw = calls["args"]
    assert (root, ps, batch) == ("/data/train", 64, 4)
    assert kw["workers"] == 3 and kw["seed"] == 85 + 2 and kw["drop_last"]

    t.cfg = t.cfg.replace(tpu=cfg.tpu.__class__(data_workers=0))
    calls.clear()
    with pytest.raises(Exception):
        # default path hits the real (nonexistent) dataset's .get — proves
        # grain was NOT selected without spinning up real data
        next(iter(t._train_iterator(epoch=2)))
    assert not calls
