"""End-to-end training: tiny model, synthetic data, loss decreases,
checkpoints written, resume works, both tasks."""

import os

import numpy as np
import pytest
from PIL import Image

from sunet_tf_tpu.config import tiny_config


def _make_dataset(root, n=8, size=64, mask_task=False, seed=0):
    rng = np.random.default_rng(seed)
    os.makedirs(os.path.join(root, "input"), exist_ok=True)
    os.makedirs(os.path.join(root, "target"), exist_ok=True)
    for i in range(n):
        if mask_task:
            tar = np.zeros((size, size, 3), np.uint8)
            r, c = rng.integers(8, size - 24, 2)
            tar[r : r + 16, c : c + 16] = 255
            inp = np.clip(tar.astype(np.int16)
                          + rng.integers(-60, 60, tar.shape), 0, 255).astype(np.uint8)
        else:
            tar = rng.integers(0, 255, (size, size, 3), dtype=np.uint8)
            inp = tar  # denoise task synthesizes noise on device
        Image.fromarray(inp).save(os.path.join(root, "input", f"img_{i:03d}.png"))
        Image.fromarray(tar).save(os.path.join(root, "target", f"img_{i:03d}.png"))


@pytest.fixture(scope="module")
def cfg_factory(tmp_path_factory):
    def make(task):
        root = tmp_path_factory.mktemp(f"data_{task}")
        _make_dataset(str(root / "train"), n=8, mask_task=task == "mask")
        _make_dataset(str(root / "val"), n=2, mask_task=task == "mask")
        _make_dataset(str(root / "test"), n=2, mask_task=task == "mask",
                      seed=7)
        cfg = tiny_config()
        if task == "denoise":
            # denoise is RGB->RGB (validated by Trainer)
            cfg = cfg.replace(swinunet=cfg.swinunet.__class__(
                **{**cfg.swinunet.__dict__, "out_chans": 3}))
        cfg = cfg.replace(
            optim=cfg.optim.__class__(batch=4, epochs=2, lr_initial=1e-3,
                                      lr_min=1e-5, warmup_epochs=1),
            training=cfg.training.__class__(
                train_ps=64, val_ps=64,
                train_dir=str(root / "train"), val_dir=str(root / "val"),
                test_dir=str(root / "test"),
                save_dir=str(root / "ckpt"), seed=85),
            # data_parallel=1 keeps CPU-host compiles fast; the sharded path
            # is covered by test_sharding.py / dryrun_multichip.
            tpu=cfg.tpu.__class__(compute_dtype="float32", data_parallel=1),
        )
        return cfg

    return make


def test_mask_task_end_to_end(cfg_factory):
    from sunet_tf_tpu.train.trainer import Trainer

    cfg = cfg_factory("mask")
    t = Trainer(cfg, task="mask", verbose=False)
    summary = t.fit()
    # losses logged for both epochs; AUROC/AUPRC on ALL THREE splits
    # (reference train.py:380-416 train, :483-531 val, :533-587 test)
    hist = t.logger.history
    assert set(hist[("train", "loss")]) == {1, 2}
    for split in ("train", "val", "test"):
        assert (split, "auroc") in hist, f"missing {split} auroc"
        assert (split, "auprc") in hist, f"missing {split} auprc"
    assert ("val", "mse_w") in hist
    auroc = hist[("val", "auroc")][2]
    assert 0.0 <= auroc <= 1.0
    # per-epoch ROC/PR plot PNGs exist for every split
    plots = os.path.join(t.log_dir, "plots")
    for split in ("train", "val", "test"):
        for sub in ("roc", "pr"):
            d = os.path.join(plots, sub, split)
            assert os.path.isdir(d) and os.listdir(d), f"no {sub}/{split} plots"
    # the reference's four cumulative overlay chart sets (train.py:592-712)
    for combo in ("train", "val", "train_val", "train_val_test"):
        d = os.path.join(plots, "overlay", combo)
        assert os.path.isdir(d) and os.listdir(d), f"no overlay set {combo}"
    # latest + best checkpoints written
    assert os.path.isdir(os.path.join(t.model_dir, "latest"))
    assert any(d.startswith("best_") for d in os.listdir(t.model_dir))
    # CSV written
    assert os.path.isfile(os.path.join(t.log_dir, "metrics_per_epoch.csv"))
    assert summary["best"]["auroc"]["epoch"] is not None


def test_denoise_task_loss_decreases(cfg_factory):
    from sunet_tf_tpu.train.trainer import Trainer

    cfg = cfg_factory("denoise")
    cfg = cfg.replace(optim=cfg.optim.__class__(
        batch=4, epochs=3, lr_initial=2e-3, lr_min=1e-5, warmup_epochs=1))
    t = Trainer(cfg, task="denoise", sigma=25.0, verbose=False)
    t.fit()
    losses = [t.logger.history[("train", "loss")][e] for e in (1, 2, 3)]
    assert losses[-1] < losses[0], f"loss did not decrease: {losses}"
    assert ("val", "psnr") in t.logger.history


def test_resume_continues(cfg_factory):
    from sunet_tf_tpu.train.trainer import Trainer

    cfg = cfg_factory("mask")
    t1 = Trainer(cfg, task="mask", verbose=False)
    t1.fit()
    cfg2 = cfg.replace(
        optim=cfg.optim.__class__(batch=4, epochs=3, lr_initial=1e-3,
                                  lr_min=1e-5, warmup_epochs=1),
        training=cfg.training.__class__(**{**cfg.training.__dict__, "resume": True}),
    )
    t2 = Trainer(cfg2, task="mask", verbose=False)
    assert t2.start_epoch == 3  # resumes after epoch 2
    t2.fit()
    assert 3 in t2.logger.history[("train", "loss")]
