"""Typed configuration with a loader for the reference YAML schema.

The reference drives everything from one ``training.yaml`` with sections
``GPU / VERBOSE / SWINUNET / MODEL / OPTIM / TRAINING`` (reference
training.yaml:1-44, read by train.py:61-64 and both demos). We keep that
schema as the on-disk format so existing recipes carry over unchanged, but
parse it into typed dataclasses.

Deliberate deviations from the reference (all documented in SURVEY.md §2
"known defects"):

- ``use_checkpoint`` is actually wired (the reference's ``u1se_checkpoint``
  ctor typo made the YAML flag dead, reference model/SUNet_detail.py:597).
- ``in_chans`` / ``out_chans`` are configurable instead of hardcoded 3/1
  (reference model/SUNet.py:11-12), which covers both workload
  personalities: RGB->RGB denoising (out_chans=3) and RGB->mask logits
  (out_chans=1).
- New TPU-specific knobs live under the ``TPU`` section (all optional):
  compute dtype, attention backend, mesh shape.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Any, Optional, Sequence

import yaml


@dataclass(frozen=True)
class SwinUNetConfig:
    """Model hyperparameters (reference training.yaml:6-22 SWINUNET keys)."""

    img_size: int = 256
    patch_size: int = 4
    win_size: int = 8
    emb_dim: int = 96
    depth_en: tuple = (8, 8, 8, 8)
    head_num: tuple = (8, 8, 8, 8)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    # The reference YAML sets QK_SCALE: 8 — a constant scale replacing
    # head_dim**-0.5 (reference model/SUNet_detail.py:80,117). Load-bearing
    # for numerical parity; None means head_dim**-0.5.
    qk_scale: Optional[float] = 8.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.1
    ape: bool = False
    patch_norm: bool = True
    use_checkpoint: bool = False
    final_upsample: str = "Dual up-sample"
    in_chans: int = 3
    out_chans: int = 1

    @property
    def num_stages(self) -> int:
        return len(self.depth_en)

    @property
    def patches_resolution(self) -> tuple:
        r = self.img_size // self.patch_size
        return (r, r)


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer/schedule hyperparameters (reference training.yaml:28-34)."""

    batch: int = 4
    epochs: int = 5
    lr_initial: float = 2e-4
    lr_min: float = 1e-6
    # Warmup is hardcoded to 3 epochs in the reference (train.py:128).
    warmup_epochs: int = 3
    beta1: float = 0.9
    beta2: float = 0.999
    eps: float = 1e-8


@dataclass(frozen=True)
class TrainingConfig:
    """Training-run options (reference training.yaml:36-44)."""

    val_after_every: int = 1
    resume: bool = False
    train_ps: int = 256
    val_ps: int = 256
    train_dir: str = ""
    val_dir: str = ""
    test_dir: str = ""
    save_dir: str = "./checkpoints"
    # Reference seeds everything with 85 (train.py:51).
    seed: int = 85
    # Steps-per-epoch cap for synthetic / benchmark runs (0 = full dataset).
    steps_per_epoch: int = 0


@dataclass(frozen=True)
class TPUConfig:
    """TPU-native knobs (new; no reference counterpart)."""

    # Compute dtype for matmuls/convs; params and reductions stay fp32.
    compute_dtype: str = "bfloat16"
    # "pallas" fused kernels, "xla" einsum attention, or "auto"
    # (pallas on TPU, xla elsewhere — pallas interprets off-TPU, too slow
    # for real sizes).
    attention_backend: str = "auto"
    # Data-parallel mesh size; 0 = all local devices.
    data_parallel: int = 0
    # Donate + overlap input pipeline.
    donate: bool = True
    # >0 selects the grain multiprocess input pipeline with that many
    # decode workers for training (data/grain_pipeline.py); 0 keeps the
    # default thread-prefetch pipeline (reference ran num_workers=0,
    # train.py:156 — defect #9).
    data_workers: int = 0
    # Spatial mesh axis size (>1 shards activation H over 'spatial' via
    # GSPMD constraints — parallel/spatial.py::spatial_constrainer; forces
    # the XLA attention path). 1 = data-parallel only.
    spatial: int = 1
    # Adam first-moment (mu) storage dtype. Default "bfloat16" (optax
    # mu_dtype): halves mu HBM residency+traffic — the Adam update is
    # HBM-roofline-bound (7x400MB fp32 state passes) and bf16 mu measured
    # 205.8 vs 198.7 img/s b16 train on v5e (chained harness, same-run
    # A/B). mu is a smoothed gradient; bf16 rounding on it is noise-level
    # (first-step update parity test). "float32" restores bit-exact
    # reference Adam state; checkpoints restore across either choice
    # (orbax casts opt_state to the skeleton dtype — tested).
    opt_mu_dtype: str = "bfloat16"
    # Adam second-moment (nu) storage dtype: "bfloat16_sr" (default —
    # bf16 storage with scalar-dither stochastic rounding), "bfloat16"
    # (deterministic), or "float32" (reference-exact opt-out). nu's
    # 0.999-EMA increments (~0.1% relative) sit BELOW the bf16 ulp, so
    # plain bf16 freezes nu near steady state (bias ≤1 ulp of the
    # adaptive LR); "_sr" keeps the EMA unbiased in expectation. v5e b32
    # same-day A/B: fp32 215.0 / bf16_sr 216.8 / bf16 217.9 img/s —
    # another ~1 HBM pass off the roofline-bound update. Checkpoints
    # restore across every choice. See train/adam.py.
    opt_nu_dtype: str = "bfloat16_sr"

    def __post_init__(self):
        if self.opt_mu_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"TPU.OPT_MU_DTYPE must be float32|bfloat16, "
                f"got {self.opt_mu_dtype!r}")
        if self.opt_nu_dtype not in ("float32", "bfloat16", "bfloat16_sr"):
            raise ValueError(
                f"TPU.OPT_NU_DTYPE must be float32|bfloat16|bfloat16_sr, "
                f"got {self.opt_nu_dtype!r}")


@dataclass(frozen=True)
class Config:
    swinunet: SwinUNetConfig = field(default_factory=SwinUNetConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    tpu: TPUConfig = field(default_factory=TPUConfig)
    mode: str = "Denoising"
    verbose: bool = False

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def _get(d: dict, key: str, default: Any) -> Any:
    v = d.get(key, default)
    return default if v is None else v


def _as_tuple(x: Any) -> tuple:
    if isinstance(x, (list, tuple)):
        return tuple(x)
    return (x,)


def config_from_dict(raw: dict) -> Config:
    """Build a Config from a reference-schema dict (yaml.safe_load output)."""
    sw = raw.get("SWINUNET", {}) or {}
    qk = sw.get("QK_SCALE", 8)
    swin = SwinUNetConfig(
        img_size=int(_get(sw, "IMG_SIZE", 256)),
        patch_size=int(_get(sw, "PATCH_SIZE", 4)),
        win_size=int(_get(sw, "WIN_SIZE", 8)),
        emb_dim=int(_get(sw, "EMB_DIM", 96)),
        depth_en=_as_tuple(_get(sw, "DEPTH_EN", (8, 8, 8, 8))),
        head_num=_as_tuple(_get(sw, "HEAD_NUM", (8, 8, 8, 8))),
        mlp_ratio=float(_get(sw, "MLP_RATIO", 4.0)),
        qkv_bias=bool(_get(sw, "QKV_BIAS", True)),
        qk_scale=None if qk in (None, "None", 0) else float(qk),
        drop_rate=float(_get(sw, "DROP_RATE", 0.0)),
        attn_drop_rate=float(_get(sw, "ATTN_DROP_RATE", 0.0)),
        drop_path_rate=float(_get(sw, "DROP_PATH_RATE", 0.1)),
        ape=bool(_get(sw, "APE", False)),
        patch_norm=bool(_get(sw, "PATCH_NORM", True)),
        use_checkpoint=bool(_get(sw, "USE_CHECKPOINTS", False)),
        final_upsample=str(_get(sw, "FINAL_UPSAMPLE", "Dual up-sample")),
        in_chans=int(_get(sw, "IN_CHANS", 3)),
        out_chans=int(_get(sw, "OUT_CHANS", 1)),
    )
    op = raw.get("OPTIM", {}) or {}
    optim = OptimConfig(
        batch=int(_get(op, "BATCH", 4)),
        epochs=int(_get(op, "EPOCHS", 5)),
        lr_initial=float(_get(op, "LR_INITIAL", 2e-4)),
        lr_min=float(_get(op, "LR_MIN", 1e-6)),
        warmup_epochs=int(_get(op, "WARMUP_EPOCHS", 3)),
    )
    tr = raw.get("TRAINING", {}) or {}
    training = TrainingConfig(
        val_after_every=int(_get(tr, "VAL_AFTER_EVERY", 1)),
        resume=bool(_get(tr, "RESUME", False)),
        train_ps=int(_get(tr, "TRAIN_PS", 256)),
        val_ps=int(_get(tr, "VAL_PS", 256)),
        train_dir=str(_get(tr, "TRAIN_DIR", "")),
        val_dir=str(_get(tr, "VAL_DIR", "")),
        test_dir=str(_get(tr, "TEST_DIR", "")),
        save_dir=str(_get(tr, "SAVE_DIR", "./checkpoints")),
        seed=int(_get(tr, "SEED", 85)),
        steps_per_epoch=int(_get(tr, "STEPS_PER_EPOCH", 0)),
    )
    tp = raw.get("TPU", {}) or {}
    tpu = TPUConfig(
        compute_dtype=str(_get(tp, "COMPUTE_DTYPE", "bfloat16")),
        attention_backend=str(_get(tp, "ATTENTION_BACKEND", "auto")),
        data_parallel=int(_get(tp, "DATA_PARALLEL", 0)),
        donate=bool(_get(tp, "DONATE", True)),
        data_workers=int(_get(tp, "DATA_WORKERS", 0)),
        spatial=int(_get(tp, "SPATIAL", 1)),
        opt_mu_dtype=str(_get(tp, "OPT_MU_DTYPE", "bfloat16")),
        opt_nu_dtype=str(_get(tp, "OPT_NU_DTYPE", "bfloat16_sr")),
    )
    model = raw.get("MODEL", {}) or {}
    return Config(
        swinunet=swin,
        optim=optim,
        training=training,
        tpu=tpu,
        mode=str(_get(model, "MODE", "Denoising")),
        verbose=bool(_get(raw, "VERBOSE", False)),
    )


def load_config(path: str) -> Config:
    """Load a reference-schema training.yaml into a typed Config."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f) or {}
    return config_from_dict(raw)


def config_to_dict(cfg: Config) -> dict:
    """Round-trip back to the reference YAML schema."""
    sw = cfg.swinunet
    return {
        "VERBOSE": cfg.verbose,
        "SWINUNET": {
            "IMG_SIZE": sw.img_size,
            "PATCH_SIZE": sw.patch_size,
            "WIN_SIZE": sw.win_size,
            "EMB_DIM": sw.emb_dim,
            "DEPTH_EN": list(sw.depth_en),
            "HEAD_NUM": list(sw.head_num),
            "MLP_RATIO": sw.mlp_ratio,
            "QKV_BIAS": sw.qkv_bias,
            "QK_SCALE": sw.qk_scale,
            "DROP_RATE": sw.drop_rate,
            "ATTN_DROP_RATE": sw.attn_drop_rate,
            "DROP_PATH_RATE": sw.drop_path_rate,
            "APE": sw.ape,
            "PATCH_NORM": sw.patch_norm,
            "USE_CHECKPOINTS": sw.use_checkpoint,
            "FINAL_UPSAMPLE": sw.final_upsample,
            "IN_CHANS": sw.in_chans,
            "OUT_CHANS": sw.out_chans,
        },
        "MODEL": {"MODE": cfg.mode},
        "OPTIM": {
            "BATCH": cfg.optim.batch,
            "EPOCHS": cfg.optim.epochs,
            "LR_INITIAL": cfg.optim.lr_initial,
            "LR_MIN": cfg.optim.lr_min,
            "WARMUP_EPOCHS": cfg.optim.warmup_epochs,
        },
        "TRAINING": {
            "VAL_AFTER_EVERY": cfg.training.val_after_every,
            "RESUME": cfg.training.resume,
            "TRAIN_PS": cfg.training.train_ps,
            "VAL_PS": cfg.training.val_ps,
            "TRAIN_DIR": cfg.training.train_dir,
            "VAL_DIR": cfg.training.val_dir,
            "TEST_DIR": cfg.training.test_dir,
            "SAVE_DIR": cfg.training.save_dir,
            "SEED": cfg.training.seed,
        },
        "TPU": {
            "COMPUTE_DTYPE": cfg.tpu.compute_dtype,
            "ATTENTION_BACKEND": cfg.tpu.attention_backend,
            "DATA_PARALLEL": cfg.tpu.data_parallel,
            "DONATE": cfg.tpu.donate,
            "DATA_WORKERS": cfg.tpu.data_workers,
            "SPATIAL": cfg.tpu.spatial,
            "OPT_MU_DTYPE": cfg.tpu.opt_mu_dtype,
            "OPT_NU_DTYPE": cfg.tpu.opt_nu_dtype,
        },
    }


def scaled_config(**overrides) -> Config:
    """The BASELINE.json config #5: scaled SUNet — EMB_DIM 180, WIN_SIZE 16,
    512x512 patches, intended for data-parallel pod-slice training.
    Heads chosen so every stage has head_dim 30 (180/6 ... 1440/48)."""
    base = dict(
        img_size=512,
        patch_size=4,
        win_size=16,
        emb_dim=180,
        depth_en=(8, 8, 8, 8),
        head_num=(6, 12, 24, 48),
        qk_scale=None,  # default head_dim**-0.5 for the scaled recipe
    )
    base.update({k: v for k, v in overrides.items()
                 if k in SwinUNetConfig.__dataclass_fields__})
    swin = SwinUNetConfig(**base)
    return Config(swinunet=swin,
                  training=TrainingConfig(train_ps=512, val_ps=512))


def tiny_config(**overrides) -> Config:
    """A small config for tests/CI: same topology, tiny dims."""
    swin = SwinUNetConfig(
        img_size=64,
        patch_size=4,
        win_size=4,
        emb_dim=16,
        depth_en=(2, 2, 2, 2),
        head_num=(2, 2, 2, 2),
        drop_path_rate=0.1,
        **{k: v for k, v in overrides.items() if k in SwinUNetConfig.__dataclass_fields__},
    )
    return Config(swinunet=swin, training=TrainingConfig(train_ps=64, val_ps=64))
