"""Config round-trips the reference training.yaml schema."""

import yaml

from sunet_tf_tpu.config import Config, config_from_dict, config_to_dict, load_config

REFERENCE_YAML = """
GPU: [0,1,2,3]
VERBOSE: False
SWINUNET:
  IMG_SIZE: 256
  PATCH_SIZE: 4
  WIN_SIZE: 8
  EMB_DIM: 96
  DEPTH_EN: [8, 8, 8, 8]
  HEAD_NUM: [8, 8, 8, 8]
  MLP_RATIO: 4.0
  QKV_BIAS: True
  QK_SCALE: 8
  DROP_RATE: 0.
  ATTN_DROP_RATE: 0.
  DROP_PATH_RATE: 0.1
  APE: False
  PATCH_NORM: True
  USE_CHECKPOINTS: False
  FINAL_UPSAMPLE: 'Dual up-sample'
MODEL:
  MODE: 'Denoising'
OPTIM:
  BATCH: 4
  EPOCHS: 5
  LR_INITIAL: 2e-4
  LR_MIN: 1e-6
TRAINING:
  VAL_AFTER_EVERY: 1
  RESUME: False
  TRAIN_PS: 256
  VAL_PS: 256
  TRAIN_DIR: '/data/train'
  VAL_DIR: '/data/val'
  TEST_DIR: '/data/test'
  SAVE_DIR: '/ckpt'
"""


def test_reference_schema_parses(tmp_path):
    p = tmp_path / "training.yaml"
    p.write_text(REFERENCE_YAML)
    cfg = load_config(str(p))
    sw = cfg.swinunet
    assert sw.img_size == 256 and sw.patch_size == 4 and sw.win_size == 8
    assert sw.emb_dim == 96 and sw.depth_en == (8, 8, 8, 8)
    assert sw.head_num == (8, 8, 8, 8) and sw.mlp_ratio == 4.0
    assert sw.qkv_bias is True and sw.qk_scale == 8.0
    assert sw.drop_path_rate == 0.1 and sw.ape is False and sw.patch_norm is True
    assert cfg.optim.batch == 4 and cfg.optim.epochs == 5
    assert cfg.optim.lr_initial == 2e-4 and cfg.optim.lr_min == 1e-6
    assert cfg.training.train_ps == 256 and cfg.training.resume is False
    assert cfg.mode == "Denoising"


def test_defaults_match_reference_yaml():
    # A bare Config() must equal the reference recipe.
    ref = config_from_dict(yaml.safe_load(REFERENCE_YAML))
    d = Config()
    assert d.swinunet == ref.swinunet.__class__(**{
        **ref.swinunet.__dict__,
    })
    assert d.optim.lr_initial == ref.optim.lr_initial


def test_round_trip():
    cfg = config_from_dict(yaml.safe_load(REFERENCE_YAML))
    again = config_from_dict(config_to_dict(cfg))
    assert again.swinunet == cfg.swinunet
    assert again.optim == cfg.optim
    assert again.training.train_dir == cfg.training.train_dir


def test_qk_scale_none():
    raw = yaml.safe_load(REFERENCE_YAML)
    raw["SWINUNET"]["QK_SCALE"] = None
    cfg = config_from_dict(raw)
    assert cfg.swinunet.qk_scale is None
