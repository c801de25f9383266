"""sunet_tf_tpu — a TPU-native (JAX/XLA/Pallas) image-restoration framework.

Re-designed from scratch with the capabilities of the reference SUNet_TF
repository (Swin-Transformer UNet for denoising / dense binary prediction),
built TPU-first:

- NHWC layouts, static shapes, bf16 compute with fp32 accumulation/master
  weights, XLA-friendly control flow.
- Window attention implemented both as pure-XLA einsums and as a fused
  Pallas TPU kernel.
- Scale-out via ``jax.sharding`` meshes (data parallel + optional spatial
  sharding), not host-side replication.
- Fully on-device training step: AWGN synthesis, dihedral augmentation,
  boundary-ring loss weights (morphological dilation), Charbonnier loss,
  metrics — no per-batch host round trips (the reference synced to host
  every batch, see reference train.py:226-249).

Reference capability map lives in SURVEY.md at the repo root.
"""

__version__ = "0.1.0"

from sunet_tf_tpu.config import (  # noqa: F401
    Config,
    OptimConfig,
    SwinUNetConfig,
    TrainingConfig,
    load_config,
)
from sunet_tf_tpu.models import SUNet, build_model  # noqa: F401
