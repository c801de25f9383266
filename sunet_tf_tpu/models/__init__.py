from sunet_tf_tpu.models.sunet import SUNet, build_model  # noqa: F401
from sunet_tf_tpu.models.layers import (  # noqa: F401
    Mlp,
    WindowAttention,
    SwinBlock,
    PatchMerging,
    PatchEmbed,
    DualUpsample,
    PReLU,
)
