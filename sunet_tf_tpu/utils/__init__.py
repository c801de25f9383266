from sunet_tf_tpu.utils.color import (  # noqa: F401
    hsl2rgb,
    hsv2rgb,
    rgb2hsl,
    rgb2hsv,
)
from sunet_tf_tpu.utils.augment import MixUp, gaussian_blur_kernel, gaussian_blur  # noqa: F401
from sunet_tf_tpu.utils.dirs import get_last_path, mkdir, mkdirs  # noqa: F401
from sunet_tf_tpu.utils.freeze import freeze_mask, partition_trainable  # noqa: F401
