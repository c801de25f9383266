from sunet_tf_tpu.ops.window import (  # noqa: F401
    window_partition,
    window_reverse,
    relative_position_index,
    shift_attn_mask,
    effective_window,
)
from sunet_tf_tpu.ops.image import (  # noqa: F401
    pixel_shuffle,
    bilinear_resize,
    rgb_to_gray,
    psnr,
    ssim,
    dihedral,
    add_awgn,
)
from sunet_tf_tpu.ops.morphology import boundary_ring_weights  # noqa: F401
