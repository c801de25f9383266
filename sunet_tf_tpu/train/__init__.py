from sunet_tf_tpu.train.losses import charbonnier_loss, mse_loss  # noqa: F401
from sunet_tf_tpu.train.schedule import reference_lr_schedule  # noqa: F401
