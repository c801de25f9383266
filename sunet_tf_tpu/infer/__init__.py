from sunet_tf_tpu.infer.tiled import (  # noqa: F401
    tiled_inference,
    padded_inference,
    required_granularity,
)
from sunet_tf_tpu.infer.export import (  # noqa: F401
    ServingModel,
    save_exported,
)
