from sunet_tf_tpu.data.pipeline import (  # noqa: F401
    PairDataset,
    batch_iterator,
    list_image_pairs,
    natural_sorted,
    Prefetcher,
)
from sunet_tf_tpu.data.synth import generate_dataset, synth_image  # noqa: F401
