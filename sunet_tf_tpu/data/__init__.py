from sunet_tf_tpu.data.pipeline import (  # noqa: F401
    PairDataset,
    batch_iterator,
    list_image_pairs,
    natural_sorted,
    Prefetcher,
)
