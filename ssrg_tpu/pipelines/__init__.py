from ssrg_tpu.pipelines.sparsify import (  # noqa: F401
    feature_masked,
    edge_masked,
    save_raw_dataset,
    sparsify_dataset,
)
from ssrg_tpu.pipelines.augment import (  # noqa: F401
    feature_augment,
    edge_augment,
    augment_dataset,
)
