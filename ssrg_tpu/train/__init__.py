from ssrg_tpu.train.node_classification import NodeClassification  # noqa: F401
from ssrg_tpu.train.common import accuracy, seed_everything  # noqa: F401
