from ssrg_tpu.train.node_classification import NodeClassification  # noqa: F401
from ssrg_tpu.train.link_classification import LinkClassification  # noqa: F401
from ssrg_tpu.train.augment_train import TrainModel  # noqa: F401
from ssrg_tpu.train.baseline_task import BaselineTask  # noqa: F401
from ssrg_tpu.train.base_task import BaseTask  # noqa: F401
from ssrg_tpu.train.common import accuracy, seed_everything  # noqa: F401
