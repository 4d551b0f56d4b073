from ssrg_tpu.data.graph import Edge, Graph  # noqa: F401
from ssrg_tpu.data.base_dataset import NodeDataset  # noqa: F401
from ssrg_tpu.data.synthetic import random_graph, sbm_graph, planetoid_like  # noqa: F401
