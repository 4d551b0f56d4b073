from ssrg_tpu.ops.sparse import DenseAdj, COOAdj, ELLAdj, device_adjacency  # noqa: F401
from ssrg_tpu.ops.propagate import (  # noqa: F401
    propagate,
    propagate_complex,
    propagate_multi,
)
from ssrg_tpu.ops import normalize  # noqa: F401
from ssrg_tpu.ops import combine  # noqa: F401
