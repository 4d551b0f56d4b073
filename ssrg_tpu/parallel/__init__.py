from ssrg_tpu.parallel.mesh import make_mesh  # noqa: F401
from ssrg_tpu.parallel.partition import RowPartition, partition_rows  # noqa: F401
from ssrg_tpu.parallel.dist_spmm import ShardedAdj, dist_propagate  # noqa: F401
