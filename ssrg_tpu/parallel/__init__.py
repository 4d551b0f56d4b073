"""Multi-chip scaling: meshes, row partitioning, distributed SpMM.

Exports are LAZY (PEP 562): ``ssrg_tpu.parallel.partition`` (the host-side
partition/halo planner) is pure numpy/scipy and importing it does not
initialize jax — analytic comm planning (e.g. ``benchmarks/halo_plan_bench``)
can run next to a live TPU job without touching the single-tenant relay.
Attribute access (``make_mesh``, ``dist_propagate`` …) resolves on demand
and does import jax.
"""

_LAZY = {
    "make_mesh": ("ssrg_tpu.parallel.mesh", "make_mesh"),
    "RowPartition": ("ssrg_tpu.parallel.partition", "RowPartition"),
    "partition_rows": ("ssrg_tpu.parallel.partition", "partition_rows"),
    "ShardedAdj": ("ssrg_tpu.parallel.dist_spmm", "ShardedAdj"),
    "dist_propagate": ("ssrg_tpu.parallel.dist_spmm", "dist_propagate"),
}

__all__ = list(_LAZY)


def __getattr__(name: str):
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(
        f"module 'ssrg_tpu.parallel' has no attribute {name!r}"
    )
