"""Device ops: sparse formats, normalizations, propagation, combiners.

Exports are LAZY (PEP 562): importing jax-free submodules
(``ssrg_tpu.ops.normalize``, ``ssrg_tpu.ops.reorder`` — pure numpy/scipy
host-side graph work) does not initialize jax, so planning scripts can run
next to a live TPU job without touching the single-tenant relay
(CLAUDE.md: serialize ALL jax-importing processes with TPU jobs).
Attribute access (``ssrg_tpu.ops.device_adjacency`` etc.) resolves on
demand and does import jax.
"""

_LAZY = {
    "DenseAdj": ("ssrg_tpu.ops.sparse", "DenseAdj"),
    "COOAdj": ("ssrg_tpu.ops.sparse", "COOAdj"),
    "ELLAdj": ("ssrg_tpu.ops.sparse", "ELLAdj"),
    "device_adjacency": ("ssrg_tpu.ops.sparse", "device_adjacency"),
    "propagate": ("ssrg_tpu.ops.propagate", "propagate"),
    "propagate_complex": ("ssrg_tpu.ops.propagate", "propagate_complex"),
    "propagate_multi": ("ssrg_tpu.ops.propagate", "propagate_multi"),
    "normalize": ("ssrg_tpu.ops", "normalize"),
    "combine": ("ssrg_tpu.ops", "combine"),
}

__all__ = list(_LAZY)


def __getattr__(name: str):
    if name in ("normalize", "combine"):
        import importlib

        return importlib.import_module(f"ssrg_tpu.ops.{name}")
    if name in _LAZY:
        import importlib

        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'ssrg_tpu.ops' has no attribute {name!r}")
