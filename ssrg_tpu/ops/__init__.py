"""Device ops: sparse formats, normalizations, propagation, combiners.

Exports are LAZY (PEP 562): importing jax-free submodules
(``ssrg_tpu.ops.normalize``, ``ssrg_tpu.ops.reorder`` — pure numpy/scipy
host-side graph work) does not initialize jax, so planning scripts can run
next to a live TPU job without touching the single-tenant relay
(CLAUDE.md: serialize ALL jax-importing processes with TPU jobs).
Attribute access (``ssrg_tpu.ops.device_adjacency`` etc.) resolves on
demand and does import jax; submodule attributes (``ssrg_tpu.ops.sparse``
etc.) import lazily too, preserving the eager-init-era public API.
"""

_LAZY = {
    "DenseAdj": ("ssrg_tpu.ops.sparse", "DenseAdj"),
    "COOAdj": ("ssrg_tpu.ops.sparse", "COOAdj"),
    "ELLAdj": ("ssrg_tpu.ops.sparse", "ELLAdj"),
    "device_adjacency": ("ssrg_tpu.ops.sparse", "device_adjacency"),
    "propagate": ("ssrg_tpu.ops.propagate", "propagate"),
    "propagate_complex": ("ssrg_tpu.ops.propagate", "propagate_complex"),
    "propagate_multi": ("ssrg_tpu.ops.propagate", "propagate_multi"),
}

_SUBMODULES = (
    "normalize", "combine", "reorder", "sparse", "propagate", "sddmm",
    "autotune", "pallas_spmm", "pallas_banded", "pallas_rest",
)

__all__ = list(_LAZY) + list(_SUBMODULES)


def __getattr__(name: str):
    import importlib

    if name in _SUBMODULES:
        return importlib.import_module(f"ssrg_tpu.ops.{name}")
    if name in _LAZY:
        module, attr = _LAZY[name]
        return getattr(importlib.import_module(module), attr)
    raise AttributeError(f"module 'ssrg_tpu.ops' has no attribute {name!r}")


def __dir__():
    return sorted(set(globals()) | set(__all__))
