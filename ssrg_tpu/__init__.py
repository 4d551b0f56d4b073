"""ssrg_tpu — TPU-native Scalable Spectral-Robust GNN framework.

A brand-new JAX/XLA/Pallas/pjit framework with the capabilities of the
``Scalable-Roubust-GNN`` reference (see /root/repo/SURVEY.md): precompute-family
spectral GNNs (SGC / SSGC / SIGN / GBP / GAMLP / NAFS / naive GCN / graph-wavelet
GWNN), seven adjacency normalizations, thirteen hop-combination message
operators, robustness pipelines (graph sparsification + learned feature/edge
augmentation), and node/link classification tasks — redesigned TPU-first:

- K-hop sparse propagation runs on-device as ``lax.scan`` over an SpMM engine
  (dense / BCOO / sorted-COO segment-sum / Pallas kernels) instead of the
  reference's ctypes C OpenMP CSR kernel
  (reference: ``SSRG/operators/csrc/matmul.c``).
- Multi-chip scaling uses a ``jax.sharding.Mesh`` with row-partitioned
  adjacency and halo exchange via ``shard_map`` collectives, a capability the
  single-process reference does not have.
- Training heads are pure-JAX (flax linen) MLP/logistic-regression modules
  with jitted optax train steps.

Directory map (ssrg_tpu == "scalable-roubust-gnn_tpu", name sanitized so the
package is importable):

- ``data/``      Graph/Edge containers, dataset loaders, synthetic generators
- ``ops/``       sparse formats, normalizations, SpMM engines, propagation,
                 message combiners, Pallas kernels
- ``models/``    NN heads + model zoo + wavelet/GWNN
- ``parallel/``  device meshes, graph partitioning, distributed SpMM
- ``train/``     node/link classification tasks, metrics, train loops
- ``pipelines/`` sparsify + augmentation robustness pipelines
- ``configs/``   dataclass-based configuration tree (no import-time argparse)
"""

__version__ = "0.1.0"

from ssrg_tpu.configs.config import (  # noqa: F401
    DataConfig,
    ModelConfig,
    TrainingConfig,
    WaveletConfig,
    FrameworkConfig,
)


def load_model(*args, **kwargs):
    """Convenience re-export of :func:`ssrg_tpu.models.zoo.load_model`
    (lazy import keeps bare-config imports light)."""
    from ssrg_tpu.models.zoo import load_model as _lm

    return _lm(*args, **kwargs)


def Predictor(*args, **kwargs):
    """Convenience re-export of :class:`ssrg_tpu.serve.Predictor`."""
    from ssrg_tpu.serve import Predictor as _P

    return _P(*args, **kwargs)
