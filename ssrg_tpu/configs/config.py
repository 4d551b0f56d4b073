"""Dataclass configuration tree.

Replaces the reference's five import-time argparse modules
(reference: ``SSRG/configs/*.py`` — module-level ``parser.parse_args()`` that
side-effect every importing script; SURVEY.md §2.10/§2.13) with one composable,
side-effect-free config tree. A single CLI entry (``ssrg_tpu/cli.py``) parses
flags into these dataclasses.

Defaults mirror the reference defaults:
- model: ``SSRG/configs/model_config.py`` (model "wavelet", K=3, r=0.5,
  hidden 256, dropout 0.5, ppr_alpha 0.1, message_alpha 0.5, q 0.05,
  cheby order 3, tolerance 1e-4, scale 0.5)
- training: ``SSRG/configs/training_config.py`` (seed 2023, 300 epochs,
  Adam lr 1e-3, wd 1e-5, normalize_times 1)
- data: ``SSRG/configs/data_config.py``; augmentation:
  ``SSRG/configs/data_augument_config.py``; sparsify:
  ``SSRG/configs/data_process_config.py``.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple


@dataclass
class DataConfig:
    """Which dataset to load (reference: SSRG/configs/data_config.py:12-14)."""

    data_name: str = "cora_0_0"
    data_root: str = "./sparsity_datasets/simhomo/Planetoid"
    data_split: str = "official"
    # read by the reference's planetoid loader but never defined in its config
    # (latent AttributeError, SURVEY.md §2.9) — defined here
    heterogeneity: bool = False


@dataclass
class DataProcessConfig:
    """Sparsification pipeline (reference: SSRG/configs/data_process_config.py)."""

    dataset: str = "pubmed"
    dataroot: str = "./datasets/simhomo/"
    seed: int = 2023
    sparse_rate: Tuple[float, float] = (0.6, 0.6)  # (feature_rate, edge_rate)


@dataclass
class DataAugmentConfig:
    """Robust augmentation pipeline (reference: SSRG/configs/data_augument_config.py)."""

    data_name: str = "pubmed_0.6_0.6"
    data_root: str = "./sparsity_datasets/simhomo/Planetoid"
    data_save_path: str = "./augument_datasets/simhomo/Planetoid/"
    data_split: str = "official"
    dropout: float = 0.5
    weight_decay: float = 5e-4
    hidden_dim: int = 256
    num_layers: int = 3
    batch_size: int = 300
    prop_steps: int = 3
    r: float = 0.5
    degree_level: int = 1
    lr: float = 0.01
    epochs: int = 200
    candidates_per_deficit: int = 100  # reference samples (deficit)*100 candidates
    # loss-term weights: the reference defines L1(sparse vs clean logits) and
    # CE(sparse logits) terms but ships with only CE(clean) active
    # (data_augument.py:39-44); exposed here as optional weights
    l1_weight: float = 0.0
    sparse_ce_weight: float = 0.0


@dataclass
class WaveletConfig:
    """Graph-wavelet (GWNN) settings (reference: SSRG/configs/model_config.py:19-25)."""

    approximation_order: int = 3
    tolerance: float = 1e-4
    scale: float = 0.5
    impulse_batch: int = 1024  # reference uses 1000 (base_model.py:237); 1024 aligns to lanes
    # Φ construction is O(N²/impulse_batch) SpMM batches with dense [N, batch]
    # intermediates — fine at Planetoid scale (seconds, see docs/API.md), but
    # hours + ~100 GB of host thresholding at arxiv scale. Refuse past this.
    max_nodes: int = 65_536


@dataclass
class ModelConfig:
    """Model zoo settings (reference: SSRG/configs/model_config.py)."""

    model_name: str = "sgc"
    num_layers: int = 3
    dropout: float = 0.5
    hidden_dim: int = 256
    prop_steps: int = 3
    r: float = 0.5            # generalized symmetric-norm exponent
    ppr_alpha: float = 0.1
    message_alpha: float = 0.5
    q: float = 0.05           # magnetic Laplacian phase parameter
    use_bn: bool = False
    edge_mode: str = "concat"  # link-scorer pair features: concat (reference
    # parity, simple_models.py:106,154) | hadamard (adds a*b, |a-b| channels)
    dtype: str = "float32"   # head compute dtype ("bfloat16" for MXU fast path)
    wavelet: WaveletConfig = field(default_factory=WaveletConfig)


@dataclass
class TrainingConfig:
    """Training loop settings (reference: SSRG/configs/training_config.py)."""

    seed: int = 2023
    normalize_times: int = 1
    num_epochs: int = 300
    lr: float = 1e-3
    weight_decay: float = 1e-5
    warmup_epochs: int = 0  # linear lr ramp over the first N steps
    # (reference adjust_learning_rate, SSRG/tasks/utils.py:20-23)
    train_batch_size: Optional[int] = None  # None => full-batch
    eval_batch_size: Optional[int] = None
    dtype: str = "float32"      # training compute dtype
    spmm_engine: str = "auto"   # auto | dense | coo | ell | hybrid | pallas
    # fast half-precision tier for the dense-block engines: bf16 block/tile
    # storage; on TPU the reorder_banded path additionally stages the X
    # window in bf16 with 512-row blocks (measured 1.135 B edges/s vs 861 M,
    # docs/PERFORMANCE.md). Precompute rounds to bf16 per hop — accuracy
    # bands hold on the test suite, but keep False for exact-f32 parity.
    spmm_bf16: bool = False
    # hierarchical clustering for the reorder_tiled meta-engine: >0 merges
    # LPA communities into super-clusters of up to this many nodes via
    # heavy-edge matching (ops/reorder.py::merge_clusters) before the tiled
    # pack — raises tiled_fraction when LPA fragments the graph into
    # communities smaller than the tile span (docs/PERFORMANCE.md).
    cluster_merge_target: int = 0
    mesh_shape: Sequence[int] = ()  # () => single device
    cache_dir: Optional[str] = None  # disk cache for propagated hop features
    checkpoint_path: Optional[str] = None  # save best-val params here
    resume_from: Optional[str] = None      # warm-start params from a checkpoint
    scan_epochs: bool = False  # run ALL epochs inside one jitted lax.scan
    # (train + eval + device-side best-val tracking in a single dispatch —
    # the idiomatic TPU trainer shape; eligible for full-batch, BN-free runs)


@dataclass
class FrameworkConfig:
    data: DataConfig = field(default_factory=DataConfig)
    data_process: DataProcessConfig = field(default_factory=DataProcessConfig)
    data_augment: DataAugmentConfig = field(default_factory=DataAugmentConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)

    def replace(self, **kwargs) -> "FrameworkConfig":
        return dataclasses.replace(self, **kwargs)
