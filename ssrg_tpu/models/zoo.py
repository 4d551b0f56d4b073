"""Model zoo — {graph op, message op, head} compositions and factory.

Mirrors the reference's model layer (``SSRG/models/*.py`` one-file-per-model
plus the ``load_model`` factory in ``models/model_init.py:12-54``; SURVEY.md
§2.6) with a declarative ``ModelSpec`` instead of class inheritance:

| model  | graph_op            | msg_op                          | head        |
|--------|---------------------|---------------------------------|-------------|
| sgc    | sym(K, r)           | last                            | LogReg      |
| ssgc   | sym                 | mean(0..K+1)                    | LogReg      |
| sign   | sym                 | proj_concat (per-hop MLP)       | MLP         |
| gbp    | sym                 | simple_weighted(alpha decay)    | MLP         |
| gamlp  | sym                 | learnable_weighted("jk")        | MLP         |
| nafs   | sym                 | over_smooth_dis_weighted        | LogReg      |
| gcn    | naive sym (in head) | —                               | 2-layer GCN |
| wavelet| spectral (Φ, Φ⁻¹)   | —                               | GWNN        |
| clean_train | —              | —                               | FeatureAugment2MLP |

Graph-op name strings also expose the full operator library (ppr, magnetic,
magnetic_ppr, two_dir, two_order, fast_ppr) so custom compositions reach
capability parity with the reference operator layer (SURVEY.md §2.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import flax.linen as nn
import scipy.sparse as sp

from ssrg_tpu.configs.config import ModelConfig
from ssrg_tpu.ops import normalize
from ssrg_tpu.ops.combine import (
    LEARNABLE_AGGR_TYPES,
    ProjectedConcatMessageOp,
    make_message_op,
)
from ssrg_tpu.models.heads import (
    FeatureAugment2MLP,
    Layer2GraphConvolution,
    LogisticRegression,
    MultiLayerPerceptron,
)


# -- graph-op registry: name -> (adj, cfg) -> CSR or tuple of CSR -----------

GRAPH_OPS: Dict[str, Callable[[sp.spmatrix, ModelConfig], Any]] = {
    "sym": lambda adj, cfg: normalize.sym_norm(adj, cfg.r),
    "ppr": lambda adj, cfg: normalize.ppr_norm(adj, cfg.r, 0.15),
    "magnetic": lambda adj, cfg: normalize.magnetic_norm(adj, cfg.r, cfg.q),
    "magnetic_ppr": lambda adj, cfg: normalize.magnetic_com_ppr_norm(
        adj, cfg.r, cfg.q, 0.15
    ),
    "two_dir": lambda adj, cfg: normalize.un_in_out_norm(adj, cfg.r),
    "fast_ppr": lambda adj, cfg: normalize.fast_ppr_approx_norm(
        adj, cfg.r, cfg.ppr_alpha
    ),
    "two_order": lambda adj, cfg: normalize.two_order_ppr_approx_norm(
        adj, cfg.r, cfg.ppr_alpha
    ),
}


class PrecomputeModel(nn.Module):
    """The trainable part of a precompute model: optional in-forward message
    aggregation + head. ``inputs`` is ``[n, D]`` when aggregation already
    happened at precompute time, or the hop stack ``[K+1, n, F]`` when the
    message op is learnable (reference ``base_model.py:74-92``)."""

    msg_op: Optional[nn.Module] = None
    head: nn.Module = None

    @nn.compact
    def __call__(self, inputs, train: bool = False, query_edges=None, adj=None):
        x = inputs
        if self.msg_op is not None:
            if isinstance(self.msg_op, ProjectedConcatMessageOp):
                x = self.msg_op(x, train=train)
            else:
                x = self.msg_op(x)
        if adj is not None:
            return self.head(x, adj, train=train, query_edges=query_edges)
        return self.head(x, train=train, query_edges=query_edges)


@dataclass
class ModelSpec:
    """Declarative model description consumed by the task layer."""

    name: str
    graph_op: Optional[str]          # key into GRAPH_OPS, or None
    module: PrecomputeModel
    aggr_type: Optional[str] = None
    naive: bool = False              # adjacency consumed inside the head (GCN)
    spectral: bool = False           # wavelet path (SpectralModel equivalent)
    prop_steps: int = 3
    graph_op_kwargs: dict = field(default_factory=dict)

    @property
    def pre_msg_learnable(self) -> bool:
        """Learnable aggregation runs per-batch in forward
        (reference base_model.py:38-44)."""
        return self.aggr_type in LEARNABLE_AGGR_TYPES

    def construct_adj(self, adj: sp.spmatrix, cfg: ModelConfig):
        return GRAPH_OPS[self.graph_op](adj, cfg)


# -- per-model constructors (reference SSRG/models/<name>.py) ----------------


def _mlp(cfg: ModelConfig, output_dim: int) -> MultiLayerPerceptron:
    import jax.numpy as jnp

    return MultiLayerPerceptron(
        edge_mode=cfg.edge_mode,
        hidden_dim=cfg.hidden_dim,
        output_dim=output_dim,
        num_layers=cfg.num_layers,
        dropout=cfg.dropout,
        bn=cfg.use_bn,
        dtype=jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32,
    )


def make_sgc(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """SGC (models/sgc.py:6-11): sym norm -> last hop -> logistic regression."""
    return ModelSpec(
        name="sgc",
        graph_op="sym",
        aggr_type="last",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=make_message_op("last"),
            head=LogisticRegression(output_dim=output_dim,
                                    edge_mode=cfg.edge_mode),
        ),
    )


def make_ssgc(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """SSGC (models/ssgc.py:7-12): mean over hops 0..K."""
    return ModelSpec(
        name="ssgc",
        graph_op="sym",
        aggr_type="mean",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=make_message_op("mean"),
            head=LogisticRegression(output_dim=output_dim,
                                    edge_mode=cfg.edge_mode),
        ),
    )


def make_sign(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """SIGN (models/sign.py:7-13): per-hop MLP projections, concat, MLP head."""
    return ModelSpec(
        name="sign",
        graph_op="sym",
        aggr_type="proj_concat",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=ProjectedConcatMessageOp(
                hidden_dim=cfg.hidden_dim,
                num_layers=cfg.num_layers,
                dropout=cfg.dropout,
            ),
            head=_mlp(cfg, output_dim),
        ),
    )


def make_gbp(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """GBP (models/gbp.py:6-12): alpha-decay weighted hops, MLP head."""
    return ModelSpec(
        name="gbp",
        graph_op="sym",
        aggr_type="simple_weighted",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=make_message_op(
                "simple_weighted", combination_type="alpha", alpha=cfg.message_alpha
            ),
            head=_mlp(cfg, output_dim),
        ),
    )


def make_gamlp(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """GAMLP (models/gamlp.py:6-12): JK-style learnable hop attention, MLP."""
    return ModelSpec(
        name="gamlp",
        graph_op="sym",
        aggr_type="learnable_weighted",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=make_message_op(
                "learnable_weighted",
                combination_type="jk",
                prop_steps=cfg.prop_steps,
                feat_dim=feat_dim,
            ),
            head=_mlp(cfg, output_dim),
        ),
    )


def make_nafs(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """NAFS (models/nafs.py:6-11): over-smoothing-distance weights, LogReg."""
    return ModelSpec(
        name="nafs",
        graph_op="sym",
        aggr_type="over_smooth_dis_weighted",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=make_message_op("over_smooth_dis_weighted"),
            head=LogisticRegression(output_dim=output_dim,
                                    edge_mode=cfg.edge_mode),
        ),
    )


def make_gcn(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """Naive GCN (models/gcn.py:5-9): adjacency rides into the head."""
    return ModelSpec(
        name="gcn",
        graph_op="sym",
        aggr_type=None,
        naive=True,
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=None,
            head=Layer2GraphConvolution(
                hidden_dim=cfg.hidden_dim,
                output_dim=output_dim,
                dropout=cfg.dropout,
            ),
        ),
    )


def make_clean_train(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """CleanTrainModel (models/clean_train_model.py:6-11): bare
    FeatureAugment2MLP returning (hidden, logits) for the augmentation flow."""
    return ModelSpec(
        name="clean_train",
        graph_op=None,
        aggr_type=None,
        prop_steps=0,
        module=PrecomputeModel(
            msg_op=None,
            head=FeatureAugment2MLP(
                hidden_dim=cfg.hidden_dim,
                output_dim=output_dim,
                dropout=cfg.dropout,
            ),
        ),
    )


def make_wavelet(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """Graph-wavelet GWNN (models/walvet.py:6-11): spectral preprocess builds
    (Φ, Φ⁻¹); head defined in ssrg_tpu.models.wavelet."""
    from ssrg_tpu.models.wavelet import Wavelet2NeuralNetwork

    return ModelSpec(
        name="wavelet",
        graph_op=None,
        aggr_type=None,
        spectral=True,
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=None,
            head=Wavelet2NeuralNetwork(
                hidden_dim=cfg.hidden_dim,
                output_dim=output_dim,
                dropout=cfg.dropout,
            ),
        ),
    )


def make_magnet(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """Magnetic-Laplacian model: complex propagation (ops.propagate_complex)
    + complex MLP head with magnitude readout. The reference holds this
    capability only at operator level (complex heads are commented out,
    SURVEY.md §2.5); here it is a trainable zoo member."""
    from ssrg_tpu.models.complex_heads import ComMLP

    return ModelSpec(
        name="magnet",
        graph_op="magnetic",
        aggr_type=None,
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(
            msg_op=None,
            head=ComMLP(
                hidden_dim=cfg.hidden_dim,
                output_dim=output_dim,
                num_layers=cfg.num_layers,
                dropout=cfg.dropout,
            ),
        ),
    )


def make_two_dir(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """Directed two-direction model: un/in/out triple propagation
    (TwoDirGraphOp, SURVEY.md §2.2), last hop of each concatenated into an
    MLP head."""
    return ModelSpec(
        name="two_dir",
        graph_op="two_dir",
        aggr_type="last",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(msg_op=None, head=_mlp(cfg, output_dim)),
    )


def make_two_order(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """Two-order PPR-approximation model: first/second-order pair propagation
    (TwoOrderPprApproxGraphOp), last hops concatenated into an MLP head."""
    return ModelSpec(
        name="two_order",
        graph_op="two_order",
        aggr_type="last",
        prop_steps=cfg.prop_steps,
        module=PrecomputeModel(msg_op=None, head=_mlp(cfg, output_dim)),
    )


MODEL_REGISTRY: Dict[str, Callable[[ModelConfig, int, int], ModelSpec]] = {
    "sgc": make_sgc,
    "ssgc": make_ssgc,
    "sign": make_sign,
    "gbp": make_gbp,
    "gamlp": make_gamlp,
    "nafs": make_nafs,
    "gcn": make_gcn,
    "clean_train": make_clean_train,
    "wavelet": make_wavelet,
    "magnet": make_magnet,
    "two_dir": make_two_dir,
    "two_order": make_two_order,
}


def load_model(cfg: ModelConfig, feat_dim: int, output_dim: int) -> ModelSpec:
    """Factory keyed on ``cfg.model_name`` (reference models/model_init.py:12-54)."""
    try:
        ctor = MODEL_REGISTRY[cfg.model_name]
    except KeyError:
        raise ValueError(
            f"unknown model {cfg.model_name!r}; available: {sorted(MODEL_REGISTRY)}"
        ) from None
    return ctor(cfg, feat_dim, output_dim)
