"""NN heads — the dense training-time models of the precompute family.

Flax linen re-designs of the reference's head zoo
(``SSRG/models/base_scalable/simple_models.py``; SURVEY.md §2.5). Training
compute is tiny dense matmuls, which XLA maps straight onto the MXU; all
graph structure was consumed at precompute time (except the naive GCN head,
which takes the device adjacency as an argument).

Signature fix (SURVEY.md §2.13): the reference's
``MultiLayerPerceptron(feat_dim, hidden_dim, output_dim, num_layers, ...)``
is called by GBP/GAMLP/SIGN in ``(feat, hidden, num_layers, output, ...)``
order, silently producing ``num_layers``-dim logits. Here there is exactly one
keyword-only signature and ``output_dim`` is always the class count.

Link-classification protocol: heads accept ``query_edges`` ([B, 2] int array);
when given, endpoint representations are concatenated and scored by a separate
edge projection, mirroring the reference's ``query_edges`` branch
(``simple_models.py:102-110, 146-160``).
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

# Xavier-uniform with the torch "relu" gain (sqrt(2)), matching the
# reference's reset_parameters (simple_models.py:138-142).
_xavier_relu = nn.initializers.variance_scaling(
    2.0, mode="fan_avg", distribution="uniform"
)


class PReLU(nn.Module):
    """Parametric ReLU with a single learnable slope (torch nn.PReLU default)."""

    init_slope: float = 0.25

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "slope", lambda key: jnp.asarray(self.init_slope, jnp.float32)
        )
        return jnp.where(x >= 0, x, slope.astype(x.dtype) * x)


def _edge_concat(x: jnp.ndarray, query_edges: jnp.ndarray) -> jnp.ndarray:
    """[B, 2] endpoint pairs -> concatenated pair features [B, 2D]."""
    return jnp.concatenate(
        [x[query_edges[:, 0]], x[query_edges[:, 1]]], axis=-1
    )


def _edge_features(x: jnp.ndarray, query_edges: jnp.ndarray,
                   mode: str = "concat") -> jnp.ndarray:
    """Pair features for the link scorer.

    ``concat`` (reference parity, simple_models.py:106,154) cannot express
    endpoint SIMILARITY under a linear scorer; ``hadamard`` appends the
    symmetric interaction channels [a ⊙ b, |a − b|] (standard link-prediction
    featurization), which makes edge-existence linearly separable from
    smoothed/propagated representations."""
    a, b = x[query_edges[:, 0]], x[query_edges[:, 1]]
    if mode == "concat":
        return jnp.concatenate([a, b], axis=-1)
    if mode == "hadamard":
        return jnp.concatenate([a, b, a * b, jnp.abs(a - b)], axis=-1)
    raise ValueError(f"unknown edge feature mode {mode!r}")


class IdenticalMapping(nn.Module):
    """Identity head (simple_models.py:87-93)."""

    @nn.compact
    def __call__(self, feature, train=False, query_edges=None):
        return feature


class OneDimConvolution(nn.Module):
    """Learnable scalar weight per hop/subgraph, summed
    (simple_models.py:6-32; SGL heritage). Input: hop stack [K, n, F]."""

    @nn.compact
    def __call__(self, hops, train: bool = False, query_edges=None):
        k = hops.shape[0]
        w = self.param("hop_weight", nn.initializers.ones, (k, 1, 1))
        return (hops * w).sum(axis=0)


class OneDimConvolutionWeightSharedAcrossFeatures(nn.Module):
    """Per-hop per-node learnable weight shared across the feature dim
    (simple_models.py:35-62). Input: hop stack [K, n, F]."""

    num_nodes: int

    @nn.compact
    def __call__(self, hops, train: bool = False, query_edges=None):
        k = hops.shape[0]
        w = self.param("hop_node_weight", nn.initializers.ones,
                       (k, self.num_nodes, 1))
        return (hops * w).sum(axis=0)


class FastOneDimConvolution(nn.Module):
    """Batched-matmul variant of the per-subgraph combination
    (simple_models.py:65-84): input [n, K, F] -> weighted sum over K via a
    single learnable [K] vector (``.subgraph_weight`` equivalent)."""

    @nn.compact
    def __call__(self, stacked, train: bool = False, query_edges=None):
        k = stacked.shape[1]
        w = self.param("subgraph_weight", nn.initializers.ones, (k,))
        return jnp.einsum("nkf,k->nf", stacked, w)


class LogisticRegression(nn.Module):
    """Linear head; with ``query_edges`` becomes the link scorer
    (simple_models.py:96-112)."""

    output_dim: int
    edge_mode: str = "concat"

    @nn.compact
    def __call__(self, feature, train: bool = False, query_edges=None):
        x = nn.Dense(self.output_dim, kernel_init=_xavier_relu, name="fc")(feature)
        if query_edges is None:
            return x
        return nn.Dense(self.output_dim, kernel_init=_xavier_relu, name="edge_fc")(
            _edge_features(x, query_edges, self.edge_mode)
        )


class MultiLayerPerceptron(nn.Module):
    """MLP head: (num_layers-1) x [Dense -> (BN) -> PReLU -> Dropout] -> Dense
    (simple_models.py:115-162, with the argument-order bug fixed).

    ``dtype`` sets the compute dtype (bfloat16 keeps matmuls on the MXU fast
    path with f32 params/outputs — standard TPU mixed precision)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dropout: float = 0.5
    bn: bool = False
    dtype: Any = jnp.float32
    edge_mode: str = "concat"

    @nn.compact
    def __call__(self, feature, train: bool = False, query_edges=None):
        if self.num_layers < 2:
            raise ValueError("MLP must have at least two layers!")
        x = feature.astype(self.dtype)
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, kernel_init=_xavier_relu,
                         dtype=self.dtype, name=f"fc_{i}")(x)
            if self.bn:
                x = nn.BatchNorm(
                    use_running_average=not train, dtype=self.dtype,
                    name=f"bn_{i}",
                )(x)
            x = PReLU(name=f"prelu_{i}")(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if query_edges is None:
            out = nn.Dense(self.output_dim, kernel_init=_xavier_relu,
                           dtype=self.dtype, name="fc_out")(x)
            return out.astype(jnp.float32)
        x = _edge_features(x, query_edges, self.edge_mode)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        out = nn.Dense(self.output_dim, kernel_init=_xavier_relu,
                       dtype=self.dtype, name="edge_fc")(x)
        return out.astype(jnp.float32)


class ResMultiLayerPerceptron(nn.Module):
    """Residual MLP head (simple_models.py:165-211): pre-dropout, ReLU blocks
    with the `residual = previous activation` wiring of the reference."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dropout: float = 0.8
    bn: bool = False

    @nn.compact
    def __call__(self, feature, train: bool = False, query_edges=None):
        if self.num_layers < 2:
            raise ValueError("ResMLP must have at least two layers!")
        drop = lambda x: nn.Dropout(self.dropout, deterministic=not train)(x)  # noqa: E731
        x = drop(feature)
        x = nn.Dense(self.hidden_dim, name="fc_0")(x)
        if self.bn:
            x = nn.BatchNorm(use_running_average=not train, name="bn_0")(x)
        x = jax.nn.relu(x)
        residual = x
        for i in range(1, self.num_layers - 1):
            x = drop(x)
            x = nn.Dense(self.hidden_dim, name=f"fc_{i}")(x)
            if self.bn:
                x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x_act = jax.nn.relu(x)
            x = x_act + residual
            residual = x_act
        x = drop(x)
        if query_edges is None:
            return nn.Dense(self.output_dim, name="fc_out")(x)
        return nn.Dense(self.output_dim, name="edge_fc")(_edge_concat(x, query_edges))


class Layer2GraphConvolution(nn.Module):
    """Naive 2-layer GCN head (simple_models.py:214-240): the adjacency rides
    into forward as a device sparse/dense operand and each layer is
    Dense -> SpMM, so XLA fuses the elementwise tail into the matmuls."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feature, adj, train: bool = False, query_edges=None):
        x = nn.Dense(self.hidden_dim, name="fc1")(feature)
        x = adj.spmm(x)
        x = jax.nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        if query_edges is None:
            x = nn.Dense(self.output_dim, name="fc2")(x)
            return adj.spmm(x)
        x = nn.Dense(self.hidden_dim, name="fc2_edge")(x)
        x = adj.spmm(x)
        return nn.Dense(self.output_dim, name="edge_fc")(_edge_concat(x, query_edges))


class FeatureAugment2MLP(nn.Module):
    """Augmentation encoder: 2-layer MLP returning (hidden_act, logits)
    (simple_models.py:242-258; named FeatureAugument2MLP in the reference —
    spelling normalized here)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feature, train: bool = False, query_edges=None):
        h = jax.nn.relu(nn.Dense(self.hidden_dim, name="fc1")(feature))
        x = nn.Dropout(self.dropout, deterministic=not train)(h)
        logits = nn.Dense(self.output_dim, name="fc2")(x)
        return h, logits
