"""Baseline GNN zoo — full-graph message-passing models.

Rebuild of the reference's top-level baseline pipeline models
(``/root/reference/model.py:8-176``; SURVEY.md §2.11): MLP, robustMLP (for
the triplet loss), GCN, GraphSAGE, GAT (8 heads), SGC, SIGN. These are
genuine per-layer message-passing networks (unlike the precompute zoo), so
each layer embeds an SpMM / edge-attention over the device adjacency.

TPU notes:
- GCN/SAGE ride the SpMM engines (Dense -> spmm fuses into MXU matmul +
  gather-reduce).
- GAT computes per-edge attention over the padded COO edge list with
  segment-max/-sum softmax — static shapes, no dynamic nnz (the
  reference relies on PyG's GATConv).
- SIGN's per-hop linear maps are registered flax submodules — fixing the
  reference bug where ``self.conv`` is a plain Python list and its SGConv
  parameters are invisible to the optimizer (``model.py:162-164``,
  SURVEY.md §2.13).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class EdgeList:
    """Padded COO edge list for edge-level ops (GAT attention): col-sorted
    entries with a validity mask; static shapes for XLA. Registered as a
    pytree so it can be passed as a jit argument (never closure-captured:
    captured device arrays become HLO constants)."""

    def __init__(self, row, col, mask, num_nodes: int):
        self.row = row          # int32 [E_pad] destination
        self.col = col          # int32 [E_pad] source
        self.mask = mask        # f32 [E_pad] 1 on real edges
        self.num_nodes = num_nodes

    def tree_flatten(self):
        return (self.row, self.col, self.mask), self.num_nodes

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, aux)

    @classmethod
    def from_scipy(cls, adj, pad_to: int = 512,
                   e_pad: "int | None" = None) -> "EdgeList":
        """``e_pad`` forces a specific padded edge count — used by the
        cluster-minibatch path so every batch shares ONE compiled shape."""
        coo = adj.tocoo()
        e = coo.nnz
        if e_pad is None:
            e_pad = ((e + pad_to - 1) // pad_to) * pad_to if e else pad_to
        elif e_pad < e:
            raise ValueError(f"e_pad {e_pad} < nnz {e}")
        row = np.zeros(e_pad, np.int32)
        col = np.zeros(e_pad, np.int32)
        mask = np.zeros(e_pad, np.float32)
        row[:e] = coo.row
        col[:e] = coo.col
        mask[:e] = 1.0
        return cls(
            jnp.asarray(row), jnp.asarray(col), jnp.asarray(mask),
            adj.shape[0],
        )


def edge_softmax(scores: jnp.ndarray, row: jnp.ndarray, mask: jnp.ndarray,
                 num_nodes: int) -> jnp.ndarray:
    """Numerically-stable per-destination softmax over edge scores.
    scores [E, H]; returns attention weights [E, H] (0 on padding)."""
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask[:, None] > 0, scores, neg)
    row_max = jax.ops.segment_max(masked, row, num_segments=num_nodes)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    ex = jnp.exp(masked - row_max[row]) * mask[:, None]
    denom = jax.ops.segment_sum(ex, row, num_segments=num_nodes)
    return ex / jnp.maximum(denom[row], 1e-16)


class BaselineMLP(nn.Module):
    """MLP with BatchNorm (reference model.py:115-144)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, adj=None, train: bool = False):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, name=f"lin_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, name=f"bn_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="lin_out")(x)


class RobustMLP(nn.Module):
    """robustMLP (reference model.py:8-36): returns (L2-normalized hidden,
    log-probabilities) for the class-wise margin triplet loss."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 3
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, adj=None, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, name=f"lin_{i}")(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        hidden = x / jnp.maximum(
            jnp.linalg.norm(x, axis=1, keepdims=True), 1e-12
        )
        logits = nn.Dense(self.output_dim, name="lin_out")(x)
        return hidden, jax.nn.log_softmax(logits, axis=1)


class BaselineGCN(nn.Module):
    """Multi-layer GCN over a sym-normalized device adjacency
    (reference model.py:38-63)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        for i in range(self.num_layers - 1):
            x = nn.Dense(self.hidden_dim, name=f"conv_{i}")(x)
            x = adj.spmm(x)
            x = jax.nn.relu(x)
            x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.output_dim, name="conv_out")(x)
        return adj.spmm(x)


class BaselineSAGE(nn.Module):
    """GraphSAGE-mean (reference model.py:66-90): h' = W_self h + W_nbr (P h)
    with P = D^{-1}A passed as the device adjacency."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, adj, train: bool = False):
        dims = [self.hidden_dim] * (self.num_layers - 1) + [self.output_dim]
        for i, d in enumerate(dims):
            neigh = adj.spmm(x)
            x = (
                nn.Dense(d, name=f"self_{i}")(x)
                + nn.Dense(d, use_bias=False, name=f"nbr_{i}")(neigh)
            )
            if i < len(dims) - 1:
                x = jax.nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class BaselineGAT(nn.Module):
    """GAT (reference model.py:92-113): 8-head attention layers, concat
    between layers, mean at the output layer. Attention runs over the padded
    edge list with segment-softmax."""

    hidden_dim: int          # per-head hidden size
    output_dim: int
    num_layers: int = 2
    heads: int = 8
    dropout: float = 0.5
    negative_slope: float = 0.2

    @nn.compact
    def __call__(self, x, edges: EdgeList, train: bool = False):
        h = self.heads
        n = edges.num_nodes
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            d = self.output_dim if last else self.hidden_dim
            z = nn.Dense(h * d, use_bias=False, name=f"w_{i}")(x)
            z = z.reshape(n, h, d)
            a_src = self.param(f"a_src_{i}", nn.initializers.xavier_uniform(), (1, h, d))
            a_dst = self.param(f"a_dst_{i}", nn.initializers.xavier_uniform(), (1, h, d))
            score_src = (z * a_src).sum(-1)     # [N, H]
            score_dst = (z * a_dst).sum(-1)
            e = score_dst[edges.row] + score_src[edges.col]          # [E, H]
            e = jax.nn.leaky_relu(e, self.negative_slope)
            alpha = edge_softmax(e, edges.row, edges.mask, n)        # [E, H]
            alpha = nn.Dropout(self.dropout, deterministic=not train)(alpha)
            msgs = z[edges.col] * alpha[..., None]                   # [E, H, D]
            out = jax.ops.segment_sum(msgs, edges.row, num_segments=n)
            if last:
                x = out.mean(axis=1)
            else:
                x = jax.nn.elu(out.reshape(n, h * d))
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class BaselineSGC(nn.Module):
    """SGC head over the K-hop precomputed feature (reference model.py:146-156
    uses PyG SGConv(K=2, cached) — here the propagation is the framework's
    precompute and the module is the linear map)."""

    output_dim: int

    @nn.compact
    def __call__(self, x_propagated, adj=None, train: bool = False):
        return nn.Dense(self.output_dim, name="lin")(x_propagated)


class BaselineSIGN(nn.Module):
    """SIGN (reference model.py:158-176): per-hop linear maps, concat, head.
    Hop maps are registered submodules (fixes the reference's plain-list
    parameter bug)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, hops, adj=None, train: bool = False):
        outs = []
        for k in range(hops.shape[0]):
            outs.append(
                jax.nn.relu(nn.Dense(self.hidden_dim, name=f"hop_{k}")(hops[k]))
            )
        x = jnp.concatenate(outs, axis=-1)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return nn.Dense(self.output_dim, name="out")(x)


def triplet_loss(
    hidden: jnp.ndarray, labels: jnp.ndarray, idx: jnp.ndarray,
    num_classes: int, margin: float = 1.0,
) -> jnp.ndarray:
    """Class-wise margin triplet loss (reference utils.py:50-63): pull nodes
    toward their class centroid, push away from the nearest other centroid."""
    h = hidden[idx]
    y = labels[idx]
    onehot = jax.nn.one_hot(y, num_classes)                       # [B, C]
    counts = jnp.maximum(onehot.sum(0), 1.0)
    centroids = (onehot.T @ h) / counts[:, None]                  # [C, D]
    d = jnp.linalg.norm(h[:, None, :] - centroids[None], axis=-1)  # [B, C]
    d_pos = (d * onehot).sum(1)
    d_neg = jnp.min(jnp.where(onehot > 0, jnp.inf, d), axis=1)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))
