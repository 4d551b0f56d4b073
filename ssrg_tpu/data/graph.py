"""Graph / Edge containers.

Reconstruction of the reference's missing ``datasets/`` package API
(SURVEY.md §2.9): the reference pickles/reads ``datasets.base_data.Graph``
objects with attributes ``.edge`` (an Edge with row/col/edge_weight),
``.node``, ``.x``, ``.y``, ``.adj`` (scipy sparse, symmetric), ``.edge_type``,
``.num_features``, ``.num_classes``, ``.num_node``, ``.num_edge``,
``.feature_mask``, ``.edge_mask``
(call sites: ``SSRG/sparsity_datasets/simhomo/sparsity_dataset.py:99-123,161``).

Here the container is a host-side numpy/scipy structure: all one-time graph
construction and normalization happens on host (it is O(E) and runs once),
while the propagation hot loop consumes device arrays produced by
``ssrg_tpu.ops.sparse`` from the scipy CSR.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np
import scipy.sparse as sp


@dataclass
class Edge:
    """Edge list (COO) with weights.

    Mirrors the reference's ``datasets.base_data.Edge`` (unpickled by the
    shipped ``.graph`` files; read at ``SSRG/data_augument.py:74``).
    """

    row: np.ndarray            # int64 [E]
    col: np.ndarray            # int64 [E]
    edge_weight: np.ndarray    # float32 [E]
    edge_type: str = "UUU"     # unsigned-undirected-unweighted

    def __post_init__(self):
        self.row = np.asarray(self.row, dtype=np.int64).reshape(-1)
        self.col = np.asarray(self.col, dtype=np.int64).reshape(-1)
        self.edge_weight = np.asarray(self.edge_weight, dtype=np.float32).reshape(-1)

    @property
    def num_edge(self) -> int:
        return int(self.row.shape[0])


class Graph:
    """In-memory graph with features and labels.

    Constructor signature mirrors the reference's
    ``Graph(row, col, edge_weight, num_node, edge_type, feature_mask=None,
    edge_mask=None, x=..., y=...)``
    (ctor calls at ``sparsity_dataset.py:161``, ``planetoid.py:157``).

    The stored edge list may be single-direction (the reference's
    ``data_process.edgeMasked`` keeps only ``col > row`` halves,
    ``SSRG/data_process.py:52-53``); ``.adj`` is built symmetric from it, which
    reproduces the documented undirected edge counts (SURVEY.md §2.9).
    """

    def __init__(
        self,
        row,
        col,
        edge_weight,
        num_node: int,
        edge_type: str = "UUU",
        feature_mask: Optional[np.ndarray] = None,
        edge_mask: Optional[np.ndarray] = None,
        x: Optional[np.ndarray] = None,
        y: Optional[np.ndarray] = None,
        symmetrize: bool = True,
    ):
        self.edge = Edge(row, col, edge_weight, edge_type)
        self.edge_type = edge_type
        self.num_node = int(num_node)
        self.feature_mask = feature_mask
        self.edge_mask = edge_mask
        self.x = None if x is None else np.asarray(x, dtype=np.float32)
        self.y = None if y is None else np.asarray(y, dtype=np.int64).reshape(-1)
        self._symmetrize = symmetrize
        self._adj: Optional[sp.csr_matrix] = None

    # -- adjacency ---------------------------------------------------------

    @property
    def adj(self) -> sp.csr_matrix:
        """Symmetric scipy CSR adjacency built lazily from the edge list.

        Uses the native OpenMP builder (``native/graphbuild.cpp``) when
        available; unweighted ('..U') edge types are clamped to 0/1 so
        symmetrizing an already-symmetric list is idempotent."""
        if self._adj is None:
            n = self.num_node
            r, c, w = self.edge.row, self.edge.col, self.edge.edge_weight
            clamp = self.edge_type.endswith("U")
            if self._symmetrize:
                from ssrg_tpu import native

                rr, cc, ww = native.symmetrize_edges(r, c, w, n, clamp_unit=clamp)
                adj = sp.csr_matrix((ww, (rr, cc)), shape=(n, n))
            else:
                adj = sp.coo_matrix((w, (r, c)), shape=(n, n)).tocsr()
                if clamp:
                    adj.data[:] = np.minimum(adj.data, 1.0)
                adj.setdiag(0)
                adj.eliminate_zeros()
            self._adj = adj
        return self._adj

    @adj.setter
    def adj(self, value):
        self._adj = value.tocsr() if sp.issparse(value) else value

    # -- stats -------------------------------------------------------------

    @property
    def node(self) -> int:
        return self.num_node

    @property
    def num_edge(self) -> int:
        """Number of stored (directed) edge entries in the symmetric adjacency."""
        return int(self.adj.nnz)

    @property
    def num_features(self) -> int:
        return 0 if self.x is None else int(self.x.shape[1])

    @property
    def num_classes(self) -> int:
        if self.y is None:
            return 0
        return int(self.y.max()) + 1

    def degrees(self) -> np.ndarray:
        return np.asarray(self.adj.sum(axis=1)).reshape(-1)

    def __repr__(self):
        return (
            f"Graph(num_node={self.num_node}, num_edge={self.num_edge}, "
            f"num_features={self.num_features}, num_classes={self.num_classes}, "
            f"edge_type={self.edge_type!r})"
        )
