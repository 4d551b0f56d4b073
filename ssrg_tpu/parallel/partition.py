"""Host-side graph partitioner: 1-D row partition of a CSR adjacency.

The static send/recv planning happens here so device code stays
static-shaped (SURVEY.md §7 "halo exchange design"): each shard owns a
contiguous block of adjacency rows (padded to equal size) and the matching
block of node features. Column indices stay global; the distributed SpMM
(``dist_spmm.py``) either all-gathers X or walks a ppermute ring over the
feature row blocks.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import numpy as np
import scipy.sparse as sp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclass
class RowPartition:
    """Per-shard padded COO blocks, stackable along a leading shard axis.

    - ``rows``   int32 [D, nnz_pad]  row index LOCAL to the shard's block
    - ``cols``   int32 [D, nnz_pad]  GLOBAL column index
    - ``vals``   f32   [D, nnz_pad]  weight (0 on padding)
    - ``block``  rows per shard (n_pad / D)
    - ``n``      true number of rows/cols (square adjacency)
    """

    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    block: int
    n: int

    @property
    def num_shards(self) -> int:
        return self.rows.shape[0]

    @property
    def n_pad(self) -> int:
        return self.block * self.num_shards


def partition_rows(adj: sp.spmatrix, num_shards: int, row_align: int = 8
                   ) -> RowPartition:
    """Split a square CSR adjacency into ``num_shards`` contiguous row blocks,
    padding rows to a common block size and nnz to the max across shards so
    all shards have identical (static) shapes."""
    csr = adj.tocsr()
    n = csr.shape[0]
    block = _round_up(-(-n // num_shards), row_align)
    n_pad = block * num_shards

    shard_data = []
    max_nnz = 1
    for d in range(num_shards):
        lo = d * block
        hi = min(lo + block, n)
        if lo >= n:
            sub = sp.csr_matrix((0, csr.shape[1]))
        else:
            sub = csr[lo:hi]
        coo = sub.tocoo()
        shard_data.append((coo.row, coo.col, coo.data))
        max_nnz = max(max_nnz, coo.nnz)

    nnz_pad = _round_up(max_nnz, 512)
    rows = np.zeros((num_shards, nnz_pad), np.int32)
    cols = np.zeros((num_shards, nnz_pad), np.int32)
    vals = np.zeros((num_shards, nnz_pad), np.float32)
    for d, (r, c, v) in enumerate(shard_data):
        k = r.shape[0]
        rows[d, :k] = r
        cols[d, :k] = c
        vals[d, :k] = v
    return RowPartition(rows, cols, vals, block=block, n=n)


def pad_features(x: np.ndarray, part: RowPartition) -> np.ndarray:
    """Zero-pad node features to the partition's padded row count."""
    pad = part.n_pad - x.shape[0]
    if pad == 0:
        return x
    return np.concatenate([x, np.zeros((pad, x.shape[1]), x.dtype)], axis=0)
