"""Graph/data utilities.

Reconstruction of the reference's missing ``datasets.utils`` module
(imports at ``SSRG/sparsity_datasets/simhomo/sparsity_dataset.py:11`` and
``planetoid.py:11``; SURVEY.md §2.9): pickle IO, edge-list hygiene,
homophily statistics, spectral regularization features.
"""

from __future__ import annotations

import pickle
from typing import Tuple

import numpy as np
import scipy.sparse as sp


def pkl_read_file(path: str):
    """Unpickle a file (reference: ``datasets.utils.pkl_read_file``)."""
    with open(path, "rb") as f:
        return pickle.load(f)


def pkl_write_file(obj, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


def remove_self_loops(row: np.ndarray, col: np.ndarray, *values) -> Tuple:
    """Drop i==j entries from an edge list."""
    keep = row != col
    out = (row[keep], col[keep]) + tuple(v[keep] for v in values)
    return out


def to_undirected(row: np.ndarray, col: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Symmetrize + deduplicate an edge list (unweighted)."""
    rr = np.concatenate([row, col])
    cc = np.concatenate([col, row])
    pairs = np.unique(np.stack([rr, cc], axis=1), axis=0)
    return pairs[:, 0], pairs[:, 1]


def download_to(url: str, path: str) -> None:
    """Fetch ``url`` into ``path`` (reference: ``datasets.utils.download_to``,
    used by the Planetoid downloader, ``planetoid.py:92-97``). This container
    has no network egress; the helper exists for API parity and raises a
    clear error pointing at the offline staging layout when the fetch fails."""
    import os
    import urllib.request

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        with urllib.request.urlopen(url, timeout=30) as r, open(path, "wb") as f:
            f.write(r.read())
    except Exception as exc:
        raise RuntimeError(
            f"download of {url!r} failed ({exc!r}); this environment has no "
            f"network egress — stage the file manually at {path!r}"
        ) from exc


def coomatrix_to_arrays(mat) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """COO matrix -> (row, col, data) numpy arrays
    (reference: ``datasets.utils.coomatrix_to_torch_tensor``, torch-free here)."""
    coo = mat.tocoo()
    return (
        coo.row.astype(np.int64),
        coo.col.astype(np.int64),
        coo.data.astype(np.float32),
    )


# -- homophily statistics ---------------------------------------------------
# Computed by the reference dataset loader and documented in docstrings
# (``sparsity_dataset.py:57-59``; e.g. cora 0.81 / 0.8252 / 0.7657,
# ``planetoid.py:31``). Definitions follow Lim et al. (LINKX) / standard use.


def edge_homophily(row: np.ndarray, col: np.ndarray, y: np.ndarray) -> float:
    """Fraction of edges whose endpoints share a label."""
    if row.size == 0:
        return 0.0
    return float(np.mean(y[row] == y[col]))


def node_homophily(row: np.ndarray, col: np.ndarray, y: np.ndarray, num_node: int) -> float:
    """Mean over nodes of the same-label fraction among their neighbors."""
    same = (y[row] == y[col]).astype(np.float64)
    deg = np.bincount(row, minlength=num_node).astype(np.float64)
    same_sum = np.bincount(row, weights=same, minlength=num_node)
    has = deg > 0
    if not has.any():
        return 0.0
    return float(np.mean(same_sum[has] / deg[has]))


def linkx_homophily(row: np.ndarray, col: np.ndarray, y: np.ndarray, num_node: int) -> float:
    """Class-insensitive edge homophily (LINKX): mean over classes of
    max(0, h_k - |C_k|/n) where h_k is the same-label edge fraction restricted
    to nodes of class k."""
    num_classes = int(y.max()) + 1
    n = num_node
    total = 0.0
    counted = 0
    for k in range(num_classes):
        in_k = y[row] == k
        d_k = np.sum(in_k)
        if d_k == 0:
            continue
        h_k = float(np.sum(in_k & (y[col] == k)) / d_k)
        p_k = float(np.sum(y == k) / n)
        total += max(0.0, h_k - p_k)
        counted += 1
    if counted == 0:
        return 0.0
    return total / max(num_classes - 1, 1)


def set_spectral_adjacency_reg_features(
    num_node: int,
    row: np.ndarray,
    col: np.ndarray,
    edge_weight: np.ndarray,
    k: int = 16,
    seed: int = 0,
) -> np.ndarray:
    """Spectral embedding features from the graph Laplacian.

    The reference calls ``datasets.utils.set_spectral_adjacency_reg_features``
    during dataset load and discards the result (``sparsity_dataset.py:117-123``,
    SURVEY.md §2.13); here it is an optional, working implementation: the k
    smallest eigenvectors of the symmetric-normalized Laplacian.
    """
    adj = sp.coo_matrix(
        (edge_weight.astype(np.float64), (row, col)), shape=(num_node, num_node)
    ).tocsr()
    adj = ((adj + adj.T) > 0).astype(np.float64)
    deg = np.asarray(adj.sum(axis=1)).reshape(-1)
    d_inv_sqrt = np.where(deg > 0, deg, 1.0) ** -0.5
    d_mat = sp.diags(d_inv_sqrt)
    lap = sp.eye(num_node) - d_mat @ adj @ d_mat
    k = min(k, num_node - 2)
    if k < 1:
        return np.zeros((num_node, 1), dtype=np.float32)
    try:
        from scipy.sparse.linalg import eigsh

        _, vecs = eigsh(lap, k=k, which="SM", v0=np.ones(num_node))
    except Exception:
        rng = np.random.default_rng(seed)
        vecs = rng.normal(size=(num_node, k))
    return vecs.astype(np.float32)
