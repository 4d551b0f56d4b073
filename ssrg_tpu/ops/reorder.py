"""Graph reordering for gather locality.

SpMM on TPU is gather-bound; renumbering nodes so neighbors have nearby ids
improves HBM row-buffer locality of the per-edge feature gathers and
concentrates edges into partition-local blocks for the distributed engines.
Methods: BFS (Cuthill-McKee-like frontier order), RCM (scipy), degree sort.

The reference has no reordering (its C kernel streams CSR rows on CPU where
locality matters less); this is a TPU-motivated addition.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import scipy.sparse as sp


def reorder_permutation(
    adj: sp.spmatrix, method: str = "rcm", merge_target: int = 0,
) -> np.ndarray:
    """Return perm where new_id = position of old_id in ``perm``
    (i.e., ``perm[new_id] = old_id``).

    ``merge_target`` (cluster methods only): hierarchical HEM agglomeration
    budget forwarded to :func:`cluster_permutation`; ``cluster2`` defaults it
    to 1024 when unset."""
    csr = adj.tocsr()
    n = csr.shape[0]
    if method == "degree":
        deg = np.diff(csr.indptr)
        return np.argsort(-deg, kind="stable")
    if method == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        return np.asarray(reverse_cuthill_mckee(csr, symmetric_mode=True))
    if method == "bfs":
        from scipy.sparse.csgraph import breadth_first_order

        seen = np.zeros(n, bool)
        order = []
        for start in range(n):
            if seen[start]:
                continue
            nodes = breadth_first_order(csr, start, return_predecessors=False)
            nodes = nodes[~seen[nodes]]
            seen[nodes] = True
            order.append(nodes)
        return np.concatenate(order) if order else np.arange(n)
    if method in ("cluster", "lpa"):
        return cluster_permutation(csr, merge_target=merge_target)
    if method in ("cluster2", "hierarchical"):
        return cluster_permutation(csr, merge_target=merge_target or 1024)
    raise ValueError(f"unknown reorder method {method!r}")


def merge_clusters(
    inv: np.ndarray,
    cluster_edges: "sp.csr_matrix",
    counts: np.ndarray,
    target: int,
    passes: int = 4,
) -> np.ndarray:
    """Heavy-edge-matching agglomeration of cluster labels (METIS-style
    coarsening pass; round-3 verdict ask 3 "hierarchical clustering").

    LPA fragments real graphs into many communities below the tile span;
    edges BETWEEN two small adjacent communities land in the scattered rest
    even when the pair is densely connected. Each pass matches every cluster
    with its heaviest-shared-edge neighbor and merges the pair when the
    combined node count stays ≤ ``target`` — the densest inter-community
    edge bundles become intra-super-cluster, i.e. near-diagonal and
    capturable by dense tiles. Runs on the CONTRACTED cluster graph, so each
    pass is O(#cluster-edges), not O(E).

    ``inv``: int cluster id per node (0..k-1). ``cluster_edges``: k×k CSR of
    inter-cluster edge counts. ``counts``: nodes per cluster. Returns the
    merged cluster id per node (ids re-densified to 0..k'-1).
    """
    k = counts.shape[0]
    parent = np.arange(k)
    size = counts.astype(np.int64).copy()

    def find(u: int) -> int:
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    cg = cluster_edges.tocoo()
    for _ in range(passes):
        if cg.nnz == 0:
            break
        # heaviest neighbor per cluster (stable argmax via lexsort)
        order = np.lexsort((cg.data, cg.row))
        last = np.flatnonzero(
            np.r_[cg.row[order][1:] != cg.row[order][:-1], True]
        )
        heavy_of = np.full(k, -1, np.int64)
        heavy_of[cg.row[order][last]] = cg.col[order][last]

        merged_any = False
        for u in np.argsort(size, kind="stable"):   # smallest first
            v = heavy_of[u]
            if v < 0:
                continue
            ru, rv = find(int(u)), find(int(v))
            if ru == rv or size[ru] + size[rv] > target:
                continue
            parent[rv] = ru
            size[ru] += size[rv]
            merged_any = True
        if not merged_any:
            break
        # contract: re-densify merged ids, push labels down to nodes, and
        # rebuild the cluster graph for the next pass
        root = np.fromiter((find(i) for i in range(k)), np.int64, k)
        uniq_roots, dense_of_old = np.unique(root, return_inverse=True)
        k2 = uniq_roots.shape[0]
        inv = dense_of_old[inv]
        ru, rv = dense_of_old[cg.row], dense_of_old[cg.col]
        keep = ru != rv
        cg = sp.coo_matrix(
            (cg.data[keep], (ru[keep], rv[keep])), shape=(k2, k2)
        )
        cg.sum_duplicates()
        size = size[uniq_roots]
        parent = np.arange(k2)
        k = k2
    return inv


def cluster_permutation(
    adj: sp.spmatrix, max_sweeps: int = 20, order: str = "affinity",
    merge_target: int = 0, merge_passes: int = 4,
) -> np.ndarray:
    """Community-clustering node order for the tiled (BSR) engine.

    Label-propagation (``native.lpa_cluster`` — OMP C++ with a vectorized
    numpy fallback) finds communities in O(E · sweeps) with no METIS
    dependency; nodes are then renumbered cluster-by-cluster, so
    intra-community edges land in dense [row_block × tile_cols] tiles near
    the diagonal and only inter-community edges spill into ``build_tiled``'s
    scattered rest.

    ``order`` picks the second level of the hierarchy — how clusters are
    arranged relative to each other:

    - ``"affinity"`` (default): RCM over the CONTRACTED cluster graph
      (clusters as super-nodes, inter-cluster edge counts as weights), so
      strongly-connected clusters sit adjacent in the id space and their
      inter-cluster edges ALSO fall near the diagonal — capturable by dense
      tiles instead of spilling to the scattered rest. This is the cheap
      two-level stand-in for hierarchical clustering (PERFORMANCE.md open
      item 4).
    - ``"size"``: largest community first (round-3 original).

    ``merge_target`` > 0 enables the third level (round-4): heavy-edge-
    matching agglomeration of sub-tile-size communities into super-clusters
    of up to ``merge_target`` nodes (:func:`merge_clusters`) BEFORE the
    arrangement step — the measured lever for raising ``tiled_fraction``
    (docs/PERFORMANCE.md "scattered rest" open item 4).

    Role analog: the reference's ClusterData partitioning
    (``/root/reference/main.py:29-30``) — its only locality mechanism —
    repurposed as a storage-layout transform. Returns ``perm`` with
    ``perm[new_id] = old_id`` (same contract as :func:`reorder_permutation`).
    """
    from ssrg_tpu import native

    csr = adj.tocsr()
    n = csr.shape[0]
    labels = native.lpa_cluster(csr.indptr, csr.indices, max_sweeps)
    _, inv, counts = np.unique(labels, return_inverse=True, return_counts=True)
    k = counts.shape[0]

    def _cluster_graph(inv, k):
        coo = csr.tocoo()
        cu, cv = inv[coo.row], inv[coo.col]
        inter = cu != cv
        cg = sp.coo_matrix(
            (np.ones(int(inter.sum()), np.float32),
             (cu[inter], cv[inter])), shape=(k, k),
        ).tocsr()
        cg.sum_duplicates()
        return cg

    if merge_target > 0 and 1 < k < n:
        inv = merge_clusters(
            inv, _cluster_graph(inv, k), counts, merge_target,
            passes=merge_passes,
        )
        counts = np.bincount(inv)
        k = counts.shape[0]

    rank = np.empty(k, np.int64)
    if order == "affinity" and 1 < k < n:
        cg = _cluster_graph(inv, k)
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        order_of = np.asarray(reverse_cuthill_mckee(cg, symmetric_mode=True))
        rank[order_of] = np.arange(k)
    elif order in ("affinity", "size"):
        rank[np.argsort(-counts, kind="stable")] = np.arange(k)
    else:
        raise ValueError(f"unknown cluster order {order!r}")
    return np.lexsort((np.arange(n), rank[inv]))


def apply_permutation(
    adj: sp.spmatrix,
    perm: np.ndarray,
    x: Optional[np.ndarray] = None,
    y: Optional[np.ndarray] = None,
) -> Tuple[sp.csr_matrix, Optional[np.ndarray], Optional[np.ndarray], np.ndarray]:
    """Permute adjacency rows+cols (and features/labels). Returns
    (adj', x', y', inverse) with ``inverse[old_id] = new_id`` for mapping
    index sets (train/val/test) into the new id space."""
    n = adj.shape[0]
    inverse = np.empty(n, np.int64)
    inverse[perm] = np.arange(n)
    csr = adj.tocsr()[perm][:, perm].tocsr()
    x2 = None if x is None else np.asarray(x)[perm]
    y2 = None if y is None else np.asarray(y)[perm]
    return csr, x2, y2, inverse


def bandwidth(adj: sp.spmatrix) -> int:
    """Max |row - col| over nonzeros — the locality figure of merit."""
    coo = adj.tocoo()
    if coo.nnz == 0:
        return 0
    return int(np.abs(coo.row.astype(np.int64) - coo.col).max())
