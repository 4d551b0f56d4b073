"""Parity against the reference's shipped Planetoid sparsity data
(SURVEY.md §2.8): edge/label/split files are intact in the snapshot (the
large feature ``.pt`` files are truncated, so features are not read here).
Checks that our Graph symmetrization reproduces the documented counts
(cora 2,708 N / 5,278 E / 7 C; official splits 140/500/1000) and the
documented homophily (edge 0.81, planetoid.py:31)."""

import os.path as osp

import numpy as np
import pytest

REF_ROOT = (
    "/root/reference/Scalable Spectral Robust GNN/sparsity_datasets/simhomo/"
    "Planetoid"
)

needs_ref = pytest.mark.skipif(
    not osp.isdir(REF_ROOT), reason="reference data not mounted"
)


def _load(name, fname):
    import torch

    return torch.load(
        osp.join(REF_ROOT, name, "raw", fname),
        map_location="cpu", weights_only=False,
    )


@needs_ref
def test_cora_0_0_counts_and_splits():
    from ssrg_tpu.data.graph import Graph

    edge_index = _load("cora_0_0", "edge_index.pt").numpy()
    label = _load("cora_0_0", "label.pt").numpy()
    train_idx = np.asarray(list(_load("cora_0_0", "train_idx.pt")))
    val_idx = np.asarray(list(_load("cora_0_0", "val_idx.pt")))
    test_idx = np.asarray(list(_load("cora_0_0", "test_idx.pt")))

    n = label.shape[0]
    assert n == 2708
    assert int(label.max()) + 1 == 7
    assert edge_index.shape == (2, 5278)
    assert (train_idx.shape[0], val_idx.shape[0], test_idx.shape[0]) == (
        140, 500, 1000,
    )

    g = Graph(
        edge_index[0], edge_index[1], np.ones(edge_index.shape[1], np.float32),
        n, "UUU", y=label,
    )
    # symmetrization reproduces the documented undirected count
    assert g.num_edge == 2 * 5278
    assert (g.adj != g.adj.T).nnz == 0

    from ssrg_tpu.data.utils import edge_homophily

    coo = g.adj.tocoo()
    h = edge_homophily(coo.row, coo.col, label)
    assert abs(h - 0.81) < 0.005, f"edge homophily {h}"


@needs_ref
def test_cora_sparsified_variant_counts():
    """cora_0_0.7: 70% of edges dropped -> ~30% survive."""
    full = _load("cora_0_0", "edge_index.pt").numpy()
    sparse = _load("cora_0_0.7", "edge_index.pt").numpy()
    ratio = sparse.shape[1] / full.shape[1]
    assert 0.28 < ratio < 0.32, f"survival ratio {ratio}"
