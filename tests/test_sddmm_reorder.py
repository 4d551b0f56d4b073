"""SDDMM op + graph reordering utilities."""

import numpy as np
import scipy.sparse as sp

from ssrg_tpu.ops.reorder import apply_permutation, bandwidth, reorder_permutation
from ssrg_tpu.ops.sddmm import sddmm, sddmm_softmax_spmm


def test_sddmm_matches_numpy():
    rng = np.random.default_rng(0)
    n, f, e = 50, 16, 300
    row = rng.integers(0, n, e).astype(np.int32)
    col = rng.integers(0, n, e).astype(np.int32)
    u = rng.normal(size=(n, f)).astype(np.float32)
    v = rng.normal(size=(n, f)).astype(np.float32)
    expected = (u[row] * v[col]).sum(1)
    np.testing.assert_allclose(np.asarray(sddmm(row, col, u, v)), expected,
                               rtol=1e-5, atol=1e-5)
    # chunked path
    np.testing.assert_allclose(
        np.asarray(sddmm(row, col, u, v, chunk=64)), expected,
        rtol=1e-5, atol=1e-5,
    )


def test_sddmm_softmax_spmm_matches_dense_attention():
    rng = np.random.default_rng(1)
    n, f = 20, 8
    dense_mask = (rng.uniform(size=(n, n)) < 0.3)
    coo = sp.coo_matrix(dense_mask.astype(np.float32))
    row = coo.row.astype(np.int32)
    col = coo.col.astype(np.int32)
    mask = np.ones(coo.nnz, np.float32)
    u = rng.normal(size=(n, f)).astype(np.float32)
    v = rng.normal(size=(n, f)).astype(np.float32)
    vals = rng.normal(size=(n, f)).astype(np.float32)
    got = np.asarray(sddmm_softmax_spmm(row, col, mask, u, v, vals, n))

    scores = u @ v.T
    scores[~dense_mask] = -np.inf
    with np.errstate(invalid="ignore", over="ignore"):
        a = np.exp(scores - np.nanmax(np.where(dense_mask, scores, np.nan),
                                      axis=1, keepdims=True, initial=None))
    a[~dense_mask] = 0
    denom = a.sum(1, keepdims=True)
    denom[denom == 0] = 1
    expected = (a / denom) @ vals
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_reorder_preserves_graph():
    rng = np.random.default_rng(2)
    n = 80
    a = (rng.uniform(size=(n, n)) < 0.05).astype(np.float32)
    np.fill_diagonal(a, 0)
    adj = sp.csr_matrix(np.maximum(a, a.T))
    x = rng.normal(size=(n, 4)).astype(np.float32)
    y = rng.integers(0, 3, n)
    for method in ("rcm", "bfs", "degree"):
        perm = reorder_permutation(adj, method)
        adj2, x2, y2, inverse = apply_permutation(adj, perm, x, y)
        assert sorted(perm.tolist()) == list(range(n))
        # edges preserved under renaming
        assert adj2.nnz == adj.nnz
        i, j = 5, 17
        np.testing.assert_allclose(adj2[inverse[i], inverse[j]], adj[i, j])
        np.testing.assert_allclose(x2[inverse[i]], x[i])
        assert y2[inverse[j]] == y[j]


def test_rcm_reduces_bandwidth_on_path_graph():
    # scrambled path graph: RCM should give near-minimal bandwidth
    n = 200
    rng = np.random.default_rng(3)
    scramble = rng.permutation(n)
    row = scramble[np.arange(n - 1)]
    col = scramble[np.arange(1, n)]
    adj = sp.csr_matrix(
        (np.ones(n - 1), (row, col)), shape=(n, n)
    )
    adj = adj + adj.T
    before = bandwidth(adj)
    perm = reorder_permutation(adj, "rcm")
    adj2, _, _, _ = apply_permutation(adj, perm)
    after = bandwidth(adj2)
    assert after <= 2 and before > 10
