"""Native C++ graph-builder vs numpy/scipy oracles. The numpy fallback paths
are exercised by monkeypatching the library away, so both tiers stay green."""

import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu import native


def _edges(n=300, e=2000, seed=0, weighted=True):
    rng = np.random.default_rng(seed)
    rows = rng.integers(0, n, e)
    cols = rng.integers(0, n, e)
    w = rng.uniform(0.5, 2.0, e).astype(np.float32) if weighted else None
    return rows, cols, w


@pytest.fixture(params=["native", "fallback"])
def tier(request, monkeypatch):
    if request.param == "native":
        if not native.available():
            pytest.skip("native library unavailable")
    else:
        monkeypatch.setattr(native, "load_library", lambda: None)
    return request.param


def test_symmetrize_matches_scipy(tier):
    n = 300
    rows, cols, w = _edges(n)
    r, c, wv = native.symmetrize_edges(rows, cols, w, n, clamp_unit=False)
    expect = sp.coo_matrix(
        (np.concatenate([w, w]),
         (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
        shape=(n, n),
    ).tocsr()
    expect.setdiag(0)
    expect.eliminate_zeros()
    got = sp.csr_matrix((wv, (r, c)), shape=(n, n))
    assert (got != got.T).nnz == 0
    np.testing.assert_allclose(got.toarray(), expect.toarray(), rtol=1e-5)


def test_symmetrize_clamps_unit(tier):
    n = 50
    rows = np.array([0, 1, 1])
    cols = np.array([1, 0, 0])  # duplicate + reverse -> would sum to > 1
    r, c, w = native.symmetrize_edges(rows, cols, None, n, clamp_unit=True)
    assert w.max() <= 1.0


def test_sym_norm_csr_matches_normalize(tier):
    from ssrg_tpu.ops.normalize import sym_norm

    n = 200
    rows, cols, w = _edges(n, seed=3)
    adj = sp.csr_matrix((w, (rows, cols)), shape=(n, n))
    adj = adj + adj.T
    expected = sym_norm(adj, 0.5)
    with_loops = (adj + sp.eye(n)).tocsr()
    with_loops.sort_indices()
    data = native.sym_norm_csr(
        with_loops.indptr, with_loops.indices, with_loops.data, 0.5
    )
    got = sp.csr_matrix((data, with_loops.indices, with_loops.indptr), shape=(n, n))
    np.testing.assert_allclose(
        got.toarray(), expected.toarray(), rtol=1e-5, atol=1e-6
    )


def test_ell_hybrid_pack_roundtrip(tier):
    n = 150
    rows, cols, w = _edges(n, e=1200, seed=5)
    adj = sp.csr_matrix((w, (rows, cols)), shape=(n, n))
    adj.sum_duplicates()
    width, n_pad = 4, 256
    ec, ev, tr, tc, tv = native.ell_hybrid_pack(
        adj.indptr, adj.indices, adj.data, width, n_pad
    )
    # reconstruct
    rows_of = np.repeat(np.arange(n_pad), width)
    recon = sp.coo_matrix(
        (np.concatenate([ev.reshape(-1), tv]),
         (np.concatenate([rows_of, tr]), np.concatenate([ec.reshape(-1), tc]))),
        shape=(n_pad, n),
    ).tocsr()[:n]
    # ELL zero-padding adds explicit zeros at (row, 0); compare dense
    np.testing.assert_allclose(recon.toarray(), adj.toarray(), rtol=1e-5)


def test_coalesce_counts(tier):
    lib = native.load_library()
    if lib is None:
        pytest.skip("fallback tier has no direct coalesce")
    rows = np.array([2, 0, 0, 2], np.int64)
    cols = np.array([1, 3, 3, 1], np.int64)
    w = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    out_r = np.empty(4, np.int64)
    out_c = np.empty(4, np.int64)
    out_w = np.empty(4, np.float32)
    m = lib.coalesce_edges(rows, cols, w, 4, 5, out_r, out_c, out_w)
    assert m == 2
    np.testing.assert_array_equal(out_r[:2], [0, 2])
    np.testing.assert_array_equal(out_c[:2], [3, 1])
    np.testing.assert_allclose(out_w[:2], [5.0, 5.0])


def test_edge_degree_accumulate_matches_add_at():
    rng = np.random.default_rng(0)
    n, e = 500, 4000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    deg = np.zeros(n, np.int64)
    native.edge_degree_accumulate(src, dst, deg)
    ref = np.zeros(n, np.int64)
    keep = src != dst
    np.add.at(ref, src[keep], 1)
    np.add.at(ref, dst[keep], 1)
    np.testing.assert_array_equal(deg, ref)


def test_edge_degree_accumulate_numpy_fallback(monkeypatch):
    monkeypatch.setattr(native, "load_library", lambda: None)
    rng = np.random.default_rng(1)
    n, e = 300, 2000
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    deg = np.zeros(n, np.int64)
    native.edge_degree_accumulate(src, dst, deg)
    ref = np.zeros(n, np.int64)
    keep = src != dst
    np.add.at(ref, src[keep], 1)
    np.add.at(ref, dst[keep], 1)
    np.testing.assert_array_equal(deg, ref)
