"""SpMM engine parity: every device format must match scipy exactly
(f32 tolerances) on random CSR matrices — the rebuild's version of the
reference's implicit scipy-vs-C-kernel cross-check
(reference: SSRG/operators/base_operator.py:309-314; SURVEY.md §4(b))."""

import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.ops.sparse import build_coo, build_dense, build_ell, device_adjacency


def _random_csr(n, m, density, seed=0):
    rng = np.random.default_rng(seed)
    mat = sp.random(
        n, m, density=density, format="csr", random_state=np.random.RandomState(seed),
        data_rvs=lambda k: rng.normal(size=k).astype(np.float32),
    )
    return mat.astype(np.float32)


@pytest.mark.parametrize("builder", [build_dense, build_coo, build_ell])
@pytest.mark.parametrize(
    "n,m,f,density",
    [(64, 64, 16, 0.1), (200, 200, 33, 0.05), (301, 301, 8, 0.02)],
)
def test_spmm_matches_scipy(builder, n, m, f, density):
    adj = _random_csr(n, m, density, seed=n)
    x = np.random.default_rng(1).normal(size=(m, f)).astype(np.float32)
    expected = adj @ x
    got = np.asarray(builder(adj).spmm(x))
    np.testing.assert_allclose(got, expected, rtol=2e-5, atol=2e-5)


def test_coo_chunked_matches_unchunked():
    adj = _random_csr(500, 500, 0.05, seed=7)
    x = np.random.default_rng(2).normal(size=(500, 12)).astype(np.float32)
    small_chunks = build_coo(adj, chunk=512)
    assert small_chunks.nnz_padded % small_chunks.chunk == 0
    np.testing.assert_allclose(
        np.asarray(small_chunks.spmm(x)), adj @ x, rtol=2e-5, atol=2e-5
    )


def test_empty_rows_and_weighted():
    # rows with no nonzeros must produce zero rows
    adj = sp.csr_matrix(
        (np.array([2.0, 0.5], np.float32), (np.array([0, 3]), np.array([1, 2]))),
        shape=(5, 5),
    )
    x = np.eye(5, dtype=np.float32)
    for builder in (build_dense, build_coo, build_ell):
        out = np.asarray(builder(adj).spmm(x))
        np.testing.assert_allclose(out, adj.toarray(), atol=1e-6)


def test_device_adjacency_auto():
    small = _random_csr(32, 32, 0.2)
    big = _random_csr(9000, 9000, 0.0005)
    from ssrg_tpu.ops.sparse import DenseAdj, HybridAdj

    assert isinstance(device_adjacency(small, "auto"), DenseAdj)
    assert isinstance(device_adjacency(big, "auto"), HybridAdj)


def test_hybrid_matches_scipy():
    from ssrg_tpu.ops.sparse import build_hybrid

    # power-law-ish: a few hub rows with huge degree
    rng = np.random.default_rng(9)
    n = 400
    rows = [rng.integers(0, n, size=2000)]
    rows.append(np.full(500, 7))   # hub row
    rows.append(np.full(300, 123))
    row = np.concatenate(rows)
    col = rng.integers(0, n, size=row.shape[0])
    val = rng.normal(size=row.shape[0]).astype(np.float32)
    adj = sp.csr_matrix((val, (row, col)), shape=(n, n))
    adj.sum_duplicates()
    x = rng.normal(size=(n, 24)).astype(np.float32)
    hyb = build_hybrid(adj, width=8)
    np.testing.assert_allclose(
        np.asarray(hyb.spmm(x)), adj @ x, rtol=3e-5, atol=3e-5
    )
    # tail actually used
    assert float(np.asarray(hyb.tail.val).sum()) != 0.0


def test_ell_rejects_overflow():
    adj = _random_csr(50, 50, 0.3, seed=3)
    with pytest.raises(ValueError):
        build_ell(adj, width=1)


def test_hybrid_on_powerlaw_graph():
    """Hub-heavy degree distribution exercises the COO tail heavily."""
    from ssrg_tpu.data.synthetic import powerlaw_graph
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.sparse import build_hybrid

    g = powerlaw_graph(2000, 10.0, seed=4)
    deg = g.degrees()
    assert deg.max() > 8 * deg.mean()  # genuinely hub-heavy
    p = sym_norm(g.adj, 0.5)
    x = np.random.default_rng(0).normal(size=(2000, 16)).astype(np.float32)
    hyb = build_hybrid(p)
    assert hyb.tail.val.shape[0] > 0
    np.testing.assert_allclose(np.asarray(hyb.spmm(x)), p @ x, rtol=3e-5, atol=3e-5)


# -- banded (windowed dense-block) engine ------------------------------------


def _banded_random(n, band, density, seed=0):
    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), max(1, int(band * density)))
    offs = rng.integers(-band, band + 1, size=rows.shape[0])
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.normal(size=rows.shape[0]).astype(np.float32)
    return sp.csr_matrix((vals, (rows, cols)), shape=(n, n))


def test_banded_matches_scipy():
    from ssrg_tpu.ops.sparse import build_banded

    adj = _banded_random(700, band=40, density=0.2, seed=1)
    x = np.random.default_rng(2).normal(size=(700, 16)).astype(np.float32)
    out = np.asarray(build_banded(adj, row_block=64).spmm(x))
    np.testing.assert_allclose(out, adj @ x, rtol=1e-4, atol=1e-4)


def test_banded_tiny_graph_window_exceeds_n():
    from ssrg_tpu.ops.sparse import build_banded

    adj = _banded_random(40, band=10, density=0.5, seed=3)
    x = np.random.default_rng(4).normal(size=(40, 8)).astype(np.float32)
    out = np.asarray(build_banded(adj, row_block=16).spmm(x))
    np.testing.assert_allclose(out, adj @ x, rtol=1e-4, atol=1e-4)


def test_banded_budget_refusal_on_unordered_graph():
    from ssrg_tpu.ops.sparse import build_banded

    rng = np.random.default_rng(5)
    n, nnz = 4096, 16384
    adj = sp.csr_matrix(
        (np.ones(nnz, np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n),
    )
    with pytest.raises(ValueError, match="not banded enough"):
        build_banded(adj, mem_budget_bytes=1 << 20)


def test_banded_after_rcm_reorder():
    """RCM turns a clustered graph banded; banded engine matches the oracle
    through the reorder round-trip."""
    from ssrg_tpu.data.synthetic import sbm_graph
    from ssrg_tpu.ops.reorder import apply_permutation, reorder_permutation
    from ssrg_tpu.ops.sparse import build_banded

    g = sbm_graph(600, 6, 12, seed=7)
    perm = reorder_permutation(g.adj, "rcm")
    adj2, x2, _, _ = apply_permutation(g.adj, perm, g.x)
    out = np.asarray(build_banded(adj2, row_block=64).spmm(x2))
    np.testing.assert_allclose(out, adj2 @ x2, rtol=2e-4, atol=2e-4)


def test_banded_bf16_storage():
    import jax.numpy as jnp

    from ssrg_tpu.ops.sparse import build_banded

    adj = _banded_random(300, band=30, density=0.3, seed=8)
    x = np.random.default_rng(9).normal(size=(300, 8)).astype(np.float32)
    out = np.asarray(build_banded(adj, row_block=64, dtype=jnp.bfloat16).spmm(x))
    ref = adj @ x
    # bf16 weights: ~2-3 significant digits
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)


def test_banded_in_propagate_and_autotune():
    from ssrg_tpu.ops.autotune import autotune_engine
    from ssrg_tpu.ops.propagate import propagate
    from ssrg_tpu.ops.sparse import build_banded

    adj = _banded_random(256, band=20, density=0.3, seed=10)
    x = np.random.default_rng(11).normal(size=(256, 8)).astype(np.float32)
    hops = np.asarray(propagate(build_banded(adj, row_block=64), x, 2))
    ref = x
    for k in range(3):
        np.testing.assert_allclose(hops[k], ref, rtol=1e-3, atol=1e-3)
        ref = adj @ ref
    best, timings = autotune_engine(adj, 8, reps=2)
    assert "banded" in timings


# -- tiled (BSR-style dense-block) engine -------------------------------------


def _clustered_graph(n=1024, communities=8, p_in=0.15, p_out=0.001, seed=0):
    from ssrg_tpu.data.synthetic import sbm_graph

    g = sbm_graph(n, communities, 8, p_in=p_in, p_out=p_out, seed=seed)
    # sort nodes by community so clusters are contiguous (RCM-like layout)
    order = np.argsort(g.y, kind="stable")
    adj = g.adj.tocsr()[order][:, order].tocsr()
    rng = np.random.default_rng(seed + 1)
    adj.data[:] = rng.normal(size=adj.nnz).astype(np.float32)
    return adj


def test_tiled_matches_scipy():
    from ssrg_tpu.ops.sparse import build_tiled

    adj = _clustered_graph()
    x = np.random.default_rng(2).normal(size=(1024, 16)).astype(np.float32)
    t = build_tiled(adj, row_block=64, tile_cols=128, min_edges_per_tile=16)
    np.testing.assert_allclose(
        np.asarray(t.spmm(x)), adj @ x, rtol=2e-4, atol=2e-4
    )


def test_tiled_refuses_unclustered():
    from ssrg_tpu.ops.sparse import build_tiled

    rng = np.random.default_rng(3)
    n, nnz = 8192, 8192  # ~4 edges per 256x512 tile: gather regime
    adj = sp.csr_matrix(
        (np.ones(nnz, np.float32),
         (rng.integers(0, n, nnz), rng.integers(0, n, nnz))),
        shape=(n, n),
    )
    with pytest.raises(ValueError, match="not clustered enough"):
        build_tiled(adj)


def test_tiled_all_edges_in_tiles():
    """Fully clustered graph: the hybrid rest is a zero stub."""
    from ssrg_tpu.ops.sparse import build_tiled

    adj = _clustered_graph(n=256, communities=2, p_in=0.4, p_out=0.0)
    x = np.random.default_rng(4).normal(size=(256, 8)).astype(np.float32)
    t = build_tiled(adj, row_block=32, tile_cols=128, min_edges_per_tile=8,
                    min_tiled_fraction=0.9)
    np.testing.assert_allclose(
        np.asarray(t.spmm(x)), adj @ x, rtol=2e-4, atol=2e-4
    )


def test_tiled_bf16_and_propagate():
    import jax.numpy as jnp

    from ssrg_tpu.ops.propagate import propagate
    from ssrg_tpu.ops.sparse import build_tiled

    adj = _clustered_graph(n=512, communities=4)
    x = np.random.default_rng(5).normal(size=(512, 8)).astype(np.float32)
    t16 = build_tiled(adj, row_block=64, tile_cols=128,
                      min_edges_per_tile=16, dtype=jnp.bfloat16)
    out16 = np.asarray(t16.spmm(x))
    ref = adj @ x
    # bf16 error scales with accumulation magnitude, not per element
    assert np.abs(out16 - ref).max() <= 2e-2 * np.abs(ref).max() + 1e-2
    t = build_tiled(adj, row_block=64, tile_cols=128, min_edges_per_tile=16)
    hops = np.asarray(propagate(t, x, 2))
    ref = x
    for k in range(3):
        np.testing.assert_allclose(hops[k], ref, rtol=1e-3, atol=1e-3)
        ref = adj @ ref


def test_build_tiled_device_scatter_matches_host_build():
    """device_scatter=True materializes the SAME tiles on device from
    compact (slot, offset, value) tuples — the slow-link transfer remedy."""
    import scipy.sparse as sp

    from ssrg_tpu.ops.sparse import build_coo, build_tiled

    rng = np.random.default_rng(0)
    n = 2048
    base = (np.arange(n) // 128) * 128
    r = np.repeat(np.arange(n), 10)
    c = base[r] + rng.integers(0, 128, r.shape)
    keep = r != c
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], c[keep])), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    adj.data[:] = rng.uniform(0.5, 1.0, adj.nnz).astype(np.float32)
    kw = dict(row_block=64, tile_cols=128, min_edges_per_tile=16)
    t_host = build_tiled(adj, **kw)
    t_dev = build_tiled(adj, device_scatter=True, **kw)
    assert t_host.tiled_fraction == t_dev.tiled_fraction > 0.5
    np.testing.assert_allclose(np.asarray(t_host.tiles), np.asarray(t_dev.tiles))
    np.testing.assert_allclose(np.asarray(t_host.starts), np.asarray(t_dev.starts))
    x = rng.normal(size=(n, 16)).astype(np.float32)
    ref = np.asarray(build_coo(adj).spmm(x))
    np.testing.assert_allclose(np.asarray(t_dev.spmm(x)), ref,
                               rtol=2e-4, atol=2e-4)


def test_tiled_device_scatter_chunked_matches_oracle(monkeypatch):
    """Edge-chunked device scatter (TPU [E,2] scatter indices lane-pad 2→128,
    so big packs must stream edges through a donated accumulator): forcing a
    tiny chunk must reproduce the one-shot host pack exactly, including the
    padded no-op tail entries."""
    import scipy.sparse as sp

    import ssrg_tpu.ops.sparse as sparse_mod
    from ssrg_tpu.ops.sparse import build_tiled

    rng = np.random.default_rng(3)
    n = 1024
    base = (np.arange(n) // 128) * 128
    r = np.repeat(np.arange(n), 8)
    c = base[r] + rng.integers(0, 128, r.shape)
    keep = r != c
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], c[keep])), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    adj.data[:] = rng.uniform(0.5, 1.0, adj.nnz).astype(np.float32)
    kw = dict(row_block=64, tile_cols=128, min_edges_per_tile=16)
    t_host = build_tiled(adj, device_scatter=False, **kw)
    monkeypatch.setattr(sparse_mod, "_SCATTER_EDGE_CHUNK", 1000)  # ~15 chunks
    t_dev = build_tiled(adj, device_scatter=True, **kw)
    np.testing.assert_allclose(np.asarray(t_host.tiles),
                               np.asarray(t_dev.tiles))


def test_blockcoo_matches_coo_oracle():
    """2-D bucketed COO (small-window gather/scatter locality engine) must
    reproduce plain COO SpMM exactly, including ragged edge buckets and
    non-multiple shapes."""
    import scipy.sparse as sp

    from ssrg_tpu.ops.sparse import build_blockcoo, build_coo

    rng = np.random.default_rng(7)
    n, m = 1000, 900  # not multiples of the bucket sizes
    nnz = 8000
    r = rng.integers(0, n, nnz)
    c = rng.integers(0, m, nnz)
    v = rng.normal(size=nnz).astype(np.float32)
    adj = sp.coo_matrix((v, (r, c)), shape=(n, m)).tocsr()
    x = rng.normal(size=(m, 12)).astype(np.float32)
    ref = np.asarray(build_coo(adj).spmm(x))
    got = build_blockcoo(adj, row_bucket=256, col_bucket=192, lane_pad=64)
    np.testing.assert_allclose(np.asarray(got.spmm(x)), ref,
                               rtol=2e-4, atol=2e-4)


def test_tiled_with_blockcoo_rest_matches_oracle():
    import scipy.sparse as sp

    from ssrg_tpu.ops.sparse import build_coo, build_tiled

    rng = np.random.default_rng(3)
    n = 2048
    base = (np.arange(n) // 128) * 128
    r_in = np.repeat(np.arange(n), 8)
    c_in = base[r_in] + rng.integers(0, 128, r_in.shape)
    r_sc = np.repeat(np.arange(n), 2)
    c_sc = rng.integers(0, n, r_sc.shape)
    r = np.concatenate([r_in, r_sc]); c = np.concatenate([c_in, c_sc])
    keep = r != c
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (r[keep], c[keep])), shape=(n, n)
    )
    adj = (adj + adj.T).tocsr()
    adj.data[:] = rng.uniform(0.5, 1.0, adj.nnz).astype(np.float32)
    x = rng.normal(size=(n, 16)).astype(np.float32)
    ref = np.asarray(build_coo(adj).spmm(x))
    tiled = build_tiled(adj, row_block=64, tile_cols=128,
                        min_edges_per_tile=16, rest_engine="blockcoo")
    from ssrg_tpu.ops.sparse import BlockCOOAdj
    assert isinstance(tiled.rest, BlockCOOAdj)
    np.testing.assert_allclose(np.asarray(tiled.spmm(x)), ref,
                               rtol=2e-4, atol=2e-4)
