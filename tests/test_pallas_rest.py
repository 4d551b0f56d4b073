"""Scatter-free rest engine (ops/pallas_rest.py, VERDICT r4 ask 3): dense
oracle parity for both executors on the CPU backend (Pallas in interpret
mode), per the repo's kernel test strategy (SURVEY.md §4)."""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ssrg_tpu.ops.pallas_rest import RestSegmentedAdj, build_rest_segmented


def _rest(n=700, deg=3.0, seed=0):
    rng = np.random.default_rng(seed)
    e = int(n * deg)
    r = rng.integers(0, n, size=e)
    c = rng.integers(0, n, size=e)
    v = rng.uniform(0.1, 1.0, size=e).astype(np.float32)
    m = sp.csr_matrix((v, (r, c)), shape=(n, n))
    m.sum_duplicates()
    return m


@pytest.mark.parametrize("row_block,chunk", [(64, 128), (256, 512)])
def test_xla_executor_matches_dense(row_block, chunk):
    adj = _rest()
    x = np.random.default_rng(1).normal(size=(700, 48)).astype(np.float32)
    eng = build_rest_segmented(adj, row_block=row_block, chunk=chunk)
    got = np.asarray(eng.spmm(jnp.asarray(x)))
    want = adj @ x
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_executor_matches_dense_interpret():
    adj = _rest(seed=2)
    x = np.random.default_rng(3).normal(size=(700, 64)).astype(np.float32)
    eng = build_rest_segmented(adj, row_block=64, chunk=128, interpret=True)
    got = np.asarray(eng.spmm_pallas(jnp.asarray(x)))
    want = adj @ x
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_pallas_executor_unaligned_features():
    """F not a multiple of 128 pads internally and slices back."""
    adj = _rest(n=300, seed=4)
    x = np.random.default_rng(5).normal(size=(300, 37)).astype(np.float32)
    eng = build_rest_segmented(adj, row_block=64, chunk=128, interpret=True)
    got = np.asarray(eng.spmm_pallas(jnp.asarray(x)))
    np.testing.assert_allclose(got, adj @ x, rtol=2e-4, atol=2e-4)


def test_empty_and_sparse_blocks():
    """Rows with no edges and entirely empty row blocks stay zero."""
    n = 512
    r = np.array([0, 1, 500, 500])
    c = np.array([3, 4, 5, 6])
    v = np.ones(4, np.float32)
    adj = sp.csr_matrix((v, (r, c)), shape=(n, n))
    x = np.random.default_rng(0).normal(size=(n, 16)).astype(np.float32)
    eng = build_rest_segmented(adj, row_block=64, chunk=128)
    got = np.asarray(eng.spmm(jnp.asarray(x)))
    np.testing.assert_allclose(got, adj @ x, rtol=1e-5, atol=1e-5)
    # edge-carrying blocks get real chunks; each of the 6 empty blocks gets
    # exactly one all-pad chunk (so the Pallas executor zeroes its output)
    assert eng.num_chunks == 8
    got_p = np.asarray(
        build_rest_segmented(adj, row_block=64, chunk=128, interpret=True)
        .spmm_pallas(jnp.asarray(x))
    )
    np.testing.assert_allclose(got_p, adj @ x, rtol=1e-5, atol=1e-5)


def test_rectangular_table():
    """Rest matrices address a gather table wider than the output (halo
    tables): n_cols > n_rows must work."""
    rng = np.random.default_rng(7)
    r = rng.integers(0, 200, size=600)
    c = rng.integers(0, 350, size=600)
    v = rng.uniform(size=600).astype(np.float32)
    adj = sp.csr_matrix((v, (r, c)), shape=(200, 350))
    adj.sum_duplicates()
    x = rng.normal(size=(350, 24)).astype(np.float32)
    eng = build_rest_segmented(adj, row_block=64, chunk=128)
    got = np.asarray(eng.spmm(jnp.asarray(x)))
    np.testing.assert_allclose(got, adj @ x, rtol=2e-4, atol=2e-4)


def test_pytree_jit_argument():
    """Registered pytree: usable as a jit argument (never closure-captured)."""
    adj = _rest(n=256, seed=8)
    x = jnp.asarray(
        np.random.default_rng(9).normal(size=(256, 16)).astype(np.float32)
    )
    eng = build_rest_segmented(adj, row_block=64, chunk=128)

    @jax.jit
    def f(a, h):
        return a.spmm(h)

    got = np.asarray(f(eng, x))
    np.testing.assert_allclose(got, adj @ x, rtol=2e-4, atol=2e-4)


def test_tiled_with_onehot_rest_matches_dense():
    """build_tiled(rest_engine='onehot') — the round-5 default at large N
    on TPU — must match the dense oracle (CPU: XLA executor)."""
    from ssrg_tpu.data.synthetic import sbm_graph
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.sparse import build_tiled

    g = sbm_graph(num_node=600, num_classes=6, num_features=4,
                  p_in=0.2, p_out=0.01, seed=3)
    adj = sym_norm(g.adj, 0.5)
    eng = build_tiled(adj, row_block=8, tile_cols=16, min_edges_per_tile=4,
                      device_scatter=False, rest_engine="onehot")
    assert type(eng.rest).__name__ == "RestSegmentedAdj"
    x = np.random.default_rng(0).normal(size=(600, 24)).astype(np.float32)
    got = np.asarray(eng.spmm(jnp.asarray(x)))
    np.testing.assert_allclose(got, adj @ x, rtol=2e-4, atol=2e-4)


def test_gather_budget_guard():
    """Above the slab budget the Pallas executor refuses with a remedy
    (wavelet-guard contract) instead of OOMing mid-jit."""
    adj = _rest(n=300, seed=11)
    eng = build_rest_segmented(adj, row_block=64, chunk=128, interpret=True)
    x = jnp.zeros((300, 16), jnp.float32)
    old = RestSegmentedAdj.MAX_GATHER_BYTES
    try:
        RestSegmentedAdj.MAX_GATHER_BYTES = 1024
        with pytest.raises(ValueError, match="gather_bf16"):
            eng.spmm_pallas(x)
    finally:
        RestSegmentedAdj.MAX_GATHER_BYTES = old
