"""Locality-aware Pallas banded kernel (VERDICT r1 item 9): one DMA per
contiguous [window, F] slab instead of one 512-byte row per edge.

Correctness via interpret mode on CPU against the scipy oracle and against
the XLA BandedAdj engine it competes with; TPU timing lives in
benchmarks/banded_kernel_bench.py and docs/PERFORMANCE.md.
"""

import numpy as np
import pytest
import scipy.sparse as sp

import jax
import jax.numpy as jnp

from ssrg_tpu.ops.pallas_banded import build_pallas_banded
from ssrg_tpu.ops.sparse import build_banded, device_adjacency


def banded_graph(n=700, deg=5, bw=60, seed=0):
    rng = np.random.default_rng(seed)
    r = np.repeat(np.arange(n), deg)
    c = np.clip(r + rng.integers(-bw, bw + 1, r.shape), 0, n - 1)
    v = rng.normal(size=r.shape).astype(np.float32)
    return sp.csr_matrix((v, (r, c)), shape=(n, n))


def test_matches_scipy_oracle():
    adj = banded_graph()
    x = np.random.default_rng(1).normal(size=(700, 16)).astype(np.float32)
    pb = build_pallas_banded(adj, row_block=64)
    got = np.asarray(pb.spmm(jnp.asarray(x)))
    np.testing.assert_allclose(got, adj @ x, rtol=1e-4, atol=1e-4)


def test_matches_xla_banded_engine():
    adj = banded_graph(n=520, deg=4, bw=40, seed=2)
    x = np.random.default_rng(3).normal(size=(520, 8)).astype(np.float32)
    pb = build_pallas_banded(adj, row_block=64)
    xla = build_banded(adj, row_block=64)
    np.testing.assert_allclose(
        np.asarray(pb.spmm(jnp.asarray(x))),
        np.asarray(xla.spmm(jnp.asarray(x))),
        rtol=1e-5, atol=1e-5,
    )
    # identical storage: only the execution strategy differs
    np.testing.assert_array_equal(np.asarray(pb.los), np.asarray(xla.los))


def test_jit_argument_pytree():
    """The kernel adjacency crosses the jit boundary as an argument."""
    adj = banded_graph(n=256, deg=3, bw=30, seed=4)
    x = np.random.default_rng(5).normal(size=(256, 8)).astype(np.float32)
    pb = build_pallas_banded(adj, row_block=64)

    @jax.jit
    def two_hops(a, h):
        return a.spmm(a.spmm(h))

    got = np.asarray(two_hops(pb, jnp.asarray(x)))
    want = adj @ (adj @ x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_device_adjacency_engine_name():
    adj = banded_graph(n=256, deg=3, bw=30, seed=6)
    eng = device_adjacency(adj, "pallas_banded", row_block=64)
    assert eng.window % 128 == 0
    assert eng.shape == (256, 256)


def test_refuses_unbanded_graph():
    rng = np.random.default_rng(7)
    n = 4096
    r = rng.integers(0, n, 4 * n)
    c = rng.integers(0, n, 4 * n)
    adj = sp.csr_matrix((np.ones(4 * n, np.float32), (r, c)), shape=(n, n))
    with pytest.raises(ValueError, match="not banded"):
        build_pallas_banded(adj, mem_budget_bytes=16 << 20)


def test_window_bf16_matches_oracle_loosely():
    """bf16-staged window halves window-DMA bytes; result must match the
    f32 engine within half-precision tolerance (interpret mode)."""
    import jax.numpy as jnp
    import scipy.sparse as sp

    from ssrg_tpu.ops.pallas_banded import build_pallas_banded
    from ssrg_tpu.ops.sparse import build_coo

    rng = np.random.default_rng(4)
    n, bw = 512, 40
    r = np.repeat(np.arange(n), 6)
    c = np.clip(r + rng.integers(-bw, bw + 1, r.shape), 0, n - 1)
    keep = r != c
    adj = sp.coo_matrix(
        (rng.uniform(0.1, 1.0, keep.sum()).astype(np.float32),
         (r[keep], c[keep])), shape=(n, n),
    ).tocsr()
    x = rng.normal(size=(n, 16)).astype(np.float32)
    ref = np.asarray(build_coo(adj).spmm(x))
    eng = build_pallas_banded(adj, row_block=64, interpret=True,
                              window_bf16=True)
    got = np.asarray(eng.spmm(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)
