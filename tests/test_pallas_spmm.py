"""Pallas SpMM kernel parity vs scipy (interpret mode on CPU; the same
kernel compiles via Mosaic on TPU)."""

import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.ops.pallas_spmm import build_pallas_csr
from ssrg_tpu.ops.sparse import device_adjacency


def _random_csr(n, density, seed=0):
    rng = np.random.default_rng(seed)
    mat = sp.random(
        n, n, density=density, format="csr",
        random_state=np.random.RandomState(seed),
        data_rvs=lambda k: rng.normal(size=k).astype(np.float32),
    )
    return mat.astype(np.float32)


@pytest.mark.parametrize("n,density,f", [(64, 0.1, 128), (200, 0.05, 128)])
def test_pallas_spmm_matches_scipy(n, density, f):
    adj = _random_csr(n, density, seed=n)
    x = np.random.default_rng(1).normal(size=(n, f)).astype(np.float32)
    pal = build_pallas_csr(adj, interpret=True)
    got = np.asarray(pal.spmm(x))
    np.testing.assert_allclose(got, adj @ x, rtol=3e-5, atol=3e-5)


def test_pallas_tail_handles_hubs():
    # one hub row far beyond the ELL width
    rng = np.random.default_rng(3)
    n, f = 96, 128
    row = np.concatenate([rng.integers(0, n, 300), np.full(60, 5)])
    col = rng.integers(0, n, row.shape[0])
    val = rng.normal(size=row.shape[0]).astype(np.float32)
    adj = sp.csr_matrix((val, (row, col)), shape=(n, n))
    adj.sum_duplicates()
    x = rng.normal(size=(n, f)).astype(np.float32)
    pal = build_pallas_csr(adj, width=4, interpret=True)
    assert pal.tail.val.shape[0] > 0
    np.testing.assert_allclose(
        np.asarray(pal.spmm(x)), adj @ x, rtol=3e-5, atol=3e-5
    )


def test_engine_dispatch_pallas():
    adj = _random_csr(64, 0.1, seed=9)
    from ssrg_tpu.ops.pallas_spmm import PallasELLAdj

    dev = device_adjacency(adj, "pallas", interpret=True)
    assert isinstance(dev, PallasELLAdj)


def test_pallas_in_propagate():
    from ssrg_tpu.ops.propagate import propagate

    adj = _random_csr(80, 0.08, seed=11)
    x = np.random.default_rng(2).normal(size=(80, 128)).astype(np.float32)
    pal = build_pallas_csr(adj, interpret=True)
    hops = np.asarray(propagate(pal, x, 2))
    expected = [x, adj @ x]
    expected.append(adj @ expected[-1])
    for i in range(3):
        np.testing.assert_allclose(hops[i], expected[i], rtol=1e-4, atol=1e-4)
