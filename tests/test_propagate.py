"""Propagation engines vs pure-numpy hop loops (SURVEY.md §4(c)), including
the complex/magnetic engine vs scipy complex matrix powers — replacing the
reference's exponential calculator enumeration
(SSRG/operators/base_operator.py:143-208)."""

import numpy as np
import scipy.sparse as sp

from ssrg_tpu.ops import normalize
from ssrg_tpu.ops.propagate import propagate, propagate_complex, propagate_multi
from ssrg_tpu.ops.sparse import build_coo, build_dense


def _setup(n=60, f=9, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.uniform(size=(n, n)) < 0.1).astype(np.float32)
    np.fill_diagonal(a, 0)
    a = np.maximum(a, a.T)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return sp.csr_matrix(a), x


def test_propagate_matches_numpy_loop():
    adj, x = _setup()
    p = normalize.sym_norm(adj, 0.5)
    k = 4
    hops = np.asarray(propagate(build_coo(p), x, k))
    expected = [x]
    for _ in range(k):
        expected.append(p @ expected[-1])
    for i in range(k + 1):
        np.testing.assert_allclose(hops[i], expected[i], rtol=3e-5, atol=3e-5)


def test_propagate_dense_coo_agree():
    adj, x = _setup(seed=1)
    p = normalize.sym_norm(adj, 0.5)
    h1 = np.asarray(propagate(build_dense(p), x, 3))
    h2 = np.asarray(propagate(build_coo(p), x, 3))
    np.testing.assert_allclose(h1, h2, rtol=3e-5, atol=3e-5)


def test_propagate_complex_matches_scipy_powers():
    rng = np.random.default_rng(2)
    n, f, k = 40, 5, 3
    a = (rng.uniform(size=(n, n)) < 0.15).astype(np.float64)
    np.fill_diagonal(a, 0)
    adj = sp.csr_matrix(a)
    re_m, im_m = normalize.magnetic_norm(adj, 0.5, 0.05)
    x = rng.normal(size=(n, f)).astype(np.float32)

    re_hops, im_hops = propagate_complex(
        build_dense(re_m), build_dense(im_m), x, k
    )
    cmat = re_m.toarray().astype(np.complex128) + 1j * im_m.toarray()
    cur = x.astype(np.complex128)
    for i in range(k + 1):
        np.testing.assert_allclose(np.asarray(re_hops[i]), cur.real, rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(im_hops[i]), cur.imag, rtol=1e-4, atol=1e-4)
        cur = cmat @ cur


def test_propagate_multi_triple():
    adj, x = _setup(seed=3)
    un, inn, out = normalize.un_in_out_norm(adj, 0.5)
    k = 2
    hu, hi, ho = propagate_multi(
        (build_dense(un), build_dense(inn), build_dense(out)), x, k
    )
    for mat, hops in [(un, hu), (inn, hi), (out, ho)]:
        expected = [x]
        for _ in range(k):
            expected.append(mat @ expected[-1])
        for i in range(k + 1):
            np.testing.assert_allclose(
                np.asarray(hops[i]), expected[i], rtol=1e-4, atol=1e-4
            )
