"""Normalization library vs dense numpy oracles (SURVEY.md §4(a)): each of
the seven constructions is checked against an independently-written dense
formula."""

import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.ops import normalize


def _random_directed(n=40, density=0.1, seed=0, weighted=False):
    rng = np.random.default_rng(seed)
    mat = (rng.uniform(size=(n, n)) < density).astype(np.float64)
    np.fill_diagonal(mat, 0)
    if weighted:
        mat *= rng.uniform(0.5, 2.0, size=(n, n))
    return sp.csr_matrix(mat)


def _random_undirected(n=40, density=0.1, seed=0):
    a = _random_directed(n, density, seed).toarray()
    a = np.maximum(a, a.T)
    return sp.csr_matrix(a)


@pytest.mark.parametrize("r", [0.5, 0.3, 1.0])
def test_sym_norm_dense_oracle(r):
    adj = _random_undirected(seed=1)
    a = adj.toarray() + np.eye(adj.shape[0])
    deg = a.sum(1)
    expected = np.diag(deg ** (r - 1)) @ a @ np.diag(deg ** -r)
    got = normalize.sym_norm(adj, r).toarray()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_ppr_norm_dense_oracle():
    adj = _random_undirected(seed=2)
    alpha, r = 0.15, 0.5
    expected = (1 - alpha) * normalize.sym_norm(adj, r).toarray() + alpha * np.eye(
        adj.shape[0]
    )
    got = normalize.ppr_norm(adj, r, alpha).toarray()
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_magnetic_norm_dense_oracle():
    adj = _random_directed(seed=3, weighted=True)
    n = adj.shape[0]
    r, q = 0.5, 0.05
    a = adj.toarray()
    a_s = (a + a.T) / 2 + np.eye(n)          # sym + self loops
    theta = a - a.T                           # no phase on loops
    deg = a_s.sum(1)
    scale = np.diag(deg ** (r - 1)) @ a_s @ np.diag(deg ** -r)
    phase = np.exp(1j * 2 * np.pi * q * theta)
    expected = scale * phase
    # expected only where a_s nonzero
    expected[a_s == 0] = 0
    re, im = normalize.magnetic_norm(adj, r, q)
    np.testing.assert_allclose(re.toarray(), expected.real, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(im.toarray(), expected.imag, rtol=1e-5, atol=1e-5)


def test_magnetic_com_ppr_norm():
    adj = _random_directed(seed=4)
    r, q, alpha = 0.5, 0.25, 0.15
    re0, im0 = normalize.magnetic_norm(adj, r, q)
    re, im = normalize.magnetic_com_ppr_norm(adj, r, q, alpha)
    n = adj.shape[0]
    np.testing.assert_allclose(
        re.toarray(), (1 - alpha) * re0.toarray() + alpha * np.eye(n), atol=1e-6
    )
    np.testing.assert_allclose(im.toarray(), (1 - alpha) * im0.toarray(), atol=1e-6)


def test_un_in_out_norm_dense_oracle():
    adj = _random_directed(seed=5)
    n = adj.shape[0]
    r = 0.5
    a = (adj.toarray() != 0).astype(np.float64) + np.eye(n)
    deg = a.sum(1)
    p = np.diag(1 / deg) @ a

    def scale(mat):
        d = mat.sum(1)
        with np.errstate(divide="ignore"):
            left, right = d ** (r - 1), d ** -r
        left[~np.isfinite(left)] = 0
        right[~np.isfinite(right)] = 0
        return np.diag(left) @ mat @ np.diag(right)

    un, in_n, out_n = normalize.un_in_out_norm(adj, r)
    np.testing.assert_allclose(un.toarray(), scale(a), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(in_n.toarray(), scale(p.T @ p), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(out_n.toarray(), scale(p @ p.T), rtol=1e-5, atol=1e-6)


def test_fast_ppr_approx_norm_properties():
    adj = _random_directed(seed=6)
    out = normalize.fast_ppr_approx_norm(adj, 0.5, 0.1)
    dense = out.toarray()
    assert np.isfinite(dense).all()
    assert dense.shape == adj.shape
    assert out.nnz > 0
    # resulting matrix is built from a symmetrized Laplacian: support symmetric
    assert ((dense != 0) == (dense.T != 0)).all()


def test_two_order_ppr_approx_norm_properties():
    adj = _random_directed(n=25, seed=7)
    one, two = normalize.two_order_ppr_approx_norm(adj, 0.5, 0.1)
    assert np.isfinite(one.toarray()).all()
    assert np.isfinite(two.toarray()).all()
    assert one.shape == adj.shape and two.shape == adj.shape
    assert one.nnz > 0 and two.nnz > 0


def test_magnetic_pygsd_norm_runs():
    adj = _random_directed(seed=8)
    re, im = normalize.magnetic_pygsd_norm(adj, 0.5, 0.05)
    assert np.isfinite(re.toarray()).all() and np.isfinite(im.toarray()).all()


@pytest.mark.parametrize("seed", range(3))
def test_sym_norm_properties(seed):
    """Property checks for D^{r-1}(A+I)D^{-r}: r=0.5 output symmetric for
    symmetric input; r=0 row-stochastic; r=1 column-stochastic; spectral
    radius <= 1."""
    adj = _random_undirected(n=60, density=0.12, seed=seed)
    half = normalize.sym_norm(adj, 0.5).toarray()
    np.testing.assert_allclose(half, half.T, rtol=1e-5, atol=1e-7)
    rw = normalize.sym_norm(adj, 0.0).toarray()
    np.testing.assert_allclose(rw.sum(1), 1.0, rtol=1e-5)
    cw = normalize.sym_norm(adj, 1.0).toarray()
    np.testing.assert_allclose(cw.sum(0), 1.0, rtol=1e-5)
    eigs = np.linalg.eigvals(half)
    assert np.abs(eigs).max() <= 1.0 + 1e-5


def test_model_spec_type_guard():
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.train.node_classification import NodeClassification

    ds = planetoid_like(num_node=100, num_classes=3, num_features=8, seed=0)
    mc = ModelConfig(model_name="sgc")
    with pytest.raises(TypeError, match="ModelSpec"):
        NodeClassification(ds, mc, mc, TrainingConfig(num_epochs=1))


def test_two_order_ppr_scale_guard():
    """Above max_nodes the dense construction must refuse with a remedy
    (VERDICT r4 ask 7; wavelet-guard contract)."""
    adj = _random_undirected(n=40, density=0.1, seed=0)
    with pytest.raises(ValueError, match="max_nodes"):
        normalize.two_order_ppr_approx_norm(adj, max_nodes=10)
    # remedy text names an actionable alternative
    with pytest.raises(ValueError, match="fast_ppr_approx_norm"):
        normalize.two_order_ppr_approx_norm(adj, max_nodes=10)
    # under the budget it still works
    one, two = normalize.two_order_ppr_approx_norm(adj, max_nodes=40)
    assert one.shape == (40, 40)


def test_un_in_out_second_order_guard():
    """Hub-heavy graphs whose PᵀP would densify must refuse with a remedy."""
    import scipy.sparse as sp

    n = 50
    # star graph: hub column degree n => est nnz ~ n^2
    rows = np.zeros(n - 1, np.int64)
    cols = np.arange(1, n, dtype=np.int64)
    adj = sp.csr_matrix((np.ones(n - 1), (rows, cols)), shape=(n, n))
    with pytest.raises(ValueError, match="max_second_order_nnz"):
        normalize.un_in_out_norm(adj, max_second_order_nnz=100)
    un, in_l, out_l = normalize.un_in_out_norm(adj)  # default budget passes
    assert un.shape == (n, n)
