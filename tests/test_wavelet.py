"""Wavelet subsystem tests (SURVEY.md §2.5/§2.12/§3.2):
Chebyshev evaluation vs dense spectral oracle, construction invariants, layer
restructuring equivalence, and end-to-end GWNN training."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig, WaveletConfig
from ssrg_tpu.models.wavelet import (
    GraphWaveletLayer,
    calculate_wavelets,
    cheby_op_batch,
    combinatorial_laplacian,
    compute_cheby_coeff,
    estimate_lmax,
)
from ssrg_tpu.ops.sparse import build_dense


def _graph(n=80, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.uniform(size=(n, n)) < 0.1).astype(np.float64)
    np.fill_diagonal(a, 0)
    a = np.maximum(a, a.T)
    return sp.csr_matrix(a)


def test_cheby_high_order_matches_dense_heat_kernel():
    """Order-40 Chebyshev ≈ exact U exp(-tau*Lambda/lmax) U^T."""
    adj = _graph()
    lap = combinatorial_laplacian(adj)
    lmax = estimate_lmax(lap)
    tau = 0.5
    coeffs = compute_cheby_coeff(tau, lmax, order=40)
    n = adj.shape[0]
    x = np.eye(n, dtype=np.float32)
    approx = np.asarray(
        cheby_op_batch(build_dense(lap), coeffs, jnp.asarray(x), lmax)
    )
    lam, u = np.linalg.eigh(lap.toarray())
    exact = u @ np.diag(np.exp(-tau * lam / lmax)) @ u.T
    np.testing.assert_allclose(approx, exact, atol=1e-4)


def test_calculate_wavelets_invariants():
    adj = _graph(seed=1)
    cfg = WaveletConfig(approximation_order=3, tolerance=1e-4, scale=0.5,
                        impulse_batch=32)
    phi, phi_inv, stats = calculate_wavelets(adj, cfg, verbose=False)
    n = adj.shape[0]
    assert phi.shape == (n, n) and phi_inv.shape == (n, n)
    # L1-normalized rows
    for mat in (phi, phi_inv):
        rowsum = np.abs(mat).sum(axis=1).A.reshape(-1)
        nz = rowsum > 0
        np.testing.assert_allclose(rowsum[nz], 1.0, rtol=1e-5)
        # thresholding removed small entries
        assert mat.nnz < n * n
    assert 0 < stats["phi_density"] <= 100


def test_impulse_batching_invariant_to_batch_size():
    adj = _graph(seed=2)
    cfg_a = WaveletConfig(impulse_batch=16)
    cfg_b = WaveletConfig(impulse_batch=1024)  # > n: single batch
    phi_a, inv_a, _ = calculate_wavelets(adj, cfg_a, verbose=False)
    phi_b, inv_b, _ = calculate_wavelets(adj, cfg_b, verbose=False)
    np.testing.assert_allclose(phi_a.toarray(), phi_b.toarray(), atol=1e-5)
    np.testing.assert_allclose(inv_a.toarray(), inv_b.toarray(), atol=1e-5)


def test_layer_matches_spspmm_formulation():
    """Φ·(θ ⊙ (Φ⁻¹·(XW))) == (Φ diag(θ) Φ⁻¹) (XW) — the reference's
    spspmm chain (simple_models.py:314-340) computed densely."""
    rng = np.random.default_rng(3)
    n, f, out_dim = 30, 12, 5
    phi = rng.uniform(size=(n, n)) * (rng.uniform(size=(n, n)) < 0.3)
    phi_inv = rng.uniform(size=(n, n)) * (rng.uniform(size=(n, n)) < 0.3)
    x = rng.normal(size=(n, f)).astype(np.float32)

    layer = GraphWaveletLayer(output_dim=out_dim, apply_act=False)
    phi_d = build_dense(sp.csr_matrix(phi.astype(np.float32)))
    inv_d = build_dense(sp.csr_matrix(phi_inv.astype(np.float32)))
    variables = layer.init(jax.random.PRNGKey(0), x, phi_d, inv_d)
    got = np.asarray(layer.apply(variables, x, phi_d, inv_d))

    theta = np.asarray(variables["params"]["theta"]).reshape(-1)
    w = np.asarray(variables["params"]["weight"])
    expected = (phi @ np.diag(theta) @ phi_inv) @ (x @ w)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_wavelet_model_end_to_end():
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    ds = planetoid_like(num_node=400, num_classes=3, num_features=24, seed=4)
    cfg = ModelConfig(model_name="wavelet", hidden_dim=32, dropout=0.3)
    tcfg = TrainingConfig(num_epochs=100, lr=0.01, seed=1)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    task = NodeClassification(ds, spec, cfg, tcfg)
    assert task.best_test > 0.7, f"wavelet test acc {task.best_test:.3f}"


def test_wavelet_construction_refuses_at_scale():
    """Scale guard (round-3 verdict ask 6): construction is O(N²/batch) with
    dense [N, batch] intermediates; a metadata-scale N=200k adjacency must be
    refused with an actionable message BEFORE any heavy work."""
    import pytest

    n = 200_000
    # metadata-scale sparse matrix: build cost is O(nnz), trivially small
    adj = sp.coo_matrix(
        (np.ones(4, np.float32), ([0, 1, 2, 3], [1, 0, 3, 2])), shape=(n, n)
    ).tocsr()
    with pytest.raises(ValueError, match="max_nodes"):
        calculate_wavelets(adj, WaveletConfig(), verbose=False)
    with pytest.raises(ValueError, match="sgc"):
        calculate_wavelets(adj, WaveletConfig(), verbose=False)
    # raising the budget explicitly bypasses the guard (construction would
    # then start; we only check the guard logic, not run it)
    cfg = WaveletConfig(max_nodes=250_000)
    assert n <= cfg.max_nodes
