"""Graph wavelets (GWNN) — TPU-native spectral subsystem.

Rebuild of the reference's SpectralModel + wavelet layers
(``SSRG/models/base_scalable/base_model.py:171-311``,
``simple_models.py:261-430``; also the standalone GWNN sub-project
``wavelet/src``; SURVEY.md §2.5, §2.12, §3.2), with two structural
re-designs:

1. **Construction without pygsp/networkx.** The heat-kernel wavelet basis
   Φ = g(L), g(λ) = exp(-τ λ / λ_max) at τ ∈ {-s, +s}, is evaluated by the
   Chebyshev three-term recurrence applied to batched impulse blocks — K
   SpMMs per block on the device SpMM engine, shapes static per block
   (the reference's batched ``calculate_wavelet``, ``base_model.py:236-265``,
   but the recurrence itself runs on the TPU instead of scipy). λ_max via a
   host-side Lanczos (scipy eigsh) with the pygsp-style 1.01 safety factor.
   Thresholding (coeff < tol -> 0), L1 row normalization, and density
   reporting match the reference semantics.

2. **No spspmm in the layer.** The reference recomputes the sparse-sparse
   product Φ·diag(θ)·Φ⁻¹ every forward step (``simple_models.py:314-328`` —
   dynamic-nnz output, hostile to XLA and O(N·nnz)). Because θ is diagonal,
   the layer is restructured as Φ·(θ ⊙ (Φ⁻¹·(X W))): one MXU matmul plus two
   SpMMs, no sparse-sparse product, fully static shapes (SURVEY.md §3.2
   optimization note).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ssrg_tpu.configs.config import WaveletConfig
from ssrg_tpu.ops.sparse import Adjacency, device_adjacency


# ---------------------------------------------------------------------------
# Chebyshev heat-kernel wavelet construction
# ---------------------------------------------------------------------------


def combinatorial_laplacian(adj: sp.spmatrix) -> sp.csr_matrix:
    """L = D - A (pygsp's default lap_type used by the reference's
    ``pygsp.graphs.Graph``)."""
    a = adj.tocsr().astype(np.float64)
    deg = np.asarray(a.sum(axis=1)).reshape(-1)
    return (sp.diags(deg) - a).tocsr()


def estimate_lmax(lap: sp.csr_matrix, safety: float = 1.01) -> float:
    """Largest Laplacian eigenvalue via Lanczos, inflated by 1% (pygsp's
    ``estimate_lmax`` behavior); falls back to the Gershgorin bound."""
    try:
        from scipy.sparse.linalg import eigsh

        lmax = float(
            eigsh(lap, k=1, which="LM", return_eigenvectors=False, tol=5e-3)[0]
        )
        return lmax * safety
    except Exception:
        deg = lap.diagonal()
        return float(2.0 * deg.max())


def compute_cheby_coeff(tau: float, lmax: float, order: int,
                        quad_points: Optional[int] = None) -> np.ndarray:
    """Chebyshev coefficients of g(λ) = exp(-τ λ / λ_max) on [0, λ_max].

    Gauss-Chebyshev quadrature with N = order+1 points (the pygsp
    ``compute_cheby_coeff`` formula the reference calls at
    ``base_model.py:189-190``): c_k = (2/N) Σ_j g(a1 cos(π(j+.5)/N) + a2)
    cos(π k (j+.5)/N), a1 = a2 = λ_max/2.
    """
    n = quad_points or (order + 1)
    a1 = a2 = lmax / 2.0
    j = (np.arange(n) + 0.5) * np.pi / n
    g = np.exp(-tau * (a1 * np.cos(j) + a2) / lmax)
    coeffs = np.array(
        [2.0 / n * (g * np.cos(k * j)).sum() for k in range(order + 1)]
    )
    return coeffs


def cheby_op_batch(lap_dev: Adjacency, coeffs: np.ndarray, block: jnp.ndarray,
                   lmax: float) -> jnp.ndarray:
    """Evaluate Σ_k c_k T_k(L̃) · block via the three-term recurrence,
    L̃ = (2/λ_max)L - I. Each T_k step is one SpMM — runs on the MXU/VPU."""
    a1 = a2 = lmax / 2.0
    c = [jnp.asarray(v, jnp.float32) for v in coeffs]

    def shifted(x):
        return (lap_dev.spmm(x) - a2 * x) / a1

    t_prev = block                       # T_0 x
    t_cur = shifted(block)               # T_1 x
    out = 0.5 * c[0] * t_prev + c[1] * t_cur
    for k in range(2, len(c)):
        t_next = 2.0 * shifted(t_cur) - t_prev
        out = out + c[k] * t_next
        t_prev, t_cur = t_cur, t_next
    return out


def calculate_wavelets(
    adj: sp.spmatrix,
    cfg: WaveletConfig,
    engine: str = "auto",
    verbose: bool = True,
) -> Tuple[sp.csr_matrix, sp.csr_matrix, dict]:
    """Build (Φ, Φ⁻¹) as thresholded, L1-row-normalized sparse matrices.

    Mirrors ``SpectralModel.preprocess`` (``base_model.py:180-221``): scales
    [-s, +s] in that order (Φ first, then Φ⁻¹, matching the reference's
    feed order into the layer), impulse blocks of ``cfg.impulse_batch``
    columns, threshold coeff < tolerance, L1 normalize rows, report density.
    """
    n = adj.shape[0]
    if n > cfg.max_nodes:
        # same refuse-with-remedy contract as build_banded/build_tiled: the
        # construction is O(N²/impulse_batch) Chebyshev batches, each with a
        # dense [N, impulse_batch] intermediate thresholded on host — at
        # N=200k that is ~40k full-graph SpMM chains and ~160 GB of host
        # traffic, hours of wall time for a basis that is no longer sparse.
        est_gb = n * n * 4 / 2**30
        raise ValueError(
            f"wavelet basis construction at N={n} exceeds the supported "
            f"budget (max_nodes={cfg.max_nodes}): Φ is evaluated by "
            f"{-(-n // cfg.impulse_batch)} batched impulse blocks with dense "
            f"[N, {cfg.impulse_batch}] intermediates (~{est_gb:.0f} GB "
            f"streamed through host thresholding). Wavelet models are a "
            f"Planetoid-scale capability (reference base_model.py:236-265); "
            f"for large graphs use a precompute model (sgc/ssgc/gamlp/...) "
            f"or raise WaveletConfig.max_nodes explicitly if you accept the "
            f"cost."
        )
    lap = combinatorial_laplacian(adj)
    lmax = estimate_lmax(lap)
    lap_dev = device_adjacency(lap.astype(np.float32), engine)
    batch = min(cfg.impulse_batch, n)

    # the Laplacian is a jit ARGUMENT (not a closure capture): captured
    # device arrays are inlined into the HLO as constants, which bloats
    # compiles and overflows remote-compile request limits at scale
    @jax.jit
    def eval_block(lap_arg, coeffs_arr, lo):
        impulse = jnp.zeros((n, batch), jnp.float32)
        idx = lo + jnp.arange(batch)
        impulse = impulse.at[jnp.clip(idx, 0, n - 1), jnp.arange(batch)].set(
            jnp.where(idx < n, 1.0, 0.0)
        )
        return cheby_op_batch(lap_arg, list(coeffs_arr), impulse, lmax)

    mats = []
    for tau in (-cfg.scale, cfg.scale):
        coeffs = compute_cheby_coeff(tau, lmax, cfg.approximation_order)
        cols = []
        for lo in range(0, n, batch):
            hi = min(lo + batch, n)
            width = hi - lo
            out = np.array(eval_block(lap_dev, jnp.asarray(coeffs), lo))[:, :width]
            out[out < cfg.tolerance] = 0.0   # reference's threshold semantics
            cols.append(sp.csr_matrix(out))
        mat = sp.hstack(cols).tocsr()
        # L1 row normalization (sklearn normalize(norm='l1', axis=1))
        rowsum = np.abs(mat).sum(axis=1).A.reshape(-1)
        inv = np.where(rowsum > 0, 1.0 / rowsum, 0.0)
        mat = sp.diags(inv) @ mat
        mats.append(mat.tocsr().astype(np.float32))

    phi, phi_inv = mats
    stats = {
        "lmax": lmax,
        "phi_density": 100.0 * phi.nnz / (n * n),
        "phi_inv_density": 100.0 * phi_inv.nnz / (n * n),
    }
    if verbose:
        print(f"Density of wavelets: {stats['phi_density']:.2f}%.")
        print(f"Density of inverse wavelets: {stats['phi_inv_density']:.2f}%.")
    return phi, phi_inv, stats


def prepare_spectral(
    adj: sp.spmatrix, cfg: WaveletConfig, engine: str = "auto",
    verbose: bool = False,
) -> Tuple[Adjacency, Adjacency]:
    """SpectralModel.preprocess equivalent: device-resident (Φ, Φ⁻¹)."""
    phi, phi_inv, _ = calculate_wavelets(adj, cfg, engine, verbose=verbose)
    return device_adjacency(phi, engine), device_adjacency(phi_inv, engine)


# ---------------------------------------------------------------------------
# Layers / heads
# ---------------------------------------------------------------------------


def _theta_init(key, shape, dtype=jnp.float32):
    """Diagonal filter init U(0.9, 1.1) (reference GraphWaveletLayer
    ``diagonal_weight_filter.uniform_(0.9, 1.1)``)."""
    return jax.random.uniform(key, shape, dtype, 0.9, 1.1)


class GraphWaveletLayer(nn.Module):
    """One wavelet convolution: Φ · diag(θ) · Φ⁻¹ · (X W).

    Restructured SpMM chain (see module docstring) — numerically identical to
    the reference's spspmm formulation because θ is diagonal."""

    output_dim: int
    dropout: float = 0.5
    apply_act: bool = True   # sparse layer applies relu+dropout, dense does not

    @nn.compact
    def __call__(self, x, phi: Adjacency, phi_inv: Adjacency,
                 train: bool = False):
        ncount = phi.shape[0]
        theta = self.param("theta", _theta_init, (ncount, 1))
        w = self.param(
            "weight",
            nn.initializers.variance_scaling(2.0, "fan_avg", "uniform"),
            (x.shape[-1], self.output_dim),
        )
        z = jnp.dot(x, w, preferred_element_type=jnp.float32)   # MXU
        u = phi_inv.spmm(z)
        u = theta * u
        y = phi.spmm(u)
        if self.apply_act:
            y = jax.nn.relu(y)
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class Wavelet2NeuralNetwork(nn.Module):
    """Two stacked wavelet layers (reference ``simple_models.py:388-430``).
    Returns raw logits; the task layer applies softmax-CE (the reference's
    trailing log_softmax is folded into the loss)."""

    hidden_dim: int
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, feature, adj, train: bool = False, query_edges=None):
        phi, phi_inv = adj
        h = GraphWaveletLayer(
            output_dim=self.hidden_dim, dropout=self.dropout, name="conv1"
        )(feature, phi, phi_inv, train=train)
        logits = GraphWaveletLayer(
            output_dim=self.output_dim, dropout=self.dropout,
            apply_act=False, name="conv2",
        )(h, phi, phi_inv, train=train)
        if query_edges is not None:
            x = jnp.concatenate(
                [logits[query_edges[:, 0]], logits[query_edges[:, 1]]], axis=-1
            )
            return nn.Dense(self.output_dim, name="edge_fc")(x)
        return logits
