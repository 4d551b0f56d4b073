"""Standalone GWNN pipeline — graph wavelet neural network trainer.

Rebuild of the reference's ``wavelet/src`` sub-project (SURVEY.md §2.12):
``WaveletSparsifier`` (pygsp heat filters + full-impulse cheby_op →
threshold-sparsify → L1 normalize → density report), data readers (edge CSV /
JSON sparse features / CSV targets), the 2-layer GWNN
(sparse layer → dense layer → log_softmax), and ``GWNNTrainer``
(train/test split, Adam NLL fit loop with per-epoch wall-time logs, score).

Re-designs: the wavelet basis comes from the shared TPU-native Chebyshev
engine (``ssrg_tpu.models.wavelet`` — batched impulse SpMM chain instead of
the N×N one-shot ``cheby_op`` at ``wavelet/src/utils.py:89-104``), and the
layers use the restructured Φ·(θ⊙(Φ⁻¹·(XW))) SpMM chain (no spspmm).
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ssrg_tpu.configs.config import WaveletConfig
from ssrg_tpu.models.wavelet import GraphWaveletLayer, calculate_wavelets
from ssrg_tpu.ops.sparse import device_adjacency
from ssrg_tpu.train.common import make_optimizer


# ---------------------------------------------------------------------------
# Config (reference wavelet/src/param_parser.py:5-79 defaults)
# ---------------------------------------------------------------------------


@dataclass
class GWNNConfig:
    epochs: int = 200
    filters: int = 32
    approximation_order: int = 3
    tolerance: float = 1e-4
    scale: float = 1.0
    dropout: float = 0.5
    learning_rate: float = 0.01
    weight_decay: float = 1e-5
    test_size: float = 0.2
    seed: int = 42


# ---------------------------------------------------------------------------
# Data readers (reference wavelet/src/utils.py:24-59)
# ---------------------------------------------------------------------------


def read_edges_csv(path: str) -> sp.csr_matrix:
    """Edge-list CSV (header row, two id columns) -> symmetric adjacency."""
    raw = np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.int64)
    raw = raw.reshape(-1, raw.shape[-1])[:, :2]
    n = int(raw.max()) + 1
    rows = np.concatenate([raw[:, 0], raw[:, 1]])
    cols = np.concatenate([raw[:, 1], raw[:, 0]])
    adj = sp.csr_matrix(
        (np.ones(rows.shape[0], np.float32), (rows, cols)), shape=(n, n)
    )
    adj.data[:] = 1.0
    adj.setdiag(0)
    adj.eliminate_zeros()
    return adj


def read_features_json(path: str, num_nodes: Optional[int] = None) -> np.ndarray:
    """{node: [active feature ids]} JSON -> dense binary feature matrix."""
    with open(path) as f:
        data = json.load(f)
    idx = {int(k): [int(v) for v in vs] for k, vs in data.items()}
    n = num_nodes or (max(idx) + 1)
    f_dim = max((max(v) for v in idx.values() if v), default=0) + 1
    x = np.zeros((n, f_dim), np.float32)
    for node, feats in idx.items():
        x[node, feats] = 1.0
    return x


def read_targets_csv(path: str) -> np.ndarray:
    raw = np.genfromtxt(path, delimiter=",", skip_header=1, dtype=np.int64)
    raw = raw.reshape(-1, raw.shape[-1])
    out = np.zeros(int(raw[:, 0].max()) + 1, np.int64)
    out[raw[:, 0]] = raw[:, 1]
    return out


# ---------------------------------------------------------------------------
# Wavelet sparsifier (reference wavelet/src/utils.py:70-138)
# ---------------------------------------------------------------------------


class WaveletSparsifier:
    """Heat-kernel wavelet basis builder with the reference's API shape."""

    def __init__(self, adj: sp.spmatrix, scale: float, approximation_order: int,
                 tolerance: float, engine: str = "auto"):
        self.adj = adj
        self.cfg = WaveletConfig(
            approximation_order=approximation_order,
            tolerance=tolerance,
            scale=scale,
        )
        self.engine = engine
        self.phi_matrices: List[sp.csr_matrix] = []
        self.stats: Dict[str, float] = {}

    def calculate_all_wavelets(self, verbose: bool = False) -> None:
        phi, phi_inv, stats = calculate_wavelets(
            self.adj, self.cfg, self.engine, verbose=verbose
        )
        self.phi_matrices = [phi, phi_inv]
        self.stats = stats


# ---------------------------------------------------------------------------
# Network + trainer (reference wavelet/src/gwnn.py)
# ---------------------------------------------------------------------------


class GraphWaveletNeuralNetwork(nn.Module):
    """Sparse wavelet layer -> dense wavelet layer -> log_softmax
    (reference gwnn.py:8-69)."""

    filters: int
    output_dim: int
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, phi, phi_inv, train: bool = False):
        h = GraphWaveletLayer(
            output_dim=self.filters, dropout=self.dropout, name="sparse_layer"
        )(x, phi, phi_inv, train=train)
        out = GraphWaveletLayer(
            output_dim=self.output_dim, apply_act=False, name="dense_layer"
        )(h, phi, phi_inv, train=train)
        return jax.nn.log_softmax(out, axis=1)


class GWNNTrainer:
    """fit/score driver (reference gwnn.py:71-194)."""

    def __init__(self, config: GWNNConfig, sparsifier: WaveletSparsifier,
                 features: np.ndarray, targets: np.ndarray,
                 engine: str = "auto"):
        self.cfg = config
        self.x = jnp.asarray(features, jnp.float32)
        self.y = jnp.asarray(targets)
        self.num_classes = int(targets.max()) + 1
        phi, phi_inv = sparsifier.phi_matrices
        self.phi = device_adjacency(phi, engine)
        self.phi_inv = device_adjacency(phi_inv, engine)
        self.module = GraphWaveletNeuralNetwork(
            filters=config.filters, output_dim=self.num_classes,
            dropout=config.dropout,
        )
        n = features.shape[0]
        rng = np.random.default_rng(config.seed)
        perm = rng.permutation(n)
        n_test = int(config.test_size * n)
        self.test_idx = jnp.asarray(np.sort(perm[:n_test]))
        self.train_idx = jnp.asarray(np.sort(perm[n_test:]))
        self.logs: List[Dict] = []

    def fit(self, verbose: bool = False, scan: bool = False) -> None:
        """Adam NLL fit loop (reference gwnn.py:151-176). With ``scan=True``
        all epochs run inside one jitted ``lax.scan`` (single dispatch; the
        per-epoch ``seconds`` log entries become the amortized mean)."""
        cfg = self.cfg
        rng = jax.random.PRNGKey(cfg.seed)
        rng, init_rng = jax.random.split(rng)
        params = self.module.init(
            {"params": init_rng, "dropout": init_rng},
            self.x, self.phi, self.phi_inv, train=False,
        )["params"]
        tx = make_optimizer(cfg.learning_rate, cfg.weight_decay)
        opt_state = tx.init(params)

        # x/phi/y ride through jit as ARGUMENTS, not closure captures —
        # captured device arrays become HLO constants (slow compiles; request
        # size limits on remote-compile relays)
        def step_raw(x, phi, phi_inv, y, train_idx, params, opt_state, rng):
            def loss_fn(p):
                logp = self.module.apply(
                    {"params": p}, x, phi, phi_inv,
                    train=True, rngs={"dropout": rng},
                )
                nll = -jnp.take_along_axis(
                    logp[train_idx], y[train_idx][:, None], axis=1
                ).mean()
                return nll

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        # the partial binds AFTER jit, so x/phi/... remain jit arguments
        step = partial(
            jax.jit(step_raw), self.x, self.phi, self.phi_inv, self.y,
            jnp.asarray(self.train_idx),
        )

        if scan:
            # the outer jit must ALSO take x/phi/... as arguments: tracing
            # through the partial-bound `step` would inline the bound
            # concrete arrays into run_all's program as constants (the
            # closure-capture failure mode the repo forbids)
            @partial(jax.jit, static_argnames=("epochs",))
            def run_all(x, phi, phi_inv, y, train_idx, params, opt_state,
                        rng0, epochs):
                def epoch_fn(carry, i):
                    params, opt_state = carry
                    params, opt_state, loss = step_raw(
                        x, phi, phi_inv, y, train_idx,
                        params, opt_state, jax.random.fold_in(rng0, i),
                    )
                    return (params, opt_state), loss

                return jax.lax.scan(
                    epoch_fn, (params, opt_state), jnp.arange(epochs),
                    length=epochs,
                )

            t0 = time.time()
            (params, opt_state), losses = run_all(
                self.x, self.phi, self.phi_inv, self.y,
                jnp.asarray(self.train_idx),
                params, opt_state, rng, cfg.epochs
            )
            per_epoch = (time.time() - t0) / max(cfg.epochs, 1)
            for epoch, loss in enumerate(np.asarray(losses)):
                self.logs.append(
                    {"epoch": epoch, "loss": float(loss),
                     "seconds": per_epoch}
                )
                if verbose:
                    print(f"epoch {epoch + 1}: nll {float(loss):.4f}")
            self.params = params
            return

        for epoch in range(cfg.epochs):
            t0 = time.time()
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss = step(params, opt_state, step_rng)
            self.logs.append(
                {"epoch": epoch, "loss": float(loss), "seconds": time.time() - t0}
            )
            if verbose:
                print(f"epoch {epoch + 1}: nll {float(loss):.4f}")
        self.params = params

    def score(self) -> float:
        logp = self.module.apply(
            {"params": self.params}, self.x, self.phi, self.phi_inv, train=False
        )
        pred = jnp.argmax(logp[self.test_idx], axis=1)
        return float(jnp.mean((pred == self.y[self.test_idx]).astype(jnp.float32)))
