"""SpMM engine autotuner.

Measures the candidate device formats on the actual (graph, feature-width)
workload and returns the fastest — the empirical answer to "which sparse
layout does this TPU like for this degree distribution". Timing uses the
same amortized protocol as the benchmark harness (all reps inside one jitted
scan, tiny fetched output) so it is valid through high-RTT remote backends.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ssrg_tpu.ops.sparse import Adjacency, device_adjacency


def _time_engine(adj_dev: Adjacency, x: jnp.ndarray, reps: int) -> float:
    # NOTE: the adjacency must be a jit ARGUMENT, not a closure capture —
    # captured device arrays are inlined into the HLO as constants, which
    # bloats (re)compilation and overflows remote-compile request limits on
    # tunneled backends (observed: HTTP 413 at ~0.8 GB constants).
    @partial(jax.jit, static_argnames=("n",))
    def many(a, h0, n):
        def body(c, _):
            out = a.spmm(h0)
            return c + out.ravel()[0], None

        out, _ = jax.lax.scan(body, jnp.float32(0), None, length=n)
        return out

    _ = float(many(adj_dev, x, reps))  # compile + warm
    t0 = time.perf_counter()
    _ = float(many(adj_dev, x, reps))
    return (time.perf_counter() - t0) / reps


def autotune_engine(
    adj: sp.spmatrix,
    feature_dim: int,
    candidates: Sequence[str] = (
        "dense", "coo", "ell", "hybrid", "banded", "tiled",
    ),
    reps: int = 8,
    dense_limit: int = 16384,
    seed: int = 0,
    verbose: bool = False,
) -> Tuple[str, Dict[str, float]]:
    """Return (best_engine_name, per-engine seconds/hop)."""
    rng = np.random.default_rng(seed)
    x = jnp.asarray(
        rng.normal(size=(adj.shape[1], feature_dim)).astype(np.float32)
    )
    timings: Dict[str, float] = {}
    for name in candidates:
        if name == "dense" and adj.shape[0] > dense_limit:
            continue
        try:
            adj_dev = device_adjacency(adj, name)
            timings[name] = _time_engine(adj_dev, x, reps)
        except Exception as exc:  # engine not viable for this graph
            if verbose:
                print(f"autotune: {name} failed: {exc!r}")
    if not timings:
        raise RuntimeError("no SpMM engine could be timed")
    best = min(timings, key=timings.get)
    if verbose:
        for k, v in sorted(timings.items(), key=lambda kv: kv[1]):
            print(f"autotune: {k}: {v * 1e3:.2f} ms/hop")
    return best, timings
