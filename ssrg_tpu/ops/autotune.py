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


# NOTE: the adjacency must be a jit ARGUMENT, not a closure capture —
# captured device arrays are inlined into the HLO as constants, which
# bloats (re)compilation and overflows remote-compile request limits on
# tunneled backends (observed: HTTP 413 at ~0.8 GB constants).
@partial(jax.jit, static_argnames=("n",))
def _many_hops(a: Adjacency, h0: jnp.ndarray, n: int) -> jnp.ndarray:
    # the carry must be CHAINED (h = a.spmm(h)) — a loop body computing
    # a.spmm(h0) is loop-invariant and XLA hoists it out of the while
    # loop, so the timing would measure ONE hop regardless of `n`
    def body(h, _):
        return a.spmm(h), None

    h, _ = jax.lax.scan(body, h0, None, length=n)
    # tiny data-dependent output forces execution through remote relays
    return h[0, :2] + h[-1, :2]


def _time_engine(adj_dev: Adjacency, x: jnp.ndarray, reps: int) -> float:
    _ = np.asarray(_many_hops(adj_dev, x, reps))  # compile + warm
    t0 = time.perf_counter()
    _ = np.asarray(_many_hops(adj_dev, x, reps))
    return (time.perf_counter() - t0) / reps


def autotune_engine(
    adj: sp.spmatrix,
    feature_dim: int,
    candidates: Sequence[str] = (
        "dense", "coo", "ell", "hybrid", "banded", "tiled", "pallas_banded",
        "reorder_banded", "reorder_tiled",
    ),
    reps: int = 8,
    dense_limit: int = 16384,
    seed: int = 0,
    verbose: bool = False,
    dense_block_budget_bytes: int = 256 << 20,
) -> Tuple[str, Dict[str, float]]:
    """Return (best_engine_name, per-engine seconds/hop).

    ``dense_block_budget_bytes`` caps the banded/tiled candidates well below
    their standalone defaults: autotuning only needs a *timing sample*, and on
    slow host→device links (the remote relay here moves ~3-4 MB/s) shipping a
    multi-GiB dense-block array just to time one engine would stall for many
    minutes. Graphs whose banded/tiled pack exceeds the budget simply skip
    those candidates (the builders raise, caught below)."""
    # probe features are generated ON DEVICE: timing is value-independent and
    # a host->device transfer of [N, F] through a slow link (~3-4 MB/s here)
    # would cost minutes at ogbn scale
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(seed), (adj.shape[1], feature_dim), jnp.float32
        )
    )()
    timings: Dict[str, float] = {}
    for name in candidates:
        if name == "dense" and adj.shape[0] > dense_limit:
            continue
        if name == "pallas_banded" and jax.default_backend() == "cpu":
            continue  # interpret mode: correct but not a meaningful timing
        if name in ("tiled", "reorder_tiled"):
            # device_scatter ships ~12 B/edge instead of the padded blocks,
            # so the transfer budget no longer binds — the (device-memory)
            # budget can be the builder's own default
            kwargs = {"device_scatter": True}
        elif name in ("banded", "pallas_banded", "reorder_banded"):
            kwargs = {"mem_budget_bytes": dense_block_budget_bytes}
        else:
            kwargs = {}
        try:
            if name in ("reorder_banded", "reorder_tiled"):
                # meta-engines: time the dense-block engine on the REORDERED
                # graph (hop cost is permutation-invariant; prepare() redoes
                # the cheap O(E) permutation and un-permutes the hop stack)
                from ssrg_tpu.ops.reorder import (
                    apply_permutation, reorder_permutation,
                )

                method = "rcm" if name == "reorder_banded" else "cluster"
                base = "banded" if name == "reorder_banded" else "tiled"
                if base == "banded" and jax.default_backend() != "cpu":
                    base = "pallas_banded"
                adj_p, _, _, _ = apply_permutation(
                    adj, reorder_permutation(adj, method)
                )
                adj_dev = device_adjacency(adj_p, base, **kwargs)
            else:
                adj_dev = device_adjacency(adj, name, **kwargs)
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
