#!/usr/bin/env python
"""Autotune engine selection on a clustered graph (VERDICT r1 item 2 "done"
criterion: autotune selects the tiled engine on clustered graphs).

Builds a genuinely clustered SBM (communities aligned to 512-column
segments, the post-reorder layout) at a size whose packs fit the autotune
transfer budget, runs the real ``autotune_engine`` (host-side builders +
on-chip timing), and prints the per-engine ms/hop and the winner.

Run on the chip: python benchmarks/autotune_clustered_bench.py
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import scipy.sparse as sp


def clustered_graph(n=32768, comm=512, intra_deg=20, inter_deg=4, seed=0):
    """SBM with communities aligned to contiguous id ranges."""
    rng = np.random.default_rng(seed)
    base = (np.arange(n) // comm) * comm
    r_in = np.repeat(np.arange(n), intra_deg)
    c_in = base[r_in] + rng.integers(0, comm, r_in.shape)
    r_out = np.repeat(np.arange(n), inter_deg)
    c_out = rng.integers(0, n, r_out.shape)
    r = np.concatenate([r_in, r_out])
    c = np.concatenate([c_in, c_out]).clip(0, n - 1)
    adj = sp.csr_matrix((np.ones(r.shape, np.float32), (r, c)), shape=(n, n))
    adj.sum_duplicates()
    from ssrg_tpu.ops.normalize import sym_norm

    return sym_norm(adj, 0.5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=32768)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax

    from ssrg_tpu.ops.autotune import autotune_engine

    print(f"device: {jax.devices()[0].platform}", flush=True)
    adj = clustered_graph(args.nodes)
    best, timings = autotune_engine(
        adj, args.features, reps=args.reps, verbose=True,
    )
    print(json.dumps({
        "bench": "autotune_clustered", "best": best,
        "ms_per_hop": {k: round(v * 1e3, 2) for k, v in timings.items()},
        "num_nodes": args.nodes, "nnz": int(adj.nnz),
    }), flush=True)


if __name__ == "__main__":
    main()
