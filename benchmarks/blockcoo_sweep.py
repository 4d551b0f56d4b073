#!/usr/bin/env python
"""BlockCOO bucket-size sweep on the scattered rest (round-3 follow-up).

At (64k × 64k) buckets the accumulator slab read-modify-write costs
nb_c · 2 · N · F · 4 bytes per hop (13 GB at N=1M, nb_c=16) — more than the
gather traffic it saves. Larger buckets cut slab traffic linearly while the
staged window (≤ a few hundred MB) stays within the gather engine's
fast-table regime (arxiv-scale 83 MB tables gather at ~219 M edges/s).
This sweeps bucket geometry on the SAME rest matrix, on the chip.

    python benchmarks/blockcoo_sweep.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "benchmarks")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_048_576)
    ap.add_argument("--features", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--prop_steps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tiled_cluster_pipeline_bench import shuffled_community_graph

    from ssrg_tpu.ops.autotune import _many_hops
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation
    from ssrg_tpu.ops.sparse import build_blockcoo, build_hybrid, build_tiled

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    adj_n = sym_norm(shuffled_community_graph(args.nodes), 0.5)
    perm = cluster_permutation(adj_n)
    adj_p, _, _, _ = apply_permutation(adj_n, perm)
    # isolate the rest exactly as build_tiled does
    tiled = build_tiled(adj_p, dtype=jnp.bfloat16, device_scatter=True,
                        mem_budget_bytes=8 << 30, rest_engine="hybrid")
    import scipy.sparse as sp
    rest_nnz = int(round(adj_n.nnz * (1 - tiled.tiled_fraction)))
    emit(phase="setup", nodes=args.nodes, nnz=int(adj_n.nnz),
         rest_nnz=rest_nnz)

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.nodes, args.features), jnp.float32
        )
    )()
    total = args.iters * args.prop_steps

    def measure(name, eng, edge_count):
        _ = np.asarray(_many_hops(eng, x, total))
        t0 = time.perf_counter()
        _ = np.asarray(_many_hops(eng, x, total))
        dt = time.perf_counter() - t0
        emit(phase="measure", engine=name,
             ms_per_hop=round(dt / total * 1e3, 2),
             edges_per_s=round(edge_count * total / dt, 1))
        return dt / total

    # reconstruct the rest as scipy for rebuilding at each geometry
    hyb = tiled.rest
    ell, tail = hyb.ell, hyb.tail
    rows_of = np.repeat(np.arange(ell.cols.shape[0]), ell.width)
    ecols = np.asarray(ell.cols).reshape(-1)
    evals = np.asarray(ell.vals).reshape(-1)
    keep = evals != 0
    tr = np.concatenate([rows_of[keep], np.asarray(tail.row)])
    tc = np.concatenate([ecols[keep], np.asarray(tail.col)])
    tv = np.concatenate([evals[keep], np.asarray(tail.val)])
    keep2 = tv != 0
    rest_sp = sp.coo_matrix(
        (tv[keep2], (tr[keep2], tc[keep2])),
        shape=(args.nodes, args.nodes),
    ).tocsr()
    del tiled
    measure("rest:hybrid", hyb, rest_sp.nnz)
    del hyb

    best = (None, 1e9)
    for rb, cb in ((1 << 16, 1 << 16), (1 << 18, 1 << 18),
                   (1 << 19, 1 << 19), (1 << 18, 1 << 19),
                   (1 << 19, 1 << 18)):
        eng = build_blockcoo(rest_sp, row_bucket=rb, col_bucket=cb)
        t = measure(f"rest:blockcoo_{rb>>10}k x {cb>>10}k", eng, rest_sp.nnz)
        if t < best[1]:
            best = ((rb, cb), t)
        del eng
    emit(metric="blockcoo_best", buckets=list(best[0]),
         ms_per_hop=round(best[1] * 1e3, 2), rest_nnz=int(rest_sp.nnz))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
