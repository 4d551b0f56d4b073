#!/usr/bin/env python
"""Raw-edge-list → cluster-reorder → tiled engine, measured END TO END on
the chip (round-2 verdict ask 1).

Unlike benchmarks/tiled_products_bench.py (which timed the tiled engine on a
MODELED clustered layout generated on device), this script runs the real
pipeline on a graph it receives as a raw SHUFFLED edge list:

1. generate a products-density community graph with shuffled node ids
   (nothing about the input layout is clustered);
2. sym-normalize (host, native);
3. ``cluster_permutation`` — native label-propagation communities + renumber;
4. ``build_tiled(device_scatter=True, bf16)`` — compact per-edge tuples
   shipped, dense tiles materialized on device (the padded blocks would be
   ~T×1 GiB and take many minutes through the ~3-4 MB/s relay);
5. measure tiled vs hybrid hops/s with the amortized scan protocol
   (one jitted scan, tiny fetched output — per-dispatch RTT ~60 ms and
   ``block_until_ready`` does not synchronize through the relay);
6. run the real autotuner (``autotune_engine``) on a quarter-scale slice of
   the same construction and report its pick.

Prints one JSON line per phase plus a final summary table.
Run on the chip (ONE process at a time through the relay):
    python benchmarks/tiled_cluster_pipeline_bench.py [--nodes N]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np
import scipy.sparse as sp


def shuffled_community_graph(n, comm=512, intra_deg=10, inter_deg=2, seed=0):
    """Products-density community graph with SHUFFLED node ids — the raw
    input whose clustered structure the pipeline must discover itself."""
    rng = np.random.default_rng(seed)
    base = (np.arange(n, dtype=np.int64) // comm) * comm
    r_in = np.repeat(np.arange(n, dtype=np.int64), intra_deg)
    c_in = base[r_in] + rng.integers(0, comm, r_in.shape)
    r_out = np.repeat(np.arange(n, dtype=np.int64), inter_deg)
    c_out = rng.integers(0, n, r_out.shape)
    r = np.concatenate([r_in, r_out])
    c = np.concatenate([c_in, c_out])
    keep = r != c
    shuf = rng.permutation(n)
    adj = sp.coo_matrix(
        (np.ones(keep.sum(), np.float32), (shuf[r[keep]], shuf[c[keep]])),
        shape=(n, n),
    )
    adj = (adj + adj.T).tocsr()
    adj.data[:] = 1.0
    return adj


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_048_576)
    ap.add_argument("--features", type=int, default=100)
    ap.add_argument("--prop_steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--comm", type=int, default=512)
    ap.add_argument("--skip_autotune", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssrg_tpu.ops.autotune import _many_hops, autotune_engine
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation
    from ssrg_tpu.ops.sparse import build_hybrid, build_tiled

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    # absorb the relay's per-process first-execution stall on a tiny program
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    t0 = time.perf_counter()
    adj = shuffled_community_graph(args.nodes, comm=args.comm)
    adj_n = sym_norm(adj, 0.5)
    emit(phase="generate+normalize", seconds=round(time.perf_counter() - t0, 2),
         nodes=args.nodes, nnz=int(adj_n.nnz))

    t0 = time.perf_counter()
    perm = cluster_permutation(adj_n)
    adj_p, _, _, _ = apply_permutation(adj_n, perm)
    from ssrg_tpu.native import lpa_cluster
    labels = lpa_cluster(adj_n.indptr, adj_n.indices)
    _, counts = np.unique(labels, return_counts=True)
    emit(phase="cluster_reorder", seconds=round(time.perf_counter() - t0, 2),
         clusters=int(counts.size), largest=int(counts.max()),
         median=int(np.median(counts)))

    t0 = time.perf_counter()
    tiled = build_tiled(adj_p, dtype=jnp.bfloat16, device_scatter=True,
                        mem_budget_bytes=8 << 30)
    jax.tree_util.tree_leaves(tiled)[0].block_until_ready()
    nb, p_num, tile_elems = tiled.tile_stats
    emit(phase="build_tiled", seconds=round(time.perf_counter() - t0, 2),
         tiled_fraction=round(tiled.tiled_fraction, 4), nb=nb,
         num_tiles=p_num,
         tiles_gib=round(p_num * tile_elems * 2 / 2**30, 2))

    t0 = time.perf_counter()
    hybrid = build_hybrid(adj_n)  # RAW layout — what a user has without us
    jax.tree_util.tree_leaves(hybrid)[0].block_until_ready()
    emit(phase="build_hybrid", seconds=round(time.perf_counter() - t0, 2),
         ell_width=hybrid.ell.width)

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.nodes, args.features), jnp.float32
        )
    )()
    total_hops = args.iters * args.prop_steps
    results = {}
    for name, eng in (("tiled(cluster-reordered)", tiled),
                      ("hybrid(raw)", hybrid)):
        _ = np.asarray(_many_hops(eng, x, total_hops))  # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(_many_hops(eng, x, total_hops))
        dt = time.perf_counter() - t0
        eps = total_hops * adj_n.nnz / dt
        results[name] = eps
        emit(phase="measure", engine=name, ms_per_hop=round(dt / total_hops * 1e3, 2),
             edges_per_s=round(eps, 1))

    speedup = results["tiled(cluster-reordered)"] / results["hybrid(raw)"]
    emit(metric="tiled_cluster_pipeline_speedup", value=round(speedup, 2),
         unit="x vs raw hybrid", nodes=args.nodes, nnz=int(adj_n.nnz),
         tiled_edges_per_s=round(results["tiled(cluster-reordered)"], 1),
         tiled_fraction=round(tiled.tiled_fraction, 4))

    if not args.skip_autotune:
        # the autotuner's own pick on a quarter-scale slice of the same
        # construction (full scale would re-pay every build/transfer)
        small = shuffled_community_graph(args.nodes // 4, comm=args.comm,
                                         seed=1)
        small = sym_norm(small, 0.5)
        t0 = time.perf_counter()
        best, timings = autotune_engine(
            small, args.features,
            candidates=("hybrid", "reorder_tiled", "reorder_banded"),
            reps=args.prop_steps,
        )
        emit(phase="autotune", seconds=round(time.perf_counter() - t0, 2),
             nodes=small.shape[0], best=best,
             timings_ms={k: round(v * 1e3, 2) for k, v in timings.items()})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
