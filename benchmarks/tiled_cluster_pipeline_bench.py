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


# canonical generators live in ssrg_tpu.data.synthetic (single copy shared
# with the scoreboard in ssrg_tpu.bench and the reorder tests); importing
# data.synthetic does not initialize a jax backend (tests/test_aux.py).
from ssrg_tpu.data.synthetic import (  # noqa: E402
    community_graph as shuffled_community_graph,
    nested_community_graph,
)


def host_tiled_fraction(csr, row_block=256, tile_cols=512,
                        min_edges_per_tile=48):
    """``build_tiled``'s dense-tile fraction computed host-side in numpy
    (no jax/device work) — for fraction-only ablations that must not claim
    the TPU relay."""
    n, m = csr.shape
    rows_of = np.repeat(np.arange(n), np.diff(csr.indptr))
    num_segs = -(-m // tile_cols)
    pair_key = (rows_of // row_block).astype(np.int64) * num_segs \
        + csr.indices // tile_cols
    uniq, counts = np.unique(pair_key, return_counts=True)
    dense = counts >= min_edges_per_tile
    return counts[dense].sum() / max(csr.nnz, 1), int(dense.sum())


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_048_576)
    ap.add_argument("--features", type=int, default=100)
    ap.add_argument("--prop_steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--comm", type=int, default=512)
    ap.add_argument("--skip_autotune", action="store_true")
    ap.add_argument("--skip_hybrid", action="store_true",
                    help="skip the raw-hybrid baseline timing")
    ap.add_argument("--generator", choices=("flat", "nested"), default="flat")
    ap.add_argument("--group", type=int, default=4,
                    help="communities per super-community (nested)")
    ap.add_argument("--sib_deg", type=int, default=2)
    ap.add_argument("--uni_deg", type=int, default=1)
    ap.add_argument("--merge_target", type=int, nargs="+", default=[0],
                    help="hierarchical HEM merge budget(s) (0 = flat LPA); "
                         "several values sweep in ONE process (one relay "
                         "claim)")
    ap.add_argument("--rest_engine", default="auto",
                    choices=("auto", "hybrid", "blockcoo", "onehot"))
    ap.add_argument("--rest_gather_bf16", action="store_true",
                    help="onehot rest: gather the slab in bf16 (halves its "
                         "HBM footprint; measured speed-neutral)")
    ap.add_argument("--fraction_only", action="store_true",
                    help="host-side tiled_fraction ablation (numpy only — "
                         "jax backend never initialized, so the TPU relay "
                         "is never claimed)")
    args = ap.parse_args()

    if args.fraction_only:
        from ssrg_tpu.ops.normalize import sym_norm
        from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation

        t0 = time.perf_counter()
        if args.generator == "nested":
            adj = nested_community_graph(
                args.nodes, comm=args.comm, group=args.group,
                sib_deg=args.sib_deg, uni_deg=args.uni_deg,
            )
        else:
            adj = shuffled_community_graph(args.nodes, comm=args.comm)
        adj_n = sym_norm(adj, 0.5)
        for mt in args.merge_target:
            t1 = time.perf_counter()
            perm = cluster_permutation(adj_n, merge_target=mt)
            adj_p, _, _, _ = apply_permutation(adj_n, perm)
            frac, tiles = host_tiled_fraction(adj_p)
            print(json.dumps(dict(
                phase="fraction_only", generator=args.generator,
                nodes=args.nodes, nnz=int(adj_n.nnz), group=args.group,
                merge_target=mt, tiled_fraction=round(frac, 4),
                num_tiles=tiles, seconds=round(time.perf_counter() - t1, 1),
            )), flush=True)
        return 0

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
    if args.generator == "nested":
        adj = nested_community_graph(
            args.nodes, comm=args.comm, group=args.group,
            sib_deg=args.sib_deg, uni_deg=args.uni_deg,
        )
    else:
        adj = shuffled_community_graph(args.nodes, comm=args.comm)
    adj_n = sym_norm(adj, 0.5)
    emit(phase="generate+normalize", seconds=round(time.perf_counter() - t0, 2),
         nodes=args.nodes, nnz=int(adj_n.nnz), generator=args.generator)

    from ssrg_tpu.native import lpa_cluster
    labels = lpa_cluster(adj_n.indptr, adj_n.indices)
    _, counts = np.unique(labels, return_counts=True)
    emit(phase="lpa", clusters=int(counts.size), largest=int(counts.max()),
         median=int(np.median(counts)))

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.nodes, args.features), jnp.float32
        )
    )()
    total_hops = args.iters * args.prop_steps

    def measure(name, eng, **extra):
        _ = np.asarray(_many_hops(eng, x, total_hops))  # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(_many_hops(eng, x, total_hops))
        dt = time.perf_counter() - t0
        eps = total_hops * adj_n.nnz / dt
        emit(phase="measure", engine=name,
             ms_per_hop=round(dt / total_hops * 1e3, 2),
             edges_per_s=round(eps, 1), **extra)
        return eps

    tiled_results = {}
    for mt in args.merge_target:
        t0 = time.perf_counter()
        perm = cluster_permutation(adj_n, merge_target=mt)
        adj_p, _, _, _ = apply_permutation(adj_n, perm)
        emit(phase="cluster_reorder", merge_target=mt,
             seconds=round(time.perf_counter() - t0, 2))

        t0 = time.perf_counter()
        tiled = build_tiled(adj_p, dtype=jnp.bfloat16, device_scatter=True,
                            mem_budget_bytes=8 << 30,
                            rest_engine=args.rest_engine)
        if args.rest_gather_bf16 and type(tiled.rest).__name__ == "RestSegmentedAdj":
            tiled.rest.gather_bf16 = True
        jax.tree_util.tree_leaves(tiled)[0].block_until_ready()
        nb, p_num, tile_elems = tiled.tile_stats
        emit(phase="build_tiled", merge_target=mt,
             seconds=round(time.perf_counter() - t0, 2),
             tiled_fraction=round(tiled.tiled_fraction, 4), nb=nb,
             num_tiles=p_num,
             tiles_gib=round(p_num * tile_elems * 2 / 2**30, 2))
        eps = measure(f"tiled(merge_target={mt})", tiled, merge_target=mt)
        tiled_results[mt] = (eps, tiled.tiled_fraction)
        del tiled, adj_p  # free HBM before the next pack

    hybrid_eps = None
    if not args.skip_hybrid:
        t0 = time.perf_counter()
        hybrid = build_hybrid(adj_n)  # RAW layout — what a user has without us
        jax.tree_util.tree_leaves(hybrid)[0].block_until_ready()
        emit(phase="build_hybrid", seconds=round(time.perf_counter() - t0, 2),
             ell_width=hybrid.ell.width)
        hybrid_eps = measure("hybrid(raw)", hybrid)
        del hybrid

    best_mt = max(tiled_results, key=lambda m: tiled_results[m][0])
    summary = dict(
        metric="tiled_cluster_pipeline_speedup",
        unit="x vs raw hybrid", nodes=args.nodes, nnz=int(adj_n.nnz),
        generator=args.generator, merge_target=best_mt,
        tiled_edges_per_s=round(tiled_results[best_mt][0], 1),
        tiled_fraction=round(tiled_results[best_mt][1], 4),
    )
    if hybrid_eps is not None:
        summary["value"] = round(tiled_results[best_mt][0] / hybrid_eps, 2)
    emit(**summary)

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
