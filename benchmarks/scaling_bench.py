#!/usr/bin/env python
"""Multi-shard scaling benchmark for distributed K-hop propagation.

Measures edges/s of ``dist_propagate`` (all-gather) and
``dist_propagate_ring`` (ppermute ring) at 1/2/4/8 shards and reports
scaling efficiency vs 1 shard. On real multi-chip hardware this measures ICI
scaling (BASELINE.md: >=80% at 2 hosts); on a single host it runs on the
virtual CPU mesh and validates the protocol + partitioner overheads (virtual
devices share one socket, so efficiency numbers are NOT hardware-meaningful
there — the harness prints which mode it ran).

Usage: python benchmarks/scaling_bench.py [--nodes 100000] [--degree 14]
       [--features 128] [--hops 3] [--cpu]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=100_000)
    ap.add_argument("--degree", type=float, default=14.0)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--hops", type=int, default=3)
    ap.add_argument("--cpu", action="store_true",
                    help="force the 8-device virtual CPU mesh")
    ap.add_argument("--variant", choices=["allgather", "ring", "both"],
                    default="both")
    args = ap.parse_args()

    import jax

    if args.cpu or jax.device_count() < 2:
        try:
            import jax.extend.backend as jeb

            jeb.clear_backends()
        except Exception:
            pass
        jax.config.update("jax_num_cpu_devices", 8)
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    mode = f"{devices[0].platform}x{len(devices)}"

    import numpy as np

    from ssrg_tpu.bench import make_benchmark_graph
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.partition import partition_rows
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate,
        dist_propagate_ring,
        partition_rows_ring,
        shard_adjacency,
        shard_adjacency_ring,
        shard_features,
    )

    adj, x = make_benchmark_graph(args.nodes, args.degree, args.features)
    shard_counts = [s for s in (1, 2, 4, 8) if s <= len(devices)]
    results = {}

    def timed(fn, reps=3):
        out = fn()
        _ = np.asarray(out[0, :2, :2])  # force execution
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
            _ = np.asarray(out[0, :2, :2])
        return (time.perf_counter() - t0) / reps

    for variant in (["allgather", "ring"] if args.variant == "both"
                    else [args.variant]):
        per_shard = {}
        for s in shard_counts:
            mesh = make_mesh((s,), ("graph",), devices[:s])
            if variant == "allgather":
                part = partition_rows(adj, s)
                a = shard_adjacency(part, mesh)
                xs = shard_features(x, part, mesh)
                fn = lambda: dist_propagate(a, xs, args.hops)  # noqa: E731
            else:
                part = partition_rows_ring(adj, s)
                a = shard_adjacency_ring(part, mesh)
                xs = shard_features(x, part, mesh)
                fn = lambda: dist_propagate_ring(a, xs, args.hops)  # noqa: E731
            dt = timed(fn)
            eps = args.hops * adj.nnz / dt
            per_shard[s] = eps
        base = per_shard[shard_counts[0]]
        results[variant] = {
            str(s): {
                "edges_per_s": round(eps, 1),
                "efficiency": round(eps / (base * s / shard_counts[0]), 3),
            }
            for s, eps in per_shard.items()
        }

    print(json.dumps({
        "metric": "dist_khop_scaling",
        "mode": mode,
        "nnz": int(adj.nnz),
        "hops": args.hops,
        "results": results,
    }))


if __name__ == "__main__":
    main()
