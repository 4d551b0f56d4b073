#!/usr/bin/env python
"""Sharded-engine overhead proof (round-3 verdict ask 1 "Done" evidence):
on a 1-shard mesh, the sharded local engines must run within ~10% of their
bare single-chip counterparts — i.e. the shard_map wrapper, the (no-op)
exchange, and the stacked layout cost ~nothing, so multi-chip scaling
starts from the FAST local engine rather than the scatter-bound
segment-sum path the round-3 distributed layer used.

Two pairs, same amortized-scan measurement protocol:
- ``--engine hybrid`` (default): bare HybridAdj vs ``dist_propagate_hybrid``
  on the headline-bench arxiv-scale random graph.
- ``--engine tiled``: bare TiledAdj vs ``dist_propagate_tiled`` on a
  cluster-aligned community graph (the tiled engine's documented input;
  both sides consume the SAME reordered adjacency).
Run on the chip (one process per engine; each pays the relay claim):
    python benchmarks/sharded_overhead_bench.py --engine both
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=169_343)
    ap.add_argument("--avg_degree", type=float, default=13.7)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--prop_steps", type=int, default=3)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--engine", choices=("hybrid", "tiled", "both"),
                    default="hybrid")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ssrg_tpu.bench import make_benchmark_graph, make_community_graph
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.sparse import build_hybrid, build_tiled
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_hybrid, dist_propagate_tiled,
        shard_adjacency_hybrid, shard_adjacency_tiled, shard_features,
    )
    from ssrg_tpu.parallel.partition import (
        RowPartition, cluster_reorder_for_partition,
        partition_rows_hybrid, partition_rows_tiled,
    )

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    # absorb the relay claim on a trivial program
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    total_hops = args.iters * args.prop_steps
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("graph",))

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops(a, h0, hops):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        return out[0, :2] + out[-1, :2]

    def timed(fn, *a):
        _ = np.asarray(fn(*a))  # compile + warm
        t0 = time.perf_counter()
        _ = np.asarray(fn(*a))
        return time.perf_counter() - t0

    def features(n):
        return jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (n, args.features), jnp.float32
            )
        )()

    def one_shard_features(x, block, n):
        # shard_features wants a RowPartition-compatible pad target
        return shard_features(
            np.asarray(x),
            RowPartition(np.zeros((1, 1), np.int32),
                         np.zeros((1, 1), np.int32),
                         np.zeros((1, 1), np.float32), block=block, n=n),
            mesh,
        )

    def report(name, dt_bare, dt_dist, nnz, **extra):
        emit(metric=f"sharded_{name}_overhead", unit=f"x vs bare {name}",
             value=round(dt_dist / dt_bare, 3),
             bare_edges_per_s=round(total_hops * nnz / dt_bare, 1),
             sharded_edges_per_s=round(total_hops * nnz / dt_dist, 1),
             nodes=args.nodes, nnz=int(nnz),
             pass_10pct=bool(dt_dist / dt_bare <= 1.10), **extra)

    if args.engine in ("hybrid", "both"):
        adj, _ = make_benchmark_graph(
            args.nodes, args.avg_degree, args.features
        )
        x = features(args.nodes)
        hybrid = build_hybrid(adj)
        dt_bare = timed(many_hops, hybrid, x, total_hops)
        emit(phase="measure", engine="bare_hybrid",
             ms_per_hop=round(dt_bare / total_hops * 1e3, 2))
        part = partition_rows_hybrid(adj, 1)
        sharded = shard_adjacency_hybrid(part, mesh)
        xs = one_shard_features(x, part.block, part.n)

        @partial(jax.jit, static_argnames=("hops",))
        def many_hops_h(a, h0, hops):
            def hop(h, _):
                return dist_propagate_hybrid(a, h, 1)[1], None

            out, _ = jax.lax.scan(hop, h0, None, length=hops)
            return out[0, :2] + out[-1, :2]

        dt_dist = timed(many_hops_h, sharded, xs, total_hops)
        emit(phase="measure", engine="sharded_hybrid_1shard",
             ms_per_hop=round(dt_dist / total_hops * 1e3, 2))
        report("hybrid", dt_bare, dt_dist, adj.nnz)
        del adj, x, hybrid, sharded, xs

    if args.engine in ("tiled", "both"):
        raw = sym_norm(make_community_graph(args.nodes), 0.5)
        adj, _, _, _ = cluster_reorder_for_partition(raw)
        del raw
        x = features(args.nodes)
        tiled = build_tiled(adj, dtype=jnp.bfloat16, device_scatter=True,
                            mem_budget_bytes=8 << 30)
        jax.tree_util.tree_leaves(tiled)[0].block_until_ready()
        dt_bare = timed(many_hops, tiled, x, total_hops)
        emit(phase="measure", engine="bare_tiled",
             ms_per_hop=round(dt_bare / total_hops * 1e3, 2),
             tiled_fraction=round(tiled.tiled_fraction, 4))
        del tiled
        part = partition_rows_tiled(adj, 1, halo=False)
        sharded = shard_adjacency_tiled(part, mesh, dtype=jnp.bfloat16)
        xs = one_shard_features(x, part.block, part.n)

        @partial(jax.jit, static_argnames=("hops",))
        def many_hops_t(a, h0, hops):
            def hop(h, _):
                return dist_propagate_tiled(a, h, 1)[1], None

            out, _ = jax.lax.scan(hop, h0, None, length=hops)
            return out[0, :2] + out[-1, :2]

        dt_dist = timed(many_hops_t, sharded, xs, total_hops)
        emit(phase="measure", engine="sharded_tiled_1shard",
             ms_per_hop=round(dt_dist / total_hops * 1e3, 2),
             tiled_fraction=round(part.tiled_fraction, 4))
        report("tiled", dt_bare, dt_dist, adj.nnz,
               tiled_fraction=round(part.tiled_fraction, 4))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
