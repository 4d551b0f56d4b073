#!/usr/bin/env python
"""Sharded-hybrid overhead proof (round-3 verdict ask 1 "Done" evidence):
on a 1-shard mesh, ``dist_propagate_hybrid`` must run within ~10% of the
bare single-chip hybrid engine — i.e. the shard_map wrapper, the (no-op)
exchange, and the stacked layout cost ~nothing, so multi-chip scaling
starts from the FAST local engine rather than the scatter-bound
segment-sum path the round-3 distributed layer used.

Both engines run on the SAME graph (headline-bench arxiv-scale random
graph), same amortized-scan measurement protocol. Run on the chip:
    python benchmarks/sharded_overhead_bench.py
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
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from ssrg_tpu.bench import make_benchmark_graph
    from ssrg_tpu.ops.sparse import build_hybrid
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_hybrid, shard_adjacency_hybrid, shard_features,
    )
    from ssrg_tpu.parallel.partition import (
        RowPartition, partition_rows_hybrid,
    )

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    # absorb the relay claim on a trivial program
    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    adj, _ = make_benchmark_graph(args.nodes, args.avg_degree, args.features)
    total_hops = args.iters * args.prop_steps
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.nodes, args.features), jnp.float32
        )
    )()

    # --- bare single-chip hybrid --------------------------------------------
    hybrid = build_hybrid(adj)

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops(a, h0, hops):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        return out[0, :2] + out[-1, :2]

    _ = np.asarray(many_hops(hybrid, x, total_hops))
    t0 = time.perf_counter()
    _ = np.asarray(many_hops(hybrid, x, total_hops))
    dt_bare = time.perf_counter() - t0
    emit(phase="measure", engine="bare_hybrid",
         ms_per_hop=round(dt_bare / total_hops * 1e3, 2),
         edges_per_s=round(total_hops * adj.nnz / dt_bare, 1))

    # --- same layout under a 1-shard mesh -----------------------------------
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("graph",))
    part = partition_rows_hybrid(adj, 1)
    sharded = shard_adjacency_hybrid(part, mesh)
    # shard_features wants a RowPartition-compatible pad target
    xs = shard_features(
        np.asarray(x),
        RowPartition(np.zeros((1, 1), np.int32), np.zeros((1, 1), np.int32),
                     np.zeros((1, 1), np.float32), block=part.block, n=part.n),
        mesh,
    )

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops_dist(a, h0, hops):
        def hop(h, _):
            return dist_propagate_hybrid(a, h, 1)[1], None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        return out[0, :2] + out[-1, :2]

    _ = np.asarray(many_hops_dist(sharded, xs, total_hops))
    t0 = time.perf_counter()
    _ = np.asarray(many_hops_dist(sharded, xs, total_hops))
    dt_dist = time.perf_counter() - t0
    emit(phase="measure", engine="sharded_hybrid_1shard",
         ms_per_hop=round(dt_dist / total_hops * 1e3, 2),
         edges_per_s=round(total_hops * adj.nnz / dt_dist, 1))

    emit(metric="sharded_hybrid_overhead", unit="x vs bare hybrid",
         value=round(dt_dist / dt_bare, 3),
         nodes=args.nodes, nnz=int(adj.nnz),
         pass_10pct=bool(dt_dist / dt_bare <= 1.10))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
