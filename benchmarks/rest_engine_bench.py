#!/usr/bin/env python
"""Scattered-rest engines head-to-head at N≥1M (round-2 verdict ask 2).

The tiled engine's hop time at scale is dominated by its scattered REST
(inter-community edges) going through the large-table gather
(docs/PERFORMANCE.md: 75% of the products-scale hop). This measures, on the
same cluster-reordered graph:

  1. tiled + hybrid rest      (round-3 pipeline configuration)
  2. tiled + blockcoo rest    (2-D bucketed windows for the rest)
  3. blockcoo on the RAW graph (locality remedy with NO reorder at all)
  4. the rest alone under both engines (isolates the scattered cost)

Run on the chip: python benchmarks/rest_engine_bench.py [--nodes N]
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
    from ssrg_tpu.ops.sparse import build_blockcoo, build_tiled

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    adj_n = sym_norm(shuffled_community_graph(args.nodes), 0.5)
    perm = cluster_permutation(adj_n)
    adj_p, _, _, _ = apply_permutation(adj_n, perm)
    nnz = int(adj_n.nnz)
    emit(phase="setup", nodes=args.nodes, nnz=nnz)

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

    kw = dict(dtype=jnp.bfloat16, device_scatter=True,
              mem_budget_bytes=8 << 30)
    tiled_h = build_tiled(adj_p, rest_engine="hybrid", **kw)
    t_h = measure("tiled+hybrid_rest", tiled_h, nnz)
    rest_h = tiled_h.rest
    rest_nnz = int(round(nnz * (1 - tiled_h.tiled_fraction)))
    measure("rest_alone:hybrid", rest_h, rest_nnz)
    del tiled_h, rest_h

    tiled_b = build_tiled(adj_p, rest_engine="blockcoo", **kw)
    t_b = measure("tiled+blockcoo_rest", tiled_b, nnz)
    measure("rest_alone:blockcoo", tiled_b.rest, rest_nnz)
    frac = tiled_b.tiled_fraction
    del tiled_b

    raw_bcoo = build_blockcoo(adj_n)
    measure("blockcoo_raw_graph", raw_bcoo, nnz)

    emit(metric="rest_engine_speedup", value=round(t_h / t_b, 3),
         unit="x tiled hop (blockcoo rest vs hybrid rest)",
         tiled_fraction=round(frac, 4), nnz=nnz)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
