#!/usr/bin/env python
"""Analytic per-hop comm bytes: all-gather vs ring vs halo-only exchange
(round-3 verdict ask 2 "Done" evidence for docs/SCALING.md).

Builds the pipeline-bench community graph (raw SHUFFLED ids), plans the
static halo exchange (``partition_rows_hybrid(halo=True)``) on BOTH the raw
layout and the cluster-aligned layout (``cluster_reorder_for_partition``),
and prints the analytic bytes/device/hop of the three exchange modes —
the same formulas as ``dist_spmm.comm_stats`` (this script is deliberately
host-side-only — the lazy package inits keep the jax backend UNinitialized
(no device/relay claim; this container's sitecustomize preloads the jax
module itself in every process), asserted by tests/test_aux.py — so it can
run next to a live TPU job):

- all_gather: (D-1) * block * F * 4
- ring:       D * block * F * 4
- halo:       (D-1) * halo_pad * F * 4

Run: python benchmarks/halo_plan_bench.py [--nodes N] [--shards D]
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_048_576)
    ap.add_argument("--features", type=int, default=100)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--comm", type=int, default=512)
    ap.add_argument("--generator", choices=("flat", "nested"), default="flat")
    ap.add_argument("--group", type=int, default=16)
    ap.add_argument("--merge_target", type=int, default=0,
                    help="hierarchical merge before cluster alignment")
    args = ap.parse_args()

    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent))
    from tiled_cluster_pipeline_bench import (
        nested_community_graph, shuffled_community_graph,
    )

    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.parallel.partition import (
        cluster_reorder_for_partition, partition_rows_hybrid,
    )

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    d, f = args.shards, args.features
    t0 = time.perf_counter()
    if args.generator == "nested":
        raw = nested_community_graph(args.nodes, comm=args.comm,
                                     group=args.group)
    else:
        raw = shuffled_community_graph(args.nodes, comm=args.comm)
    adj = sym_norm(raw, 0.5)
    emit(phase="generate", nodes=args.nodes, nnz=int(adj.nnz),
         generator=args.generator, seconds=round(time.perf_counter() - t0, 1))

    rows = {}
    for layout in ("raw", "cluster-aligned"):
        t0 = time.perf_counter()
        a = adj
        if layout == "cluster-aligned":
            a, _, _, _ = cluster_reorder_for_partition(
                adj, merge_target=args.merge_target
            )
        part = partition_rows_hybrid(a, d, halo=True)
        block = part.block
        bytes_ag = (d - 1) * block * f * 4
        bytes_ring = d * block * f * 4
        bytes_halo = (d - 1) * part.halo_pad * f * 4
        rows[layout] = dict(
            halo_pad=part.halo_pad, halo_fraction=round(part.halo_fraction, 4),
            block=block,
            all_gather_mb=round(bytes_ag / 2**20, 1),
            ring_mb=round(bytes_ring / 2**20, 1),
            halo_mb=round(bytes_halo / 2**20, 1),
            reduction_vs_all_gather=round(bytes_ag / max(bytes_halo, 1), 2),
            seconds=round(time.perf_counter() - t0, 1),
        )
        emit(phase="plan", layout=layout, **rows[layout])

    emit(metric="halo_comm_reduction",
         value=rows["cluster-aligned"]["reduction_vs_all_gather"],
         unit="x fewer bytes/hop vs all-gather", shards=d,
         features=f, nodes=args.nodes)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
