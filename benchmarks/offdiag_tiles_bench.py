#!/usr/bin/env python
"""Per-shard tiled_fraction: table-space (off-diagonal) tiles vs
diagonal-only (VERDICT r4 weak #5 "Done" criterion).

Entirely HOST-side (numpy/scipy/native — no jax backend init, safe next to
a live TPU job): builds the nested-community products-scale graph, cluster-
aligns it (hierarchical merge), partitions at 8 shards, and reports the
tiled_fraction the mesh engine would run with. "before" re-creates the
round-4 diagonal-only behavior by masking off-diagonal edges out of the
tile pass; "after" is the shipped table-space partitioner. Reference
points: single-chip pipeline reaches 0.917 on this graph class with
merging (docs/PERFORMANCE.md); the round-4 dryrun logged 0.754 per shard.

Run: python benchmarks/offdiag_tiles_bench.py [--nodes N]
"""

from __future__ import annotations

import argparse
import json

import numpy as np
import scipy.sparse as sp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_449_408)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--comm", type=int, default=64)
    ap.add_argument("--group", type=int, default=16)
    ap.add_argument("--merge_target", type=int, default=1024)
    args = ap.parse_args()

    from ssrg_tpu.data.synthetic import nested_community_graph
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation
    from ssrg_tpu.parallel.partition import partition_rows_tiled

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    adj = sym_norm(
        nested_community_graph(args.nodes, comm=args.comm, group=args.group),
        0.5,
    )
    perm = cluster_permutation(adj, merge_target=args.merge_target)
    adj_p, _, _, _ = apply_permutation(adj, perm)
    emit(phase="setup", nodes=args.nodes, nnz=int(adj.nnz),
         shards=args.shards, merge_target=args.merge_target)

    # "before": diagonal-only tiling — mask off-diagonal edges so only
    # diagonal-block cells can reach min_edges_per_tile (the r4 behavior)
    n = adj_p.shape[0]
    block_guess = -(-n // args.shards)
    coo = adj_p.tocoo()
    diag = (coo.row // block_guess) == (coo.col // block_guess)
    adj_diag = sp.csr_matrix(
        (coo.data[diag], (coo.row[diag], coo.col[diag])), shape=adj_p.shape
    )
    part_before_d = partition_rows_tiled(adj_diag, args.shards, halo=False)
    frac_before = part_before_d.tiled_fraction * adj_diag.nnz / adj.nnz
    emit(phase="before", mode="diagonal_only",
         tiled_fraction=round(float(frac_before), 4),
         diag_edge_fraction=round(adj_diag.nnz / adj.nnz, 4))

    part_after = partition_rows_tiled(adj_p, args.shards, halo=True)
    emit(phase="after", mode="table_space",
         tiled_fraction=round(part_after.tiled_fraction, 4),
         halo_pad=int(part_after.halo_pad), block=int(part_after.block),
         halo_fraction=round(part_after.halo_fraction, 4),
         tiles_per_shard=int(part_after.starts.shape[1]))
    emit(metric="offdiag_tiled_fraction_gain",
         value=round(part_after.tiled_fraction - float(frac_before), 4),
         unit="tiled_fraction delta at 8 shards",
         single_chip_reference=0.917)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
