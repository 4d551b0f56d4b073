"""Distributed SpMM + K-hop propagation over a device mesh.

The TPU-native scaling layer the single-device reference lacks (SURVEY.md
§2.14): the normalized adjacency is 1-D row-partitioned across the ``graph``
mesh axis (``partition.py``); node features live as matching row blocks. Each
hop runs inside ``shard_map``:

    X_full   = all_gather(X_block, "graph")        # ICI collective
    Y_block  = segment_sum(w * X_full[cols], rows) # local gather-SpMM

XLA overlaps the all-gather with the previous hop's compute where possible;
the gather-SpMM is chunked over nnz so peak VMEM/HBM stays bounded. An
alternative ppermute-ring variant (never materializing full X) is the
planned path for graphs whose feature matrix exceeds per-device HBM
(papers100M scale); the all-gather variant is optimal while X fits, since it
moves each feature row exactly once per hop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from ssrg_tpu.parallel.partition import RowPartition, pad_features


@jax.tree_util.register_pytree_node_class
@dataclass
class ShardedAdj:
    """Device-resident row-partitioned adjacency bound to a mesh axis.

    Registered as a pytree so it can be passed as a jit argument (never
    closure-captured: captured device arrays become HLO constants)."""

    rows: jax.Array   # int32 [D, nnz_pad] (sharded over axis 0)
    cols: jax.Array   # int32 [D, nnz_pad]
    vals: jax.Array   # f32   [D, nnz_pad]
    mesh: Mesh
    axis: str
    block: int
    n: int

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), (
            self.mesh, self.axis, self.block, self.n,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)

    @property
    def num_shards(self) -> int:
        return self.rows.shape[0]

    @property
    def n_pad(self) -> int:
        return self.block * self.num_shards


def shard_adjacency(
    part: RowPartition, mesh: Mesh, axis: str = "graph"
) -> ShardedAdj:
    """Place the partitioned blocks so shard d lives on mesh position d."""
    spec = NamedSharding(mesh, P(axis, None))
    return ShardedAdj(
        rows=jax.device_put(part.rows, spec),
        cols=jax.device_put(part.cols, spec),
        vals=jax.device_put(part.vals, spec),
        mesh=mesh,
        axis=axis,
        block=part.block,
        n=part.n,
    )


def shard_features(
    x: np.ndarray, part: RowPartition, mesh: Mesh, axis: str = "graph"
) -> jax.Array:
    """Pad features to the partition and shard rows over the mesh axis."""
    x_pad = pad_features(np.asarray(x, np.float32), part)
    return jax.device_put(x_pad, NamedSharding(mesh, P(axis, None)))


def _local_spmm(rows, cols, vals, x_full, block: int, chunk: int,
                axis: Optional[str] = None):
    """Gather-SpMM of this shard's edges against the gathered feature matrix,
    chunked over nnz."""
    nnz = rows.shape[0]
    f = x_full.shape[1]
    if chunk >= nnz:
        gathered = jnp.take(x_full, cols, axis=0) * vals[:, None]
        return jax.ops.segment_sum(gathered, rows, num_segments=block)
    num_chunks = -(-nnz // chunk)
    pad = num_chunks * chunk - nnz
    if pad:  # static pad so the scan reshape is exact (val 0 => no effect)
        rows = jnp.pad(rows, (0, pad))
        cols = jnp.pad(cols, (0, pad))
        vals = jnp.pad(vals, (0, pad))

    def step(acc, inputs):
        r, c, v = inputs
        gathered = jnp.take(x_full, c, axis=0) * v[:, None]
        return acc + jax.ops.segment_sum(gathered, r, num_segments=block), None

    acc0 = jnp.zeros((block, f), jnp.float32)
    if axis is not None:
        # mark the zero accumulator as device-varying over the mesh axis so the
        # scan carry type matches inside shard_map
        acc0 = jax.lax.pcast(acc0, (axis,), to="varying")
    out, _ = jax.lax.scan(
        step,
        acc0,
        (
            rows.reshape(num_chunks, chunk),
            cols.reshape(num_chunks, chunk),
            vals.reshape(num_chunks, chunk),
        ),
    )
    return out


def dist_propagate(
    adj: ShardedAdj,
    x_sharded: jax.Array,
    prop_steps: int,
    chunk: int = 1 << 19,
) -> jax.Array:
    """K-hop propagation over the mesh: returns ``[K+1, n_pad, F]`` with the
    node axis sharded over ``adj.axis``. Equivalent (up to f32 roundoff) to
    single-device ``ops.propagate`` on the unpartitioned adjacency."""
    axis = adj.axis
    block = adj.block

    @partial(
        shard_map,
        mesh=adj.mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis, None)),
        out_specs=P(None, axis, None),
    )
    def run(rows, cols, vals, x_block):
        r, c, v = rows[0], cols[0], vals[0]

        def step(h_block, _):
            x_full = jax.lax.all_gather(h_block, axis, tiled=True)
            h_next = _local_spmm(r, c, v, x_full, block, chunk, axis=axis)
            return h_next, h_next

        _, hops = jax.lax.scan(step, x_block, None, length=prop_steps)
        return jnp.concatenate([x_block[None], hops], axis=0)

    return run(adj.rows, adj.cols, adj.vals, x_sharded)


def dist_propagate_ring(
    adj: "ShardedAdjRing",
    x_sharded: jax.Array,
    prop_steps: int,
) -> jax.Array:
    """K-hop propagation with a ppermute ring instead of all-gather.

    Memory-bounded variant for graphs whose full feature matrix does not fit
    per-device HBM (papers100M scale): each device only ever holds TWO row
    blocks of X (its own + the block in flight). Per hop, the feature blocks
    rotate D-1 times around the ring; at step s each device multiplies the
    edge bucket whose columns fall in the visiting block. Requires the
    column-bucketed partition from :func:`partition_rows_ring`.

    Communication volume per hop equals the all-gather variant (each block
    visits each device once) but peak memory is O(2·block·F) instead of
    O(n·F), and each ppermute overlaps with the local bucket SpMM.
    """
    axis = adj.axis
    block = adj.block
    num_shards = adj.num_shards

    @partial(
        shard_map,
        mesh=adj.mesh,
        in_specs=(
            P(axis, None, None), P(axis, None, None), P(axis, None, None),
            P(axis, None),
        ),
        out_specs=P(None, axis, None),
    )
    def run(rows_b, cols_b, vals_b, x_block):
        rows_b, cols_b, vals_b = rows_b[0], cols_b[0], vals_b[0]
        my = jax.lax.axis_index(axis)
        perm = [(i, (i + 1) % num_shards) for i in range(num_shards)]

        def hop(h_block):
            # bucket owned by (my - s) mod D arrives at ring step s
            def ring_step(s, carry):
                acc, visiting = carry
                src = jax.lax.rem(my - s + num_shards, num_shards)
                bucket = jax.lax.dynamic_index_in_dim(
                    rows_b, src, axis=0, keepdims=False
                ), jax.lax.dynamic_index_in_dim(
                    cols_b, src, axis=0, keepdims=False
                ), jax.lax.dynamic_index_in_dim(
                    vals_b, src, axis=0, keepdims=False
                )
                r, c, v = bucket
                gathered = jnp.take(visiting, c, axis=0) * v[:, None]
                acc = acc + jax.ops.segment_sum(gathered, r, num_segments=block)
                visiting = jax.lax.ppermute(visiting, axis, perm)
                return acc, visiting

            acc0 = jax.lax.pcast(
                jnp.zeros((block, h_block.shape[1]), jnp.float32), (axis,),
                to="varying",
            )
            acc, _ = jax.lax.fori_loop(
                0, num_shards, ring_step, (acc0, h_block)
            )
            return acc

        def step(h_block, _):
            h_next = hop(h_block)
            return h_next, h_next

        _, hops = jax.lax.scan(step, x_block, None, length=prop_steps)
        return jnp.concatenate([x_block[None], hops], axis=0)

    return run(adj.rows, adj.cols, adj.vals, x_sharded)


@dataclass
class ShardedAdjRing:
    """Ring-partitioned adjacency: per shard, edges bucketed by column block.

    - rows/cols/vals: [D, D, bucket_pad] — entry [d, j] holds shard d's edges
      whose column lies in block j, with LOCAL row and LOCAL column indices.
    """

    rows: jax.Array
    cols: jax.Array
    vals: jax.Array
    mesh: Mesh
    axis: str
    block: int
    n: int

    @property
    def num_shards(self) -> int:
        return self.rows.shape[0]

    @property
    def n_pad(self) -> int:
        return self.block * self.num_shards


def partition_rows_ring(
    adj, num_shards: int, row_align: int = 8
) -> "RingPartitionArrays":
    """Host-side column-bucketed row partition for the ring variant."""
    import scipy.sparse as sp

    csr = adj.tocsr()
    n = csr.shape[0]
    block = ((-(-n // num_shards)) + row_align - 1) // row_align * row_align
    n_pad = block * num_shards

    buckets = [[None] * num_shards for _ in range(num_shards)]
    max_bucket = 1
    for d in range(num_shards):
        lo, hi = d * block, min((d + 1) * block, n)
        sub = csr[lo:hi].tocoo() if lo < n else sp.coo_matrix((0, n))
        col_block = sub.col // block
        for j in range(num_shards):
            m = col_block == j
            buckets[d][j] = (
                sub.row[m].astype(np.int32),
                (sub.col[m] - j * block).astype(np.int32),
                sub.data[m].astype(np.float32),
            )
            max_bucket = max(max_bucket, int(m.sum()))
    pad = ((max_bucket + 511) // 512) * 512
    rows = np.zeros((num_shards, num_shards, pad), np.int32)
    cols = np.zeros((num_shards, num_shards, pad), np.int32)
    vals = np.zeros((num_shards, num_shards, pad), np.float32)
    for d in range(num_shards):
        for j in range(num_shards):
            r, c, v = buckets[d][j]
            rows[d, j, : r.size] = r
            cols[d, j, : r.size] = c
            vals[d, j, : r.size] = v
    return RingPartitionArrays(rows, cols, vals, block, n)


@dataclass
class RingPartitionArrays:
    rows: np.ndarray
    cols: np.ndarray
    vals: np.ndarray
    block: int
    n: int

    @property
    def num_shards(self) -> int:
        return self.rows.shape[0]

    @property
    def n_pad(self) -> int:
        return self.block * self.num_shards


def shard_adjacency_ring(
    part: RingPartitionArrays, mesh: Mesh, axis: str = "graph"
) -> ShardedAdjRing:
    spec = NamedSharding(mesh, P(axis, None, None))
    return ShardedAdjRing(
        rows=jax.device_put(part.rows, spec),
        cols=jax.device_put(part.cols, spec),
        vals=jax.device_put(part.vals, spec),
        mesh=mesh, axis=axis, block=part.block, n=part.n,
    )


def comm_stats(
    num_shards: int,
    block: int,
    feature_dim: int,
    prop_steps: int,
    mode: str = "all_gather",
    itemsize: int = 4,
) -> dict:
    """Analytic ICI communication volume + peak feature memory per device.

    The quantities a real multi-chip run must be validated against
    (BASELINE.md ≥80% two-host efficiency target): per hop every feature row
    crosses the interconnect exactly once in both variants —

    - ``all_gather``: each device RECEIVES the other D-1 blocks,
      ``(D-1)·block·F·itemsize`` bytes/hop/device, and holds the full
      ``D·block×F`` matrix (peak memory O(n_pad·F)).
    - ``ring``: each device forwards its visiting block D times
      (``D·block·F·itemsize`` bytes/hop/device — one redundant final
      rotation keeps the loop uniform), but peak feature memory is only
      O(2·block·F); every ppermute overlaps the local bucket SpMM.

    Returns totals in bytes (per device per hop, per device per K-hop
    propagate, and aggregate over the mesh) plus the peak per-device feature
    bytes. Logged by the distributed trainers so scaling runs record their
    expected comm volume next to measured step time."""
    if mode == "all_gather":
        per_dev_hop = (num_shards - 1) * block * feature_dim * itemsize
        peak_feature = num_shards * block * feature_dim * itemsize
    elif mode == "ring":
        per_dev_hop = num_shards * block * feature_dim * itemsize
        peak_feature = 2 * block * feature_dim * itemsize
    else:
        raise ValueError(f"unknown comm mode {mode!r}")
    return {
        "mode": mode,
        "num_shards": num_shards,
        "block": block,
        "feature_dim": feature_dim,
        "prop_steps": prop_steps,
        "bytes_per_device_per_hop": per_dev_hop,
        "bytes_per_device_total": per_dev_hop * prop_steps,
        "bytes_mesh_total": per_dev_hop * prop_steps * num_shards,
        "peak_feature_bytes_per_device": peak_feature,
    }


def dist_propagate_reference(part: RowPartition, x: np.ndarray, k: int):
    """Host oracle for tests: dense numpy propagation on the stitched-back
    adjacency."""
    import scipy.sparse as sp

    d, nnz = part.rows.shape
    rows_g = (part.rows + np.arange(d)[:, None] * part.block).reshape(-1)
    cols_g = part.cols.reshape(-1)
    vals_g = part.vals.reshape(-1)
    keep = vals_g != 0
    adj = sp.csr_matrix(
        (vals_g[keep], (rows_g[keep], cols_g[keep])),
        shape=(part.n_pad, part.n_pad),
    )
    x_pad = pad_features(np.asarray(x, np.float32), part)
    hops = [x_pad]
    for _ in range(k):
        hops.append(adj @ hops[-1])
    return np.stack(hops)
