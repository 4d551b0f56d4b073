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


@dataclass
class ShardedAdj:
    """Device-resident row-partitioned adjacency bound to a mesh axis."""

    rows: jax.Array   # int32 [D, nnz_pad] (sharded over axis 0)
    cols: jax.Array   # int32 [D, nnz_pad]
    vals: jax.Array   # f32   [D, nnz_pad]
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
    num_chunks = nnz // chunk

    def step(acc, inputs):
        r, c, v = inputs
        gathered = jnp.take(x_full, c, axis=0) * v[:, None]
        return acc + jax.ops.segment_sum(gathered, r, num_segments=block), None

    acc0 = jnp.zeros((block, f), jnp.float32)
    if axis is not None:
        # mark the zero accumulator as device-varying over the mesh axis so the
        # scan carry type matches inside shard_map
        acc0 = jax.lax.pvary(acc0, (axis,))
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
