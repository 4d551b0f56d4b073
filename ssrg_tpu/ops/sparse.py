"""Device-side sparse adjacency formats and SpMM engines.

TPU-native replacement for the reference's CPU CSR SpMM kernels
(``SSRG/operators/csrc/matmul.c`` — scalar/OMP/AVX row loops — and the
cuSPARSE variant ``cudamatmul.c``; SURVEY.md §2.1). Instead of translating the
row-loop, each format here is a JAX pytree whose ``spmm(X)`` maps onto the TPU
compute units:

- ``DenseAdj``   — adjacency as a dense matrix; SpMM = one MXU matmul. The
  fastest choice whenever N is small enough that N×N fits in HBM (Planetoid
  scale): at N=4k the dense matmul runs at MXU speed-of-light, far above any
  gather-based sparse scheme.
- ``COOAdj``     — row-sorted, padded COO; SpMM = gather(X, col) ⊙ w →
  ``segment_sum`` by row, chunked under ``lax.scan`` so the materialized
  gather stays bounded. XLA lowers the sorted segment-sum to an efficient
  scatter; padding keeps every shape static (XLA requirement).
- ``ELLAdj``     — row-padded ELLPACK (each row padded to max-degree buckets);
  SpMM = dense gather + weighted sum over the neighbor axis. Good when the
  degree distribution is tight; also the layout consumed by the Pallas kernel
  (``ssrg_tpu.ops.pallas_spmm``).

All engines compute strictly in float32 (accumulation precision) unless the
input is lower precision and ``preferred_element_type`` promotes it.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# ---------------------------------------------------------------------------
# Dense adjacency
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class DenseAdj:
    """Adjacency stored dense. SpMM rides the MXU directly."""

    mat: jnp.ndarray  # [N, M]

    @property
    def shape(self) -> Tuple[int, int]:
        return self.mat.shape

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        return jnp.dot(self.mat, x, preferred_element_type=jnp.float32)

    def tree_flatten(self):
        return (self.mat,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


# ---------------------------------------------------------------------------
# Sorted-COO adjacency
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class COOAdj:
    """Row-sorted COO, padded to a multiple of ``chunk``.

    Padding entries have ``val == 0`` and ``row == col == 0`` so they
    contribute nothing. ``spmm`` scans over nnz chunks; each chunk gathers
    ``chunk`` rows of X, scales by edge weight, and segment-sums into the
    output. Keeping the chunk on-chip bounds peak memory at
    ``chunk × F`` instead of ``nnz × F``.
    """

    row: jnp.ndarray   # int32 [nnz_pad]
    col: jnp.ndarray   # int32 [nnz_pad]
    val: jnp.ndarray   # f32   [nnz_pad]
    n_rows: int
    n_cols: int
    chunk: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def nnz_padded(self) -> int:
        return int(self.row.shape[0])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        nnz_pad = self.row.shape[0]
        num_chunks = nnz_pad // self.chunk
        if num_chunks <= 1:
            gathered = jnp.take(x, self.col, axis=0) * self.val[:, None]
            return jax.ops.segment_sum(
                gathered, self.row, num_segments=self.n_rows
            )

        rows = self.row.reshape(num_chunks, self.chunk)
        cols = self.col.reshape(num_chunks, self.chunk)
        vals = self.val.reshape(num_chunks, self.chunk)

        def step(acc, inputs):
            r, c, v = inputs
            gathered = jnp.take(x, c, axis=0) * v[:, None]
            acc = acc + jax.ops.segment_sum(gathered, r, num_segments=self.n_rows)
            return acc, None

        init = jnp.zeros((self.n_rows, x.shape[1]), dtype=jnp.float32)
        out, _ = jax.lax.scan(step, init, (rows, cols, vals))
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.row, self.col, self.val), (self.n_rows, self.n_cols, self.chunk)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


# ---------------------------------------------------------------------------
# ELLPACK adjacency
# ---------------------------------------------------------------------------


@jax.tree_util.register_pytree_node_class
@dataclass
class ELLAdj:
    """Row-padded ELLPACK: per row, up to ``width`` (neighbor, weight) slots.

    SpMM = ``X[cols]`` gather of shape [N, width, F] reduced over ``width``,
    chunked over row blocks to bound the gather. Padding slots have weight 0
    and column 0.
    """

    cols: jnp.ndarray   # int32 [N_pad, width]
    vals: jnp.ndarray   # f32   [N_pad, width]
    n_rows: int
    n_cols: int
    row_block: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def width(self) -> int:
        return int(self.cols.shape[1])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        n_pad = self.cols.shape[0]
        nb = n_pad // self.row_block
        cols = self.cols.reshape(nb, self.row_block, self.width)
        vals = self.vals.reshape(nb, self.row_block, self.width)

        def block(carry, inputs):
            c, v = inputs  # [row_block, width]
            gathered = jnp.take(x, c.reshape(-1), axis=0).reshape(
                self.row_block, self.width, x.shape[1]
            )
            out = jnp.einsum(
                "rw,rwf->rf", v, gathered, preferred_element_type=jnp.float32
            )
            return carry, out

        _, outs = jax.lax.scan(block, None, (cols, vals))
        out = outs.reshape(n_pad, x.shape[1])[: self.n_rows]
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.cols, self.vals), (self.n_rows, self.n_cols, self.row_block)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class HybridAdj:
    """ELL + COO-tail hybrid (CUSP-style): rows keep up to ``width`` slots in
    the regular ELL part; overflow edges of heavy (hub) rows spill into a
    sorted-COO tail. The right default for power-law graphs, where pure ELL
    padding explodes with the max degree but most rows are short.
    SpMM = ELL gather-reduce + COO segment-sum of the tail."""

    ell: ELLAdj
    tail: COOAdj

    @property
    def shape(self) -> Tuple[int, int]:
        return self.ell.shape

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.ell.spmm(x) + self.tail.spmm(x)

    def tree_flatten(self):
        return (self.ell, self.tail), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


@jax.tree_util.register_pytree_node_class
@dataclass
class BandedAdj:
    """Windowed dense-block ("banded") adjacency: propagation-blocking for
    the MXU.

    For a locality-reordered graph (RCM/BFS — ``ssrg_tpu.ops.reorder``), all
    neighbors of a 256-row block fall inside one contiguous column window of
    width ``window``. Each block is stored DENSE; SpMM is then ``nb`` small
    MXU matmuls against contiguous ``dynamic_slice`` windows of X — zero
    gathers, fully sequential HBM reads. This trades FLOPs (dense blocks are
    mostly zeros) for the elimination of random access, which pays off
    whenever ``window`` ≪ N: the MXU is ~100× oversubscribed relative to the
    gather engine on this workload.

    The reference has no analog (its CPU kernel streams CSR rows); this is
    the TPU-native locality tier foreshadowed in docs/PERFORMANCE.md. Use on
    RCM-reordered real graphs; on random graphs the window degenerates to N
    and ``build_banded`` refuses (memory budget).
    """

    blocks: jnp.ndarray   # [nb, row_block, window]  (f32 or bf16)
    los: jnp.ndarray      # int32 [nb] window start per block
    n_rows: int
    n_cols: int
    row_block: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def window(self) -> int:
        return int(self.blocks.shape[2])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        nb, rb, w = self.blocks.shape
        f = x.shape[1]
        xp = x
        if w > x.shape[0]:  # tiny graph: window exceeds N, pad once
            xp = jnp.pad(x, ((0, w - x.shape[0]), (0, 0)))

        def block(carry, inputs):
            a, lo = inputs
            xw = jax.lax.dynamic_slice(xp, (lo, 0), (w, f))
            out = jnp.dot(
                a, xw.astype(a.dtype), preferred_element_type=jnp.float32
            )
            return carry, out

        _, outs = jax.lax.scan(block, None, (self.blocks, self.los))
        out = outs.reshape(nb * rb, f)[: self.n_rows]
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.blocks, self.los), (
            self.n_rows, self.n_cols, self.row_block,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class TiledAdj:
    """Tile-sparse dense-block adjacency (BSR-style): the general form of
    :class:`BandedAdj` for clustered-but-not-banded graphs.

    Edges are grouped into [row_block × tile_cols] dense tiles keyed by an
    arbitrary column start per tile; tiles holding at least
    ``min_edges_per_tile`` edges run as MXU matmuls against contiguous
    ``dynamic_slice`` windows of X, and all remaining (scattered) edges
    spill into a standard hybrid ELL+COO ``rest``. On community-structured
    graphs (SBM/RCM-clustered real graphs) most edges land in dense tiles
    and the hot loop becomes sequential HBM streams + MXU matmuls with no
    gathers — the locality remedy for the large-table gather slowdown
    measured at products scale (docs/PERFORMANCE.md).
    """

    tiles: jnp.ndarray   # [nb, T, row_block, tile_cols]  (f32 or bf16)
    starts: jnp.ndarray  # int32 [nb, T] column start per tile (pad: 0, zeros)
    rest: "HybridAdj"    # leftover scattered edges
    n_rows: int
    n_cols: int
    tiled_fraction: float = 1.0  # fraction of edges in dense tiles (builder)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def tile_stats(self) -> Tuple[int, int, int]:
        nb, t, rb, tc = self.tiles.shape
        return nb, t, rb * tc

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        nb, t, rb, tc = self.tiles.shape
        f = x.shape[1]
        xp = x
        if tc > x.shape[0]:  # tiny graph
            xp = jnp.pad(x, ((0, tc - x.shape[0]), (0, 0)))

        def block(carry, inputs):
            tiles_b, starts_b = inputs  # [T, rb, tc], [T]

            def tile_step(k, acc):
                xw = jax.lax.dynamic_slice(xp, (starts_b[k], 0), (tc, f))
                return acc + jnp.dot(
                    tiles_b[k], xw.astype(tiles_b.dtype),
                    preferred_element_type=jnp.float32,
                )

            acc = jax.lax.fori_loop(
                0, t, tile_step, jnp.zeros((rb, f), jnp.float32)
            )
            return carry, acc

        _, outs = jax.lax.scan(block, None, (self.tiles, self.starts))
        out = outs.reshape(nb * rb, f)[: self.n_rows]
        out = out + self.rest.spmm(x)
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.tiles, self.starts, self.rest), (
            self.n_rows, self.n_cols, self.tiled_fraction,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


Adjacency = Union[DenseAdj, COOAdj, ELLAdj, HybridAdj, BandedAdj, TiledAdj]


# ---------------------------------------------------------------------------
# Host-side builders
# ---------------------------------------------------------------------------


def build_dense(adj: sp.spmatrix, dtype=jnp.float32) -> DenseAdj:
    return DenseAdj(jnp.asarray(adj.toarray(), dtype=dtype))


def build_coo(adj: sp.spmatrix, chunk: int = 1 << 19) -> COOAdj:
    """Build a row-sorted padded COOAdj from any scipy sparse matrix."""
    coo = adj.tocoo()
    order = np.argsort(coo.row, kind="stable")
    row = coo.row[order].astype(np.int32)
    col = coo.col[order].astype(np.int32)
    val = coo.data[order].astype(np.float32)
    nnz = row.shape[0]
    if nnz <= chunk:
        # single-shot: pad only to the vector-friendly 512 boundary
        chunk = max(_round_up(nnz, 512), 512)
        nnz_pad = chunk
    else:
        # choose the chunk count first, then shrink the chunk so padding is
        # bounded by num_chunks*512 instead of up to one whole chunk
        num_chunks = -(-nnz // chunk)
        chunk = _round_up(-(-nnz // num_chunks), 512)
        nnz_pad = num_chunks * chunk
    pad = nnz_pad - nnz
    if pad:
        row = np.concatenate([row, np.zeros(pad, np.int32)])
        col = np.concatenate([col, np.zeros(pad, np.int32)])
        val = np.concatenate([val, np.zeros(pad, np.float32)])
    return COOAdj(
        jnp.asarray(row), jnp.asarray(col), jnp.asarray(val),
        n_rows=adj.shape[0], n_cols=adj.shape[1], chunk=chunk,
    )


def build_ell(
    adj: sp.spmatrix,
    row_block: int = 256,
    width: Optional[int] = None,
    lane_pad: int = 8,
) -> ELLAdj:
    """Build a row-padded ELLAdj. ``width`` defaults to max degree (rounded up
    to ``lane_pad``); rows longer than ``width`` raise (use COOAdj instead)."""
    csr = adj.tocsr()
    n, m = csr.shape
    deg = np.diff(csr.indptr)
    max_deg = int(deg.max()) if n else 0
    if width is None:
        width = _round_up(max(max_deg, 1), lane_pad)
    elif max_deg > width:
        raise ValueError(f"max degree {max_deg} exceeds ELL width {width}")
    n_pad = _round_up(max(n, 1), row_block)
    cols = np.zeros((n_pad, width), np.int32)
    vals = np.zeros((n_pad, width), np.float32)
    # vectorized fill: position of each nnz within its row
    if csr.nnz:
        pos = np.arange(csr.nnz) - np.repeat(csr.indptr[:-1], deg)
        rows_of = np.repeat(np.arange(n), deg)
        cols[rows_of, pos] = csr.indices
        vals[rows_of, pos] = csr.data
    return ELLAdj(
        jnp.asarray(cols), jnp.asarray(vals),
        n_rows=n, n_cols=m, row_block=row_block,
    )


def build_hybrid(
    adj: sp.spmatrix,
    width: Optional[int] = None,
    width_percentile: float = 95.0,
    row_block: int = 256,
    chunk: int = 1 << 19,
) -> HybridAdj:
    """Split a CSR adjacency into an ELL part (first ``width`` neighbors per
    row; default width = p95 degree rounded up to 8) and a sorted-COO tail of
    the overflow edges."""
    from ssrg_tpu import native

    csr = adj.tocsr()
    n, m = csr.shape
    deg = np.diff(csr.indptr)
    if width is None:
        width = int(np.percentile(deg, width_percentile)) if n else 1
        width = _round_up(max(width, 1), 8)
    n_pad = _round_up(max(n, 1), row_block)
    cols, vals, tr, tc, tv = native.ell_hybrid_pack(
        csr.indptr, csr.indices, csr.data, width, n_pad
    )
    ell = ELLAdj(jnp.asarray(cols), jnp.asarray(vals),
                 n_rows=n, n_cols=m, row_block=row_block)
    tail = sp.coo_matrix((tv, (tr, tc)), shape=(n, m))
    return HybridAdj(ell, build_coo(tail, chunk=chunk))


def build_banded(
    adj: sp.spmatrix,
    row_block: int = 256,
    lane_pad: int = 128,
    dtype=jnp.float32,
    mem_budget_bytes: int = 2 << 30,
) -> BandedAdj:
    """Pack a (locality-reordered) adjacency into windowed dense blocks.

    Window width = max over row blocks of the column span, rounded up to
    ``lane_pad``. Raises ``ValueError`` when the dense-block array would
    exceed ``mem_budget_bytes`` — the signal that the graph is not banded
    enough (reorder first, or use the hybrid engine)."""
    csr = adj.tocsr()
    n, m = csr.shape
    nb = -(-max(n, 1) // row_block)
    itemsize = jnp.dtype(dtype).itemsize

    lo = np.zeros(nb, np.int64)
    hi = np.zeros(nb, np.int64)
    for b in range(nb):
        r0, r1 = b * row_block, min((b + 1) * row_block, n)
        cols_b = csr.indices[csr.indptr[r0] : csr.indptr[r1]]
        if cols_b.size:
            lo[b], hi[b] = cols_b.min(), cols_b.max()
    lo = (lo // 8) * 8  # sublane-align the slice start
    window = int((hi - lo).max()) + 1 if n else 1
    window = _round_up(max(window, 1), lane_pad)
    need = nb * row_block * window * itemsize
    if need > mem_budget_bytes:
        raise ValueError(
            f"banded pack needs {need/2**30:.2f} GiB (window={window}) > "
            f"budget {mem_budget_bytes/2**30:.2f} GiB; graph is not banded "
            f"enough — RCM-reorder it or use engine='hybrid'"
        )
    # clamp window starts so dynamic_slice never clips (shifting a window
    # left is safe: column offsets stay inside [0, window))
    lo = np.maximum(np.minimum(lo, max(m - window, 0)), 0)

    blocks = np.zeros((nb, row_block, window), np.float32)
    rows_of = np.repeat(np.arange(n), np.diff(csr.indptr))
    local_r = rows_of % row_block
    block_of = rows_of // row_block
    local_c = csr.indices - lo[block_of]
    blocks[block_of, local_r, local_c] = csr.data
    return BandedAdj(
        jnp.asarray(blocks, dtype=dtype), jnp.asarray(lo, jnp.int32),
        n_rows=n, n_cols=m, row_block=row_block,
    )


def build_tiled(
    adj: sp.spmatrix,
    row_block: int = 256,
    tile_cols: int = 512,
    min_edges_per_tile: int = 48,
    dtype=jnp.float32,
    mem_budget_bytes: int = 4 << 30,
    min_tiled_fraction: float = 0.25,
    device_scatter: bool = False,
) -> TiledAdj:
    """Pack a clustered adjacency into dense tiles + hybrid leftovers.

    ``min_edges_per_tile`` is the break-even density: below it the gather
    engine is cheaper than streaming+multiplying a mostly-zero tile (the
    measured crossover on the target chip is a few dozen edges per
    256×512 tile). Raises ``ValueError`` when fewer than
    ``min_tiled_fraction`` of the edges land in dense tiles (the graph is
    not clustered enough — tiles would waste memory for no speedup) or the
    tile array would exceed ``mem_budget_bytes``.

    ``device_scatter=True`` materializes the dense tile array ON DEVICE by
    scattering one compact (slot, offset, value) tuple per dense edge
    (~12 B/edge shipped) instead of transferring the fully padded blocks
    (``row_block·tile_cols / edges_per_tile`` ≈ 100-1000× more bytes). On a
    slow host↔device link (the tunneled relay here moves ~3-4 MB/s) this
    turns a multi-GiB, many-minute transfer into seconds; it also skips the
    host-side dense allocation entirely."""
    csr = adj.tocsr()
    n, m = csr.shape
    nb = -(-max(n, 1) // row_block)
    itemsize = jnp.dtype(dtype).itemsize

    rows_of = np.repeat(np.arange(n), np.diff(csr.indptr))
    block_of = rows_of // row_block
    seg_of = csr.indices // tile_cols
    # count edges per (row block, column segment)
    num_segs = -(-m // tile_cols)
    pair_key = block_of.astype(np.int64) * num_segs + seg_of
    uniq, counts = np.unique(pair_key, return_counts=True)
    dense_pairs = uniq[counts >= min_edges_per_tile]
    dense_set = np.isin(pair_key, dense_pairs)

    tiled_frac = dense_set.sum() / max(csr.nnz, 1)
    if tiled_frac < min_tiled_fraction:
        raise ValueError(
            f"only {tiled_frac:.1%} of edges fall in dense "
            f"{row_block}x{tile_cols} tiles (>= {min_edges_per_tile} edges); "
            f"graph is not clustered enough — use engine='hybrid'"
        )
    # tiles per row block (padded to the max)
    blocks_of_pairs = (dense_pairs // num_segs).astype(np.int64)
    segs_of_pairs = (dense_pairs % num_segs).astype(np.int64)
    t_max = int(np.bincount(blocks_of_pairs, minlength=nb).max()) if len(
        dense_pairs
    ) else 1
    need = nb * t_max * row_block * tile_cols * itemsize
    if need > mem_budget_bytes:
        raise ValueError(
            f"tiled pack needs {need/2**30:.2f} GiB (T={t_max}) > budget "
            f"{mem_budget_bytes/2**30:.2f} GiB"
        )

    starts = np.zeros((nb, t_max), np.int32)
    # slot index of each dense pair within its row block (dense_pairs is
    # sorted by key = b * num_segs + s, i.e. grouped by block)
    first_of_block = np.searchsorted(blocks_of_pairs, np.arange(nb))
    pair_slot = np.arange(len(dense_pairs)) - first_of_block[blocks_of_pairs]
    pair_start = np.minimum(
        segs_of_pairs * tile_cols, max(m - tile_cols, 0)
    ).astype(np.int32)
    starts[blocks_of_pairs, pair_slot] = pair_start

    # rank each dense edge's pair once; both fill paths consume it
    local_r = rows_of % row_block
    data = csr.data.astype(np.float32)
    cols = csr.indices
    dense_idx = np.where(dense_set)[0]
    pair_rank = np.searchsorted(dense_pairs, pair_key[dense_idx])

    if device_scatter:
        slot_of_edge = (
            blocks_of_pairs[pair_rank] * t_max + pair_slot[pair_rank]
        ).astype(np.int32)
        off_of_edge = (
            local_r[dense_idx] * tile_cols
            + (cols[dense_idx] - pair_start[pair_rank])
        ).astype(np.int32)
        tiles_dev = _tile_scatter(
            jnp.asarray(slot_of_edge), jnp.asarray(off_of_edge),
            jnp.asarray(data[dense_idx]),
            n_slots=nb * t_max, slot_elems=row_block * tile_cols,
            dtype=jnp.dtype(dtype),
        ).reshape(nb, t_max, row_block, tile_cols)
    else:
        tiles = np.zeros((nb, t_max, row_block, tile_cols), np.float32)
        tiles[
            blocks_of_pairs[pair_rank],
            pair_slot[pair_rank],
            local_r[dense_idx],
            cols[dense_idx] - pair_start[pair_rank],
        ] = data[dense_idx]
        tiles_dev = jnp.asarray(tiles, dtype=dtype)

    # leftovers into the standard hybrid engine
    rest_mask = ~dense_set
    rest = sp.coo_matrix(
        (data[rest_mask], (rows_of[rest_mask], cols[rest_mask])), shape=(n, m)
    ).tocsr()
    # hybrid requires at least one edge; synthesize a zero-weight self entry
    if rest.nnz == 0:
        rest = sp.coo_matrix(
            (np.zeros(1, np.float32), ([0], [0])), shape=(n, m)
        ).tocsr()
    return TiledAdj(
        tiles_dev, jnp.asarray(starts),
        build_hybrid(rest), n_rows=n, n_cols=m,
        tiled_fraction=float(tiled_frac),
    )


@partial(jax.jit, static_argnames=("n_slots", "slot_elems", "dtype"))
def _tile_scatter(slots, offs, vals, n_slots, slot_elems, dtype):
    """Materialize dense tiles on device from compact per-edge tuples.
    2-D scatter keeps every index below 2^31 at any graph scale."""
    flat = jnp.zeros((n_slots, slot_elems), dtype)
    return flat.at[slots, offs].add(vals.astype(dtype))


def device_adjacency(
    adj: sp.spmatrix,
    engine: str = "auto",
    dense_threshold: int = 8192,
    **kwargs,
) -> Adjacency:
    """Pick a device format for a scipy sparse adjacency.

    ``auto``: dense for small graphs (the MXU matmul wins outright below a
    few thousand rows), ELL+COO hybrid otherwise (regular gather for the
    bulk, segment-sum tail for hubs). ``pallas`` builds the format consumed
    by the Pallas kernel.
    """
    if engine == "auto":
        engine = "dense" if adj.shape[0] <= dense_threshold else "hybrid"
    if engine == "dense":
        return build_dense(adj, **kwargs)
    if engine == "coo":
        return build_coo(adj, **kwargs)
    if engine == "ell":
        return build_ell(adj, **kwargs)
    if engine == "hybrid":
        return build_hybrid(adj, **kwargs)
    if engine == "banded":
        return build_banded(adj, **kwargs)
    if engine == "tiled":
        return build_tiled(adj, **kwargs)
    if engine == "pallas":
        from ssrg_tpu.ops.pallas_spmm import build_pallas_csr

        return build_pallas_csr(adj, **kwargs)
    if engine == "pallas_banded":
        from ssrg_tpu.ops.pallas_banded import build_pallas_banded

        return build_pallas_banded(adj, **kwargs)
    raise ValueError(f"unknown spmm engine: {engine!r}")
