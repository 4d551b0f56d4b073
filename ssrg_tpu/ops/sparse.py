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
    # rows X must be padded to so every (16-aligned) window slice fits
    # without clamping; 0 = legacy/clamped layout (no extra pad needed)
    pad_to: int = 0

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
        need = max(w, self.pad_to)
        if need > x.shape[0]:  # pad so window slices never clip
            xp = jnp.pad(x, ((0, need - x.shape[0]), (0, 0)))

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
            self.n_rows, self.n_cols, self.row_block, self.pad_to,
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

    tiles: jnp.ndarray     # [P, row_block, tile_cols]  (f32 or bf16)
    starts: jnp.ndarray    # int32 [P] column start per tile
    block_of: jnp.ndarray  # int32 [P] destination row block per tile
    rest: Union["HybridAdj", "BlockCOOAdj"]  # scattered edges
    n_rows: int
    n_cols: int
    tiled_fraction: float = 1.0  # fraction of edges in dense tiles (builder)

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def tile_stats(self) -> Tuple[int, int, int]:
        p, rb, tc = self.tiles.shape
        nb = -(-max(self.n_rows, 1) // rb)
        return nb, p, rb * tc

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        # Flat-pair schedule: one scan step per REAL dense tile (no
        # tiles-per-block padding — a max-T padded layout both wastes
        # memory T_max/T_mean-fold and burns MXU time on all-zero pad
        # tiles). Each step: contiguous window slice of X, one MXU matmul,
        # accumulate into the tile's destination row block.
        p, rb, tc = self.tiles.shape
        f = x.shape[1]
        nb = -(-max(self.n_rows, 1) // rb)
        xp = x
        if tc > x.shape[0]:  # tiny graph
            xp = jnp.pad(x, ((0, tc - x.shape[0]), (0, 0)))

        def pair(acc, inputs):
            tile, start, blk = inputs
            xw = jax.lax.dynamic_slice(xp, (start, 0), (tc, f))
            y = jnp.dot(tile, xw.astype(tile.dtype),
                        preferred_element_type=jnp.float32)
            row0 = blk * rb
            cur = jax.lax.dynamic_slice(acc, (row0, 0), (rb, f))
            return jax.lax.dynamic_update_slice(acc, cur + y, (row0, 0)), None

        acc0 = jnp.zeros((nb * rb, f), jnp.float32)
        out, _ = jax.lax.scan(
            pair, acc0, (self.tiles, self.starts, self.block_of)
        )
        out = out[: self.n_rows] + self.rest.spmm(x)
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.tiles, self.starts, self.block_of, self.rest), (
            self.n_rows, self.n_cols, self.tiled_fraction,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


@jax.tree_util.register_pytree_node_class
@dataclass
class BlockCOOAdj:
    """2-D bucketed COO: edges grouped by (row bucket × column bucket) so
    every gather reads and every scatter writes a SMALL contiguous window.

    The plain sorted-COO/ELL gather rate collapses ~3.5× when X grows past
    cache/TLB reach (products scale, docs/PERFORMANCE.md "Scale dependence"):
    the gather engine is transaction-bound on random access into a ~1 GB
    table. Bucketing restores the small-table rate: for each column bucket,
    one `dynamic_slice` stages a [col_bucket, F] window of X (sequential
    HBM read); edges of each row bucket then gather inside that window and
    segment-sum into a [row_bucket, F] slab that is added back with
    `dynamic_update_slice`. Column buckets scan OUTER so each window is
    staged once per hop.

    Storage is [nb_c, nb_r, L] (column-major outer for the scan), padded to
    the max bucket fill; on near-uniform scattered edges (the inter-cluster
    rest of a clustered graph — its distribution is uniform by construction)
    padding waste is small. Used as the ``rest`` engine of :class:`TiledAdj`
    at large N.
    """

    rows: jnp.ndarray   # int32 [nb_c, nb_r, L] row index LOCAL to row bucket
    cols: jnp.ndarray   # int32 [nb_c, nb_r, L] col index LOCAL to col bucket
    vals: jnp.ndarray   # f32   [nb_c, nb_r, L] (pad: 0)
    n_rows: int
    n_cols: int
    row_bucket: int
    col_bucket: int

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        nb_c, nb_r, _ = self.rows.shape
        f = x.shape[1]
        rb, cb = self.row_bucket, self.col_bucket
        xp = x
        if nb_c * cb > x.shape[0]:
            xp = jnp.pad(x, ((0, nb_c * cb - x.shape[0]), (0, 0)))
        row_starts = jnp.arange(nb_r, dtype=jnp.int32) * rb

        def col_step(out, inputs):
            r_b, c_b, v_b, j = inputs  # [nb_r, L] ×3, scalar bucket index
            xw = jax.lax.dynamic_slice(xp, (j * cb, 0), (cb, f))

            def row_step(out, inputs2):
                r, c, v, start = inputs2
                gathered = jnp.take(xw, c, axis=0) * v[:, None]
                part = jax.ops.segment_sum(gathered, r, num_segments=rb)
                cur = jax.lax.dynamic_slice(out, (start, 0), (rb, f))
                return jax.lax.dynamic_update_slice(
                    out, cur + part, (start, 0)
                ), None

            out, _ = jax.lax.scan(row_step, out, (r_b, c_b, v_b, row_starts))
            return out, None

        out0 = jnp.zeros((nb_r * rb, f), jnp.float32)
        out, _ = jax.lax.scan(
            col_step, out0,
            (self.rows, self.cols, self.vals,
             jnp.arange(nb_c, dtype=jnp.int32)),
        )
        out = out[: self.n_rows]
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.rows, self.cols, self.vals), (
            self.n_rows, self.n_cols, self.row_bucket, self.col_bucket,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


Adjacency = Union[
    DenseAdj, COOAdj, ELLAdj, HybridAdj, BandedAdj, TiledAdj, BlockCOOAdj,
]


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
    lo = (lo // 16) * 16  # sublane-align (16: bf16 tile) the slice start
    window = int((hi - lo).max()) + 1 if n else 1
    window = _round_up(max(window, 1), lane_pad)
    need = nb * row_block * window * itemsize
    if need > mem_budget_bytes:
        raise ValueError(
            f"banded pack needs {need/2**30:.2f} GiB (window={window}) > "
            f"budget {mem_budget_bytes/2**30:.2f} GiB; graph is not banded "
            f"enough — RCM-reorder it or use engine='hybrid'"
        )
    # window starts stay 16-aligned and UNclamped (the Pallas kernel's
    # Mosaic alignment proof needs the 16-multiple); instead of clamping at
    # the right edge, spmm pads X to ``pad_to`` so slices never clip
    pad_to = int((lo + window).max()) if n else window

    blocks = np.zeros((nb, row_block, window), np.float32)
    rows_of = np.repeat(np.arange(n), np.diff(csr.indptr))
    local_r = rows_of % row_block
    block_of = rows_of // row_block
    local_c = csr.indices - lo[block_of]
    blocks[block_of, local_r, local_c] = csr.data
    return BandedAdj(
        jnp.asarray(blocks, dtype=dtype), jnp.asarray(lo, jnp.int32),
        n_rows=n, n_cols=m, row_block=row_block, pad_to=pad_to,
    )


def build_blockcoo(
    adj: sp.spmatrix,
    row_bucket: int = 1 << 18,
    col_bucket: int = 1 << 19,
    lane_pad: int = 512,
) -> BlockCOOAdj:
    """Pack any sparse matrix into the 2-D bucketed COO layout (edges grouped
    by row-bucket × column-bucket, padded to the max bucket fill)."""
    coo = adj.tocoo()
    n, m = coo.shape
    nb_r = -(-max(n, 1) // row_bucket)
    nb_c = -(-max(m, 1) // col_bucket)
    bi = coo.row // row_bucket
    bj = coo.col // col_bucket
    key = (bj.astype(np.int64) * nb_r + bi)  # column-major outer
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    counts = np.bincount(key_s, minlength=nb_r * nb_c)
    L = _round_up(max(int(counts.max()), 1), lane_pad)
    starts = np.zeros(nb_r * nb_c, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    pos = np.arange(key_s.size) - starts[key_s]
    rows = np.zeros((nb_c * nb_r, L), np.int32)
    cols = np.zeros((nb_c * nb_r, L), np.int32)
    vals = np.zeros((nb_c * nb_r, L), np.float32)
    rows[key_s, pos] = (coo.row[order] % row_bucket).astype(np.int32)
    cols[key_s, pos] = (coo.col[order] % col_bucket).astype(np.int32)
    vals[key_s, pos] = coo.data[order].astype(np.float32)
    return BlockCOOAdj(
        jnp.asarray(rows.reshape(nb_c, nb_r, L)),
        jnp.asarray(cols.reshape(nb_c, nb_r, L)),
        jnp.asarray(vals.reshape(nb_c, nb_r, L)),
        n_rows=n, n_cols=m, row_bucket=row_bucket, col_bucket=col_bucket,
    )


def build_tiled(
    adj: sp.spmatrix,
    row_block: int = 256,
    tile_cols: int = 512,
    min_edges_per_tile: int = 48,
    dtype=jnp.float32,
    mem_budget_bytes: int = 4 << 30,
    min_tiled_fraction: float = 0.25,
    device_scatter: bool = True,
    rest_engine: str = "auto",
    rest_gather_bf16: bool = False,
) -> TiledAdj:
    """Pack a clustered adjacency into dense tiles + hybrid leftovers.

    ``min_edges_per_tile`` is the break-even density: below it the gather
    engine is cheaper than streaming+multiplying a mostly-zero tile (the
    measured crossover on the target chip is a few dozen edges per
    256×512 tile). Raises ``ValueError`` when fewer than
    ``min_tiled_fraction`` of the edges land in dense tiles (the graph is
    not clustered enough — tiles would waste memory for no speedup) or the
    tile array would exceed ``mem_budget_bytes``.

    ``rest_engine``: layout for the scattered leftovers — ``"hybrid"``
    (ELL+COO gather over the full table), ``"blockcoo"`` (2-D bucketed COO:
    small-window gathers), ``"onehot"`` (round-5: the scatter-free
    segmented reduce of ``ops.pallas_rest`` — one-hot MXU matmuls via the
    Pallas revisited-output kernel, measured 61.6 M edges/s vs the 34-45 M
    segment_sum family on the products-scale scattered-rest matrix,
    docs/PERFORMANCE.md), or ``"auto"`` (n > 512k: onehot on TPU while its
    gathered slab fits a ~3 GiB estimate, else blockcoo; hybrid below).

    ``device_scatter`` (default True) materializes the dense tile array ON DEVICE by
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
    # flat-pair storage: one [row_block, tile_cols] tile per REAL dense pair
    # (dense_pairs is sorted by key = block·num_segs + seg, i.e. grouped by
    # destination block) — a max-tiles-per-block padded layout would waste
    # T_max/T_mean both in memory and in MXU work on all-zero pad tiles
    blocks_of_pairs = (dense_pairs // num_segs).astype(np.int64)
    segs_of_pairs = (dense_pairs % num_segs).astype(np.int64)
    p_num = len(dense_pairs)
    need = p_num * row_block * tile_cols * itemsize
    if need > mem_budget_bytes:
        raise ValueError(
            f"tiled pack needs {need/2**30:.2f} GiB ({p_num} tiles) > budget "
            f"{mem_budget_bytes/2**30:.2f} GiB"
        )
    pair_start = np.minimum(
        segs_of_pairs * tile_cols, max(m - tile_cols, 0)
    ).astype(np.int32)

    # rank each dense edge's pair once; both fill paths consume it
    local_r = rows_of % row_block
    data = csr.data.astype(np.float32)
    cols = csr.indices
    dense_idx = np.where(dense_set)[0]
    pair_rank = np.searchsorted(dense_pairs, pair_key[dense_idx])

    # scattered leftovers — built and shipped BEFORE the multi-GB tile
    # scatter so the rest transfers never contend with the scatter's
    # transient lane-padded index temps (round-5 OOM at products scale)
    rest_mask = ~dense_set
    rest = sp.coo_matrix(
        (data[rest_mask], (rows_of[rest_mask], cols[rest_mask])), shape=(n, m)
    ).tocsr()
    # the rest engines require at least one edge; synthesize a zero-weight one
    if rest.nnz == 0:
        rest = sp.coo_matrix(
            (np.zeros(1, np.float32), ([0], [0])), shape=(n, m)
        ).tocsr()
    if rest_engine == "auto":
        if n > (1 << 19):
            # the scatter-free one-hot tier is the measured-fastest rest on
            # TPU (61.6 M edges/s standalone; composite 193.9 M at 1M flat,
            # benchmarks/onehot_composite_probe.py — an earlier 13×-slower
            # composite reading was a degraded-TPU-worker artifact, see
            # docs/PERFORMANCE.md). Its gathered slab materializes
            # ~(nnz·1.2)·F·4 B in HBM, so the auto choice is gated on a
            # slab estimate (F=128 assumption) that leaves room for tiles +
            # features; larger rests keep blockcoo, and explicit
            # rest_engine="onehot" (+ gather_bf16 to halve the slab)
            # remains available for full-HBM deployments.
            slab_est = int(rest.nnz * 1.25) * 128 * 4
            on_tpu = jax.default_backend() == "tpu"
            rest_engine = (
                "onehot" if on_tpu and slab_est <= (3 << 30) else "blockcoo"
            )
        else:
            rest_engine = "hybrid"
    if rest_engine == "onehot":
        from ssrg_tpu.ops.pallas_rest import build_rest_segmented

        # chunk=1024 is the Mosaic-friendly chunk (the [8, 128] rows block);
        # row_block=1024 was the measured sweep winner (61.6 M edges/s,
        # benchmarks/rest_scatterfree_sweep2.py)
        rest_dev = build_rest_segmented(
            rest, row_block=1024, chunk=1024, gather_bf16=rest_gather_bf16,
        )
    elif rest_engine == "blockcoo":
        rest_dev = build_blockcoo(rest)
    else:
        rest_dev = build_hybrid(rest)

    if device_scatter:
        off_of_edge = (
            local_r[dense_idx] * tile_cols
            + (cols[dense_idx] - pair_start[pair_rank])
        ).astype(np.int32)
        tiles_dev = _tile_scatter_chunked(
            pair_rank.astype(np.int32), off_of_edge, data[dense_idx],
            p_num=p_num, row_block=row_block, tile_cols=tile_cols,
            dtype=jnp.dtype(dtype),
        )
    else:
        tiles = np.zeros((p_num, row_block, tile_cols), np.float32)
        tiles[
            pair_rank,
            local_r[dense_idx],
            cols[dense_idx] - pair_start[pair_rank],
        ] = data[dense_idx]
        tiles_dev = jnp.asarray(tiles, dtype=dtype)
    return TiledAdj(
        tiles_dev, jnp.asarray(pair_start),
        jnp.asarray(blocks_of_pairs.astype(np.int32)),
        rest_dev, n_rows=n, n_cols=m,
        tiled_fraction=float(tiled_frac),
    )


# edges per scatter dispatch: TPU lays [E, 2] scatter indices out with lane
# padding 2 -> 128 (a 64x blowup: observed 22.7 GB of index copy at E=44M),
# so the device scatter is CHUNKED — each chunk's temp stays ~1.5 GB and the
# accumulator buffer is donated across chunks (no per-chunk copy of the
# multi-GiB tile array). Round-5: halved from 4M — through the relay the
# donation+temp peak at 4M-edge chunks sat at the memory ceiling at
# products scale.
_SCATTER_EDGE_CHUNK = 1_000_000


@partial(jax.jit, static_argnames=("dtype",), donate_argnums=(0,))
def _tile_scatter_add(flat, pair_of, offs, vals, dtype):
    return flat.at[pair_of, offs].add(vals.astype(dtype))


@partial(
    jax.jit,
    static_argnames=("p_num", "row_block", "tile_cols"),
    donate_argnums=(0,),
)
def _tile_reshape(flat, p_num, row_block, tile_cols):
    return flat.reshape(p_num, row_block, tile_cols)


def _tile_scatter_chunked(
    pair_of: np.ndarray, offs: np.ndarray, vals: np.ndarray,
    p_num: int, row_block: int, tile_cols: int, dtype,
) -> jnp.ndarray:
    """Materialize dense tiles on device from compact per-edge tuples
    (~12 B/edge shipped vs the fully padded blocks). 2-D (pair, offset)
    scatter keeps every index below 2^31 at any graph scale; edges stream in
    ``_SCATTER_EDGE_CHUNK`` batches into a donated accumulator (see the
    constant's note on the TPU index-layout blowup); the final reshape is a
    donated bitcast, not a second multi-GiB buffer."""
    flat = jnp.zeros((p_num, row_block * tile_cols), dtype)
    e = pair_of.shape[0]
    chunk = _SCATTER_EDGE_CHUNK
    if e <= chunk:
        flat = _tile_scatter_add(
            flat, jnp.asarray(pair_of), jnp.asarray(offs),
            jnp.asarray(vals), dtype=dtype,
        )
    else:
        n_chunks = -(-e // chunk)
        for i in range(n_chunks):
            s = slice(i * chunk, min((i + 1) * chunk, e))
            pr, of, va = pair_of[s], offs[s], vals[s]
            pad = chunk - pr.shape[0]
            if pad:
                # pad the FINAL slice only (never a full-array copy) so every
                # dispatch reuses ONE compiled program; pad entries scatter
                # 0.0 into tile 0 offset 0 (a no-op add)
                pr = np.concatenate([pr, np.zeros(pad, pr.dtype)])
                of = np.concatenate([of, np.zeros(pad, of.dtype)])
                va = np.concatenate([va, np.zeros(pad, va.dtype)])
            flat = _tile_scatter_add(
                flat, jnp.asarray(pr), jnp.asarray(of), jnp.asarray(va),
                dtype=dtype,
            )
            # NOTE do NOT fetch/sync flat between chunks: a reader on the
            # donated accumulator forces XLA to COPY the multi-GiB buffer
            # per chunk (measured round-5 OOM at products scale); the async
            # chain donates cleanly when left alone
    return _tile_reshape(flat, p_num, row_block, tile_cols)


# "auto" crossover: the MXU dense matmul wins outright below a few thousand
# rows (measured, docs/PERFORMANCE.md). Single source of truth — bench.py's
# roofline gating resolves "auto" against THIS constant.
DENSE_THRESHOLD = 8192


def device_adjacency(
    adj: sp.spmatrix,
    engine: str = "auto",
    dense_threshold: int = DENSE_THRESHOLD,
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
    if engine == "blockcoo":
        return build_blockcoo(adj, **kwargs)
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
