"""Out-of-core K-hop propagation on a single device.

Completes the papers100M ladder for hosts/devices that cannot hold X or the
adjacency in memory (SURVEY.md §7 hard parts; docs/SCALING.md): features
live on disk as per-block ``.npy`` files, the adjacency as the streaming
partitioner's per-destination-block spools (``data/streaming.py``), and
propagation proceeds block-at-a-time — the device holds ONE source feature
block, ONE output accumulator block, and one edge bucket at any moment
(O(block·F + bucket) device memory, independent of N).

Algorithm per hop: for each destination block i, re-bucket its spooled
edges by source block j (host-side, one sort per block), then accumulate
``out_i += A[i,j] @ X_j`` with a jitted gather+segment-sum over pow2-padded
edge buckets (bounded compile-shape count). Hop h's blocks are written to
``<work_dir>/hop<h>/block<i>.npy`` before hop h+1 starts.
"""

from __future__ import annotations

import os
import os.path as osp
from functools import partial
from typing import List, Optional

import jax
import numpy as np

from ssrg_tpu.data.streaming import StreamingGraphMeta, load_shard


_CHUNK = 1 << 20  # bounds the materialized gather at chunk × F


def _pow2_pad(n: int, floor: int = 1 << 12) -> int:
    """Pad small buckets to a power of two (bounded compile-shape count);
    buckets past _CHUNK pad to a chunk multiple (the chunked scan below
    keeps the gather bounded — an unchunked 30M-edge diagonal bucket
    materialized an 8.6 GB gather and OOM'd the 16 GB chip at N=10M)."""
    p = floor
    while p < n and p < _CHUNK:
        p <<= 1
    if n <= p:
        return p
    return -(-n // _CHUNK) * _CHUNK


def _row_block_for(block: int) -> int:
    return max(rb for rb in (8, 16, 32, 64, 128, 256) if block % rb == 0)


@partial(jax.jit, static_argnames=("block",))
def _block_spmm_ell(ell_cols, ell_vals, x_block, acc, block):
    """acc += ELL gather-reduce of one (dest, src) bucket against the source
    feature block — the round-5 hybrid fast path for the out-of-core engine
    (the einsum reduction over the neighbor axis replaces the XLA scatter;
    same schedule as the single-chip ``ELLAdj.spmm``)."""
    import jax.numpy as jnp

    n_pad, width = ell_cols.shape
    f = x_block.shape[1]
    rb = _row_block_for(block)
    nb = block // rb
    cols_b = ell_cols.reshape(nb, rb, width)
    vals_b = ell_vals.reshape(nb, rb, width)

    def step(carry, inp):
        c, v = inp
        gathered = jnp.take(x_block, c.reshape(-1), axis=0).reshape(
            rb, width, f
        )
        out = jnp.einsum(
            "rw,rwf->rf", v, gathered, preferred_element_type=jnp.float32
        )
        return carry, out

    _, outs = jax.lax.scan(step, None, (cols_b, vals_b))
    return acc + outs.reshape(block, f)


@partial(jax.jit, static_argnames=("block",))
def _block_spmm(rows, cols_local, vals, x_block, acc, block):
    """acc += segment_sum(x_block[cols_local] * vals, rows), scanned over
    _CHUNK-edge slices so the materialized gather stays bounded. Padded
    entries carry val == 0 (any valid index)."""
    n = rows.shape[0]
    if n <= _CHUNK:
        gathered = x_block[cols_local] * vals[:, None]
        return acc + jax.ops.segment_sum(gathered, rows, num_segments=block)
    num = n // _CHUNK

    def step(a, inp):
        r, c, v = inp
        gathered = x_block[c] * v[:, None]
        return a + jax.ops.segment_sum(gathered, r, num_segments=block), None

    out, _ = jax.lax.scan(
        step, acc,
        (rows.reshape(num, _CHUNK), cols_local.reshape(num, _CHUNK),
         vals.reshape(num, _CHUNK)),
    )
    return out


def stage_feature_blocks(
    features_path: str, meta: StreamingGraphMeta, work_dir: str
) -> str:
    """Split the memory-mapped feature matrix into per-block hop-0 files."""
    import numpy as np

    hop0 = osp.join(work_dir, "hop0")
    os.makedirs(hop0, exist_ok=True)
    x = np.load(features_path, mmap_mode="r")
    f = x.shape[1]
    for i in range(meta.num_shards):
        lo = i * meta.block
        hi = min(lo + meta.block, meta.num_nodes)
        blk = np.zeros((meta.block, f), np.float32)
        if lo < meta.num_nodes:
            blk[: hi - lo] = np.asarray(x[lo:hi], np.float32)
        np.save(osp.join(hop0, f"block{i}.npy"), blk)
    return hop0


def outofcore_propagate(
    meta: StreamingGraphMeta,
    features_path: str,
    prop_steps: int,
    work_dir: str,
    verbose: bool = False,
    mode: str = "auto",
    acc_budget_bytes: int = 4 << 30,
    transfer_dtype: str = "float32",
    local_engine: str = "hybrid",
) -> List[str]:
    """Run K hops block-at-a-time; returns the list of per-hop directories
    (``hop0`` … ``hop<K>``), each holding ``num_shards`` block files.

    ``local_engine='hybrid'`` (default, round-5 — VERDICT r4 ask 4) packs
    each (dest, src) bucket into ELL slots + a COO overflow tail once on the
    host and runs the ELL part as a gather+einsum reduce (no XLA scatter);
    only hub-overflow edges take the ``segment_sum`` path.
    ``local_engine='coo'`` keeps the pure segment-sum oracle tier. ELL
    widths and tail pads are quantized to powers of two so the jitted
    block-kernel shape count stays bounded.

    Two schedules:

    - ``dest_outer`` — one [block, F] accumulator + one source block on
      device at a time (O(block·F) device memory, independent of N), but
      every source block is re-read and re-transferred once per destination
      block: host→device volume per hop = ``num_shards · N · F · itemsize``.
    - ``source_outer`` — ALL destination accumulators stay device-resident
      and each source block streams exactly ONCE per hop: host→device volume
      per hop = ``N · F · itemsize`` (``num_shards×`` less), at the cost of
      O(N·F) device memory for the accumulators. This is the
      transfer-optimal schedule whenever the accumulators fit — decisive
      both through slow host↔device links (the ~3-4 MB/s relay here) and on
      PCIe-attached accelerators.

    ``auto`` picks ``source_outer`` when the accumulator set fits
    ``acc_budget_bytes``. ``transfer_dtype="bfloat16"`` ships source blocks
    at half width (accumulation stays f32; hop files on disk stay f32).
    """
    import jax.numpy as jnp

    stage_feature_blocks(features_path, meta, work_dir)
    hop_dirs = [osp.join(work_dir, "hop0")]
    s = meta.num_shards
    block = meta.block

    # host-side one-time: re-bucket each destination shard's edges by source
    # block; store (rows, local cols, vals, bucket offsets)
    buckets = []
    for i in range(s):
        r, c, v = load_shard(meta, i)
        src_blk = c // block
        order = np.argsort(src_blk, kind="stable")
        r, c, v, src_blk = r[order], c[order], v[order], src_blk[order]
        offsets = np.searchsorted(src_blk, np.arange(s + 1))
        buckets.append((r, (c - src_blk * block).astype(np.int32), v, offsets))

    f_dim = int(
        np.load(osp.join(hop_dirs[0], "block0.npy"), mmap_mode="r").shape[1]
    )
    if mode == "auto":
        mode = (
            "source_outer"
            if s * block * f_dim * 4 <= acc_budget_bytes else "dest_outer"
        )
    xfer = jnp.bfloat16 if transfer_dtype == "bfloat16" else jnp.float32

    def load_block(hop_dir: str, j: int):
        blk = np.load(osp.join(hop_dir, f"block{j}.npy"))
        return jnp.asarray(blk, dtype=xfer)

    def padded_bucket(i: int, j: int):
        r, c_local, v, offsets = buckets[i]
        lo, hi = int(offsets[j]), int(offsets[j + 1])
        if hi == lo:
            return None
        n_pad = _pow2_pad(hi - lo)
        rows = np.zeros(n_pad, np.int32)
        cols = np.zeros(n_pad, np.int32)
        vals = np.zeros(n_pad, np.float32)
        rows[: hi - lo] = r[lo:hi]
        cols[: hi - lo] = c_local[lo:hi]
        vals[: hi - lo] = v[lo:hi]
        return jnp.asarray(rows), jnp.asarray(cols), jnp.asarray(vals)

    hybrid_packs: dict = {}

    def hybrid_bucket(i: int, j: int):
        """(ell_cols, ell_vals, tail | None) for bucket (i, j), packed once;
        width = pow2-quantized p95 of the bucket's nonzero row degrees, tail
        pow2-padded — bounded distinct compile shapes."""
        if (i, j) in hybrid_packs:
            return hybrid_packs[(i, j)]
        from ssrg_tpu import native

        r, c_local, v, offsets = buckets[i]
        lo, hi = int(offsets[j]), int(offsets[j + 1])
        if hi == lo:
            hybrid_packs[(i, j)] = None
            return None
        r, c, v = r[lo:hi], c_local[lo:hi], v[lo:hi]
        order = np.lexsort((c, r))
        r, c, v = (r[order].astype(np.int64), c[order].astype(np.int32),
                   v[order].astype(np.float32))
        deg = np.bincount(r, minlength=block)
        nz = deg[deg > 0]
        width = int(np.percentile(nz, 95)) if nz.size else 1
        w = 8
        while w < width:
            w <<= 1
        indptr = np.zeros(block + 1, np.int64)
        np.add.at(indptr, r + 1, 1)
        ec, ev, tr, tc, tv = native.ell_hybrid_pack(
            np.cumsum(indptr), c, v, w, block
        )
        tail = None
        if tr.size:
            t_pad = _pow2_pad(tr.size, floor=1 << 9)
            tr_p = np.zeros(t_pad, np.int32)
            tc_p = np.zeros(t_pad, np.int32)
            tv_p = np.zeros(t_pad, np.float32)
            tr_p[: tr.size], tc_p[: tc.size], tv_p[: tv.size] = tr, tc, tv
            tail = (jnp.asarray(tr_p), jnp.asarray(tc_p), jnp.asarray(tv_p))
        hybrid_packs[(i, j)] = (jnp.asarray(ec), jnp.asarray(ev), tail)
        return hybrid_packs[(i, j)]

    def apply_bucket(i: int, j: int, xj, acc):
        """acc += A[i, j] @ xj with the selected local engine."""
        if local_engine == "hybrid":
            pack = hybrid_bucket(i, j)
            if pack is None:
                return acc
            ec, ev, tail = pack
            acc = _block_spmm_ell(ec, ev, xj, acc, block)
            if tail is not None:
                acc = _block_spmm(*tail, xj, acc, block)
            return acc
        bucket = padded_bucket(i, j)
        if bucket is None:
            return acc
        return _block_spmm(*bucket, xj, acc, block)

    for h in range(prop_steps):
        prev_dir = hop_dirs[-1]
        cur_dir = osp.join(work_dir, f"hop{h + 1}")
        os.makedirs(cur_dir, exist_ok=True)
        if mode == "source_outer":
            accs = [jnp.zeros((block, f_dim), jnp.float32) for _ in range(s)]
            for j in range(s):
                xj = load_block(prev_dir, j)
                for i in range(s):
                    accs[i] = apply_bucket(i, j, xj, accs[i])
            for i in range(s):
                np.save(osp.join(cur_dir, f"block{i}.npy"), np.asarray(accs[i]))
        else:
            for i in range(s):
                acc = jnp.zeros((block, f_dim), jnp.float32)
                for j in range(s):
                    r_i, _, _, offsets = buckets[i]
                    if offsets[j] == offsets[j + 1]:
                        continue  # empty bucket: skip the block transfer
                    xj = load_block(prev_dir, j)
                    acc = apply_bucket(i, j, xj, acc)
                np.save(osp.join(cur_dir, f"block{i}.npy"), np.asarray(acc))
        if verbose:
            print(f"out-of-core hop {h + 1}/{prop_steps} done ({mode})")
        hop_dirs.append(cur_dir)
    return hop_dirs


def load_hop_rows(
    hop_dir: str, meta: StreamingGraphMeta, node_ids: np.ndarray
) -> np.ndarray:
    """Gather specific node rows from a per-block hop directory (memory-
    mapped; for feeding training batches without assembling the full hop)."""
    node_ids = np.asarray(node_ids)
    out = None
    blocks = node_ids // meta.block
    for b in np.unique(blocks):
        blk = np.load(osp.join(hop_dir, f"block{int(b)}.npy"), mmap_mode="r")
        m = blocks == b
        rows = np.asarray(blk[node_ids[m] - b * meta.block])
        if out is None:
            out = np.zeros((node_ids.shape[0], rows.shape[1]), np.float32)
        out[m] = rows
    return out
