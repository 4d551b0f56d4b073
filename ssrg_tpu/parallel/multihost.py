"""Multi-host bootstrap: per-host shard loading into the SPMD train step.

The reference is strictly single-process (SURVEY.md §2.14: no collectives,
no torch.distributed); this module is the missing rung of the TPU scaling
ladder (SURVEY.md §7 step 10): run the SAME ``dist_train.build_spmd_context``
program across N hosts of a pod slice, where every host

1. calls :func:`initialize_multihost` (``jax.distributed.initialize``) so all
   chips join one global runtime,
2. loads ONLY the adjacency shards / feature row blocks its local devices
   own (``data.streaming.load_shard`` / ``shard_feature_block`` — the spool
   directory layout is host-shardable by construction), and
3. stitches them into global sharded arrays with
   ``jax.make_array_from_single_device_arrays``; the jitted step is ordinary
   SPMD from there (collectives ride ICI within a host, DCN across hosts).

Single-process remains a degenerate case of every entry point — the module
is exercised on the CPU fake-multi-device harness single-process, and by an
actual 2-process CPU run in ``tests/test_multihost.py``; see
``docs/SCALING.md`` for the v5p-16 recipe.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssrg_tpu.data.streaming import (
    StreamingGraphMeta,
    load_shard,
    load_spool_fast_meta,
    load_spool_halo_cols,
    shard_feature_block,
)
from ssrg_tpu.parallel.dist_spmm import ShardedAdj, ShardedHybridAdj
from ssrg_tpu.parallel.partition import (
    _build_halo_plan,
    _remap_cols,
    _round_up,
)


def initialize_multihost(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Sequence[int]] = None,
) -> bool:
    """Join (or skip joining) the global JAX runtime.

    Returns True when a multi-process runtime is active after the call.
    No-ops when already initialized, and treats the fully-unspecified
    single-host case (no coordinator, no env-var cluster config) as
    single-process rather than erroring — so entry points can call this
    unconditionally.

    On a real TPU pod slice the arguments may all be None
    (``jax.distributed.initialize`` auto-detects via the TPU metadata
    service); on CPU/GPU clusters pass them explicitly or via the
    JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID env vars.
    """
    # must not touch the backend (jax.devices/process_count initialize it,
    # after which jax.distributed.initialize raises)
    if jax.distributed.is_initialized():
        return jax.process_count() > 1
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes in (None, 1):
        return False  # plain single-host run
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return jax.process_count() > 1


def global_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("graph",),
) -> Mesh:
    """A mesh over ALL devices in the (possibly multi-process) runtime.

    ``jax.devices()`` is global after ``jax.distributed.initialize``; the
    mesh is therefore identical on every host, which is what SPMD requires.
    """
    from ssrg_tpu.parallel.mesh import make_mesh

    return make_mesh(shape=shape, axis_names=axis_names, devices=jax.devices())


def _from_per_device(global_shape, sharding: NamedSharding, make_local):
    """Assemble a global array from per-addressable-device host buffers.

    ``make_local(start_row, rows)`` returns the numpy block for the axis-0
    range ``[start_row, start_row + rows)``. Blocks are cached so devices
    that share a block (replication over other mesh axes) load it once.
    """
    devices = sharding.addressable_devices
    cache = {}
    arrays = []
    for d in devices:
        idx = sharding.addressable_devices_indices_map(tuple(global_shape))[d]
        sl = idx[0]
        start = 0 if sl.start is None else int(sl.start)
        stop = global_shape[0] if sl.stop is None else int(sl.stop)
        if start not in cache:
            cache[start] = make_local(start, stop - start)
        arrays.append(jax.device_put(cache[start], d))
    return jax.make_array_from_single_device_arrays(
        tuple(global_shape), sharding, arrays
    )


def spool_nnz_pad(meta: StreamingGraphMeta, align: int = 512) -> int:
    """Globally-agreed padded nnz per shard: a pure function of the spool
    file sizes, so every host computes the same value without communication
    (spool metadata must be visible to all hosts — shared FS or replicated
    spool dirs)."""
    import os.path as osp

    sizes = [
        osp.getsize(osp.join(meta.spool_dir, f"shard_{d}.bin")) // 12
        for d in range(meta.num_shards)
    ]
    return _round_up(max(max(sizes), 1), align)


def shard_adjacency_from_spool(
    meta: StreamingGraphMeta, mesh: Mesh, axis: str = "graph"
) -> ShardedAdj:
    """Build the device-resident ShardedAdj loading ONLY this host's shards.

    Requires ``meta.num_shards == mesh.shape[axis]`` (one adjacency row block
    per graph-axis position; blocks are replicated over any other axes).
    """
    d_axis = mesh.shape[axis]
    if meta.num_shards != d_axis:
        raise ValueError(
            f"spool has {meta.num_shards} shards but mesh axis {axis!r} "
            f"has size {d_axis}; re-spool with num_shards={d_axis}"
        )
    nnz_pad = spool_nnz_pad(meta)
    spec = NamedSharding(mesh, P(axis, None))
    shape = (d_axis, nnz_pad)
    loaded = {}

    def make(field):
        def make_local(start, rows):
            assert rows == 1, "one adjacency shard per graph-axis position"
            if start not in loaded:
                r, c, v = load_shard(meta, start, nnz_pad)
                loaded[start] = {"rows": r, "cols": c, "vals": v}
            return loaded[start][field][None, :]

        return _from_per_device(shape, spec, make_local)

    return ShardedAdj(
        rows=make("rows"), cols=make("cols"), vals=make("vals"),
        mesh=mesh, axis=axis, block=meta.block, n=meta.num_nodes,
    )


def shard_adjacency_hybrid_from_spool(
    meta: StreamingGraphMeta,
    mesh: Mesh,
    axis: str = "graph",
    comm: str = "all_gather",
    lane_pad: int = 8,
    tail_chunk: int = 1 << 19,
) -> ShardedHybridAdj:
    """Per-host FAST layout from the spools (round-5, VERDICT r4 Missing
    #1): each host loads ONLY its own shards' edges and packs them into the
    same stacked ELL+COO hybrid layout ``partition_rows_hybrid`` builds
    in-memory — the ~5× faster local engine — using the globally-agreed
    geometry (`fast_meta.json`) and, with ``comm='halo'``, the static halo
    plan recomputed identically on every host from the tiny per-shard
    ``halo_<d>.npy`` column lists (no communication).

    Reference analog: the reference pairs its fastest local kernel with its
    transfer mechanism at every scale it supports
    (``operators/csrc/cudamatmul.c:50-74``)."""
    import scipy.sparse as sp

    from ssrg_tpu import native

    d_axis = mesh.shape[axis]
    if meta.num_shards != d_axis:
        raise ValueError(
            f"spool has {meta.num_shards} shards but mesh axis {axis!r} "
            f"has size {d_axis}; re-spool with num_shards={d_axis}"
        )
    if comm not in ("all_gather", "halo"):
        raise ValueError(f"unknown comm {comm!r} (use 'all_gather' or 'halo')")
    num_shards = meta.num_shards
    block = meta.block
    fast = load_spool_fast_meta(meta)
    width = int(fast["width"])

    halo = comm == "halo"
    send_idx = None
    halo_pad = 0
    col_maps: list = [None] * num_shards
    if halo:
        send_idx, halo_pad, _, col_maps = _build_halo_plan(
            load_spool_halo_cols(meta), num_shards, block, lane_pad
        )

    # globally-agreed tail geometry (same chunk-align rule as
    # partition_rows_hybrid; tail sizes are upper bounds — CSR coalescing
    # can only shrink a row's overflow)
    max_tail = max(max(int(t) for t in fast["tail_sizes"]), 1)
    if max_tail <= tail_chunk:
        tail_chunk = max(_round_up(max_tail, 512), 512)
        tail_pad = tail_chunk
    else:
        num_chunks = -(-max_tail // tail_chunk)
        tail_chunk = _round_up(-(-max_tail // num_chunks), 512)
        tail_pad = num_chunks * tail_chunk

    packed: dict = {}

    def pack(shard: int) -> dict:
        if shard in packed:
            return packed[shard]
        r, c, v = load_shard(meta, shard)
        cols = c.astype(np.int64)
        if halo:
            cols = _remap_cols(cols, shard, block, col_maps[shard]).astype(
                np.int64
            )
        ncols = max(int(cols.max()) + 1, 1) if cols.size else 1
        csr = sp.csr_matrix(
            (v.astype(np.float32), (r.astype(np.int64), cols)),
            shape=(block, ncols),
        )
        ec, ev, tr, tc, tv = native.ell_hybrid_pack(
            csr.indptr, csr.indices, csr.data, width, block
        )
        if tr.size > tail_pad:
            raise AssertionError(
                f"shard {shard} tail {tr.size} exceeds agreed pad {tail_pad}"
            )
        tr_p = np.zeros(tail_pad, np.int32)
        tc_p = np.zeros(tail_pad, np.int32)
        tv_p = np.zeros(tail_pad, np.float32)
        tr_p[: tr.size], tc_p[: tc.size], tv_p[: tv.size] = tr, tc, tv
        packed[shard] = {
            "ell_cols": ec, "ell_vals": ev,
            "tail_rows": tr_p, "tail_cols": tc_p, "tail_vals": tv_p,
        }
        return packed[shard]

    s2 = NamedSharding(mesh, P(axis, None))
    s3 = NamedSharding(mesh, P(axis, None, None))

    def make(field, shape, spec):
        def make_local(start, rows):
            assert rows == 1, "one adjacency shard per graph-axis position"
            return pack(start)[field][None]

        return _from_per_device(shape, spec, make_local)

    send_arr = None
    if halo:
        def make_send(start, rows):
            assert rows == 1
            return send_idx[start][None]

        send_arr = _from_per_device(
            (num_shards, num_shards, halo_pad),
            s3, make_send,
        )

    return ShardedHybridAdj(
        ell_cols=make("ell_cols", (num_shards, block, width), s3),
        ell_vals=make("ell_vals", (num_shards, block, width), s3),
        tail_rows=make("tail_rows", (num_shards, tail_pad), s2),
        tail_cols=make("tail_cols", (num_shards, tail_pad), s2),
        tail_vals=make("tail_vals", (num_shards, tail_pad), s2),
        send_idx=send_arr,
        mesh=mesh, axis=axis, block=block, n=meta.num_nodes,
        width=width, tail_chunk=tail_chunk, halo_pad=halo_pad,
    )


def shard_features_from_file(
    features_path: str, meta: StreamingGraphMeta, mesh: Mesh,
    axis: str = "graph",
) -> jax.Array:
    """Global [n_pad, F] feature array where each host memory-maps only its
    own row blocks from disk."""
    f_dim = int(np.load(features_path, mmap_mode="r").shape[1])
    n_pad = meta.block * meta.num_shards
    spec = NamedSharding(mesh, P(axis, None))

    def make_local(start, rows):
        shard = start // meta.block
        blk = shard_feature_block(features_path, meta, shard)
        return blk[: rows]

    return _from_per_device((n_pad, f_dim), spec, make_local)


def shard_node_values(
    values: np.ndarray, meta: StreamingGraphMeta, mesh: Mesh,
    axes: Sequence[str] = ("graph",),
) -> jax.Array:
    """Shard a per-node vector (labels, masks) over the given mesh axes,
    zero-padded to n_pad. ``values`` may be a memory map; only this host's
    slices are materialized."""
    values = np.asarray(values) if not isinstance(values, np.memmap) else values
    n_pad = meta.block * meta.num_shards
    spec = NamedSharding(mesh, P(tuple(axes)))

    def make_local(start, rows):
        out = np.zeros((rows,), np.asarray(values[:1]).dtype)
        hi = min(start + rows, values.shape[0])
        if start < hi:
            out[: hi - start] = values[start:hi]
        return out

    return _from_per_device((n_pad,), spec, make_local)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a (host-identical) pytree across every device of the mesh.

    All hosts must hold byte-identical values (e.g. params initialized from
    the same PRNG seed) — the global array is assembled from each host's
    local copies without communication.
    """
    spec = NamedSharding(mesh, P())

    def one(x):
        x = np.asarray(x)
        arrays = [jax.device_put(x, d) for d in spec.addressable_devices]
        return jax.make_array_from_single_device_arrays(x.shape, spec, arrays)

    return jax.tree_util.tree_map(one, tree)


def build_spmd_context_from_spool(
    meta: StreamingGraphMeta,
    features_path: str,
    y: np.ndarray,
    train_idx: np.ndarray,
    module,
    mesh: Mesh,
    prop_steps: int,
    lr: float = 1e-2,
    weight_decay: float = 1e-5,
    axis: str = "graph",
    data_axis: Optional[str] = None,
    seed: int = 0,
    local_engine: str = "hybrid",
    comm: str = "all_gather",
    val_idx: Optional[np.ndarray] = None,
    test_idx: Optional[np.ndarray] = None,
):
    """Multi-host twin of ``dist_train.build_spmd_context``: identical jitted
    functions (full step, hop precompute, epoch-scan trainer with
    best-val→test eval), but every array is assembled from per-host loads of
    the streaming partitioner's artifacts instead of from an in-memory scipy
    matrix.

    ``local_engine='hybrid'`` (default, round-5) packs each host's shards
    into the fast ELL+COO layout and runs ``dist_propagate_hybrid``;
    ``comm='halo'`` additionally exchanges only the planned boundary rows —
    both previously exclusive to the in-memory path while this (the only
    path papers100M can take) hardcoded the ~40 M edges/s scatter-bound coo
    engine (VERDICT r4 Missing #1). ``local_engine='coo'`` keeps the raw
    segment-sum layout as the oracle tier.

    Run the same call on every process; collectives are inserted by XLA from
    the shardings (ICI within hosts, DCN across — see docs/SCALING.md).
    """
    from functools import partial

    from ssrg_tpu.parallel.dist_train import (
        PROPAGATE_FNS, SPMDTrainContext, _build_fns,
    )
    from ssrg_tpu.train.common import make_optimizer

    if local_engine == "hybrid":
        adj = shard_adjacency_hybrid_from_spool(meta, mesh, axis, comm=comm)
    elif local_engine == "coo":
        if comm != "all_gather":
            raise ValueError("local_engine='coo' supports comm='all_gather'")
        adj = shard_adjacency_from_spool(meta, mesh, axis)
    else:
        raise ValueError(
            f"unknown local_engine {local_engine!r} (use 'hybrid' or 'coo')"
        )
    xs = shard_features_from_file(features_path, meta, mesh, axis)
    f_dim = xs.shape[1]

    train_axes = (axis,) if data_axis is None else (axis, data_axis)
    n_pad = meta.block * meta.num_shards

    def idx_mask(idx):
        if idx is None:
            return None
        m = np.zeros(n_pad, np.float32)
        m[np.asarray(idx)] = 1.0
        return shard_node_values(m, meta, mesh, train_axes)

    y_pad = np.zeros(n_pad, np.int64)
    y_arr = np.asarray(y, np.int64)
    y_pad[: y_arr.shape[0]] = y_arr
    y_dev = shard_node_values(y_pad, meta, mesh, train_axes)
    mask_dev = idx_mask(train_idx)
    val_mask_dev = idx_mask(val_idx)
    test_mask_dev = idx_mask(test_idx)
    hops_train_spec = NamedSharding(mesh, P(None, train_axes, None))

    example_hops = jnp.zeros((prop_steps + 1, 2, f_dim), jnp.float32)
    tx = make_optimizer(lr, weight_decay)

    def init_fn(s: int):
        rng = jax.random.PRNGKey(s)
        variables = module.init(
            {"params": rng, "dropout": rng}, example_hops, train=False
        )
        # every host initializes from the same seed => byte-identical values;
        # replicate() assembles the global array without communication
        p = replicate(variables["params"], mesh)
        return p, replicate(tx.init(variables["params"]), mesh)

    params, opt_state = init_fn(seed)
    step_fn, precompute_fn, scan_fn, eval_fn = _build_fns(
        module, tx, PROPAGATE_FNS[local_engine], prop_steps, hops_train_spec
    )

    return SPMDTrainContext(
        mesh=mesh, adj=adj, x=xs, y=y_dev, train_mask=mask_dev,
        params=params, opt_state=opt_state,
        step_fn=partial(step_fn, adj),
        val_mask=val_mask_dev, test_mask=test_mask_dev,
        precompute_fn=precompute_fn, scan_fn=scan_fn, eval_fn=eval_fn,
        init_fn=init_fn,
    )
