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
    shard_feature_block,
)
from ssrg_tpu.parallel.dist_spmm import ShardedAdj
from ssrg_tpu.parallel.partition import _round_up


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
):
    """Multi-host twin of ``dist_train.build_spmd_context``: identical jitted
    step, but every array is assembled from per-host loads of the streaming
    partitioner's artifacts instead of from an in-memory scipy matrix.

    Run the same call on every process; collectives are inserted by XLA from
    the shardings (ICI within hosts, DCN across — see docs/SCALING.md).
    """
    import optax
    from functools import partial

    from ssrg_tpu.parallel.dist_spmm import dist_propagate
    from ssrg_tpu.parallel.dist_train import SPMDTrainContext
    from ssrg_tpu.train.common import make_optimizer

    adj = shard_adjacency_from_spool(meta, mesh, axis)
    xs = shard_features_from_file(features_path, meta, mesh, axis)
    f_dim = xs.shape[1]

    train_axes = (axis,) if data_axis is None else (axis, data_axis)
    y_pad = np.zeros(meta.block * meta.num_shards, np.int64)
    y_arr = np.asarray(y, np.int64)
    y_pad[: y_arr.shape[0]] = y_arr
    mask = np.zeros(meta.block * meta.num_shards, np.float32)
    mask[np.asarray(train_idx)] = 1.0
    y_dev = shard_node_values(y_pad, meta, mesh, train_axes)
    mask_dev = shard_node_values(mask, meta, mesh, train_axes)
    hops_train_spec = NamedSharding(mesh, P(None, train_axes, None))

    rng = jax.random.PRNGKey(seed)
    example_hops = jnp.zeros((prop_steps + 1, 2, f_dim), jnp.float32)
    variables = module.init({"params": rng, "dropout": rng}, example_hops,
                            train=False)
    params = replicate(variables["params"], mesh)
    tx = make_optimizer(lr, weight_decay)
    opt_state = replicate(tx.init(variables["params"]), mesh)

    @jax.jit
    def step_fn(adj_arg, params, opt_state, xs, y_dev, mask_dev, dropout_rng):
        hops = dist_propagate(adj_arg, xs, prop_steps)
        hops = jax.lax.with_sharding_constraint(hops, hops_train_spec)

        def loss_fn(p):
            logits = module.apply(
                {"params": p}, hops, train=True, rngs={"dropout": dropout_rng}
            )
            losses = optax.softmax_cross_entropy_with_integer_labels(
                logits, y_dev
            )
            return (losses * mask_dev).sum() / jnp.maximum(mask_dev.sum(), 1.0)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return SPMDTrainContext(
        mesh=mesh, adj=adj, x=xs, y=y_dev, train_mask=mask_dev,
        params=params, opt_state=opt_state,
        step_fn=partial(step_fn, adj),
    )
