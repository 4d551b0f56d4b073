"""SPMD end-to-end training step: distributed propagate + data-parallel head.

One jitted function runs the full precompute-GNN pipeline over a device mesh:

1. ``dist_propagate`` (shard_map): adjacency row blocks x feature row blocks,
   all-gather per hop over the ``graph`` axis (ICI).
2. Hop aggregation + MLP/LogReg head forward/backward: pure GSPMD — node
   rows stay sharded over the same axis, parameters are replicated, and XLA
   inserts the gradient psum automatically from the shardings.
3. optax update on replicated params.

The reference has no distributed path at all (SURVEY.md §2.14); this module
is its TPU-native scaling counterpart and the target of
``__graft_entry__.dryrun_multichip``.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssrg_tpu.parallel.dist_spmm import (
    ShardedAdj,
    ShardedHybridAdj,
    ShardedTiledAdj,
    comm_stats,
    dist_propagate,
    dist_propagate_hybrid,
    dist_propagate_tiled,
    format_bytes,
    shard_adjacency,
    shard_adjacency_hybrid,
    shard_adjacency_tiled,
    shard_features,
)
from ssrg_tpu.parallel.partition import (
    RowPartition,
    cluster_reorder_for_partition,
    partition_rows,
    partition_rows_hybrid,
    partition_rows_tiled,
)
from ssrg_tpu.train.common import make_optimizer


@dataclass
class SPMDTrainContext:
    """Everything needed to run sharded training steps."""

    mesh: Mesh
    adj: Any            # ShardedAdj | ShardedHybridAdj
    x: jax.Array              # [n_pad, F] node-sharded
    y: jax.Array              # [n_pad] node-sharded
    train_mask: jax.Array     # [n_pad] f32 node-sharded (0 on padding)
    params: Any               # replicated
    opt_state: Any
    step_fn: Callable


def build_spmd_context(
    adj_scipy,
    x: np.ndarray,
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
    reorder: Optional[str] = None,
    tile_bf16: bool = False,
) -> SPMDTrainContext:
    """Partition the graph over ``mesh``, initialize replicated params, and
    compile the full sharded train step.

    ``local_engine`` picks the per-shard SpMM layout: ``"hybrid"`` (default,
    round-4) runs the single-chip ELL+COO hybrid per row block inside
    shard_map — ~5× the ``"coo"`` segment-sum path's measured scatter bound
    (docs/PERFORMANCE.md). ``comm="halo"`` (hybrid only) exchanges only the
    precomputed boundary rows via all_to_all instead of all-gathering full X
    (SURVEY.md §7 halo plan); pair it with ``reorder="cluster"`` so shard
    boundaries follow LPA communities and the halo stays small.
    ``local_engine="tiled"`` runs diagonal-block MXU tiles + hybrid rest
    (the flagship locality engine; ``tile_bf16`` stores tiles in bf16 — the
    measured-fastest single-chip storage tier). With
    ``reorder`` set, the context's x/y/mask (and the hop tensor) live in the
    permuted node order — self-consistent for training since labels and mask
    are permuted alike.

    With a 2-D mesh (``data_axis`` set), the propagation phase shards nodes
    over the ``graph`` axis only (adjacency row blocks replicated across the
    data axis), and the dense training phase reshards the hop tensor's node
    dimension over BOTH axes — graph locality for the SpMM, full-mesh data
    parallelism for the MLP, with XLA inserting the redistribution and the
    gradient psum from the sharding annotations alone.
    """
    from ssrg_tpu.logger import get_logger

    if reorder == "cluster":
        adj_scipy, x, y, inverse = cluster_reorder_for_partition(
            adj_scipy, x, y
        )
        train_idx = inverse[np.asarray(train_idx)]
    elif reorder is not None:
        raise ValueError(f"unknown reorder {reorder!r} (use 'cluster')")

    num_graph_shards = mesh.shape[axis]
    if comm not in ("all_gather", "halo"):
        # validate BEFORE the expensive partition/device_put work; note the
        # ring exchange lives in dist_propagate_ring (coo layout), not here
        raise ValueError(
            f"unknown comm {comm!r} (use 'all_gather' or 'halo'; the "
            "ppermute ring is the separate dist_propagate_ring path)"
        )
    if comm == "halo" and local_engine not in ("hybrid", "tiled"):
        raise ValueError("comm='halo' requires local_engine hybrid|tiled")
    if local_engine == "hybrid":
        # 256-row alignment feeds the ELL row-block scan at its production
        # block size; on toy graphs (n < 256·D) it would dump every node into
        # shard 0, so fall back to 8-row alignment there
        n_nodes = adj_scipy.shape[0]
        row_align = 256 if n_nodes >= 256 * num_graph_shards else 8
        part = partition_rows_hybrid(
            adj_scipy, num_graph_shards, halo=(comm == "halo"),
            row_align=row_align,
        )
        sharded_adj = shard_adjacency_hybrid(part, mesh, axis)
    elif local_engine == "tiled":
        # diagonal-block MXU tiles + hybrid rest (the flagship locality
        # engine under the mesh); tile geometry shrinks on toy graphs so
        # every shard still holds rows
        n_nodes = adj_scipy.shape[0]
        big = n_nodes >= 256 * num_graph_shards
        part = partition_rows_tiled(
            adj_scipy, num_graph_shards, halo=(comm == "halo"),
            row_block=256 if big else 8,
            tile_cols=512 if big else 16,
            min_edges_per_tile=48 if big else 4,
        )
        sharded_adj = shard_adjacency_tiled(
            part, mesh, axis,
            dtype=jnp.bfloat16 if tile_bf16 else jnp.float32,
        )
        get_logger().info(
            "tiled local engine: tiled_fraction %.3f (%d tile pairs/shard)",
            part.tiled_fraction, part.starts.shape[1],
        )
    elif local_engine == "coo":
        part = partition_rows(adj_scipy, num_graph_shards)
        sharded_adj = shard_adjacency(part, mesh, axis)
    else:
        raise ValueError(
            f"unknown local_engine {local_engine!r} "
            "(use 'hybrid', 'tiled' or 'coo')"
        )
    xs = shard_features(x, part, mesh, axis)

    # record the analytic ICI volume a real multi-chip run should be
    # validated against (BASELINE.md efficiency target)
    stats = comm_stats(
        num_graph_shards, part.block, x.shape[1], prop_steps,
        mode=comm, halo_pad=getattr(part, "halo_pad", 0),
    )
    halo_note = (
        f", halo {part.halo_pad}/{part.block} rows/shard "
        f"(fraction {part.halo_fraction:.3f})"
        if comm == "halo" else ""
    )
    if comm == "halo" and part.halo_pad >= part.block:
        # halo ships (D-1)·halo_pad rows/device/hop vs all_gather's
        # (D-1)·block — with a saturated plan the "optimization" costs MORE
        get_logger().warning(
            "halo plan saturated (halo_pad %d >= block %d): each shard needs "
            "at least a full block of remote rows per peer, so halo exchange "
            "ships >= the all_gather volume. The graph has no community "
            "structure under the current ordering — use reorder='cluster' "
            "(and a community-structured graph) or comm='all_gather'.",
            part.halo_pad, part.block,
        )
    get_logger().info(
        "spmd comm (%s, local_engine=%s, %d graph shards): %s/device/hop, "
        "%s mesh total per %d-hop propagate, peak feature memory "
        "%s/device%s",
        comm, local_engine, num_graph_shards,
        format_bytes(stats["bytes_per_device_per_hop"]),
        format_bytes(stats["bytes_mesh_total"]),
        prop_steps,
        format_bytes(stats["peak_feature_bytes_per_device"]),
        halo_note,
    )

    n_pad = part.n_pad
    y_pad = np.zeros(n_pad, np.int64)
    y_pad[: y.shape[0]] = y
    mask = np.zeros(n_pad, np.float32)
    mask[train_idx] = 1.0
    train_axes = (axis,) if data_axis is None else (axis, data_axis)
    node_spec = NamedSharding(mesh, P(train_axes))
    y_dev = jax.device_put(y_pad, node_spec)
    mask_dev = jax.device_put(mask, node_spec)
    hops_train_spec = NamedSharding(mesh, P(None, train_axes, None))

    # init params on a tiny local slice (replicated)
    rng = jax.random.PRNGKey(seed)
    example_hops = jnp.zeros((prop_steps + 1, 2, x.shape[1]), jnp.float32)
    variables = module.init({"params": rng, "dropout": rng}, example_hops,
                            train=False)
    params = jax.device_put(
        variables["params"], NamedSharding(mesh, P())
    )
    tx = make_optimizer(lr, weight_decay)
    opt_state = tx.init(params)

    # the sharded adjacency is a jit ARGUMENT (partial-bound), not a closure
    # capture — captured device arrays become HLO constants (slow compiles,
    # remote-compile size limits at papers100M scale)
    propagate_fn = {
        "hybrid": dist_propagate_hybrid,
        "tiled": dist_propagate_tiled,
        "coo": dist_propagate,
    }[local_engine]

    @jax.jit
    def step_fn(adj_arg, params, opt_state, xs, y_dev, mask_dev, dropout_rng):
        hops = propagate_fn(adj_arg, xs, prop_steps)  # [K+1, n_pad, F]
        # reshard node rows across the full mesh for the dense phase
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
        mesh=mesh,
        adj=sharded_adj,
        x=xs,
        y=y_dev,
        train_mask=mask_dev,
        params=params,
        opt_state=opt_state,
        step_fn=partial(step_fn, sharded_adj),
    )


def run_steps(ctx: SPMDTrainContext, num_steps: int, seed: int = 0):
    """Execute sharded train steps; returns (ctx, last_loss).

    ``num_steps == 0`` is a no-op and returns ``nan`` for the loss (there is
    no step to report) rather than crashing on an unassigned value.
    """
    rng = jax.random.PRNGKey(seed)
    loss = None
    for i in range(num_steps):
        rng, step_rng = jax.random.split(rng)
        ctx.params, ctx.opt_state, loss = ctx.step_fn(
            ctx.params, ctx.opt_state, ctx.x, ctx.y, ctx.train_mask, step_rng
        )
    return ctx, (float("nan") if loss is None else float(loss))
