"""Out-of-core streaming partition vs the in-memory path: the spooled
normalized shards must reproduce sym_norm + partition_rows exactly, and feed
dist_propagate with identical results."""

import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.data.streaming import (
    assemble_row_partition,
    shard_feature_block,
    stream_degrees,
    stream_partition,
)
from ssrg_tpu.ops.normalize import sym_norm
from ssrg_tpu.parallel.dist_spmm import dist_propagate_reference


@pytest.fixture
def staged(tmp_path):
    rng = np.random.default_rng(0)
    n, e = 200, 800
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    keep = src != dst
    # dedupe undirected pairs, keep single direction
    pairs = np.unique(
        np.sort(np.stack([src[keep], dst[keep]], axis=1), axis=1), axis=0
    )
    edges = pairs.T.astype(np.int64)
    x = rng.normal(size=(n, 12)).astype(np.float32)
    np.save(tmp_path / "edges.npy", edges)
    np.save(tmp_path / "features.npy", x)
    return str(tmp_path / "edges.npy"), str(tmp_path / "features.npy"), edges, x, n


def test_stream_degrees_match(staged):
    edges_path, _, edges, _, n = staged
    adj = sp.csr_matrix(
        (np.ones(edges.shape[1]), (edges[0], edges[1])), shape=(n, n)
    )
    adj = adj + adj.T
    expected = np.asarray(adj.sum(axis=1)).reshape(-1) + 1.0
    got = stream_degrees(edges_path, n, chunk_edges=100)
    np.testing.assert_allclose(got, expected)


def test_stream_partition_matches_inmemory(staged, tmp_path):
    edges_path, feat_path, edges, x, n = staged
    num_shards = 4
    meta = stream_partition(
        edges_path, n, num_shards, str(tmp_path / "spool"), chunk_edges=128
    )
    part = assemble_row_partition(meta)

    # in-memory oracle: sym_norm of the symmetric adjacency
    adj = sp.csr_matrix(
        (np.ones(edges.shape[1]), (edges[0], edges[1])), shape=(n, n)
    )
    adj = ((adj + adj.T) > 0).astype(np.float64)
    expected_norm = sym_norm(adj, 0.5)

    # stitch streamed partition back to a matrix
    d_idx = np.arange(meta.num_shards)[:, None]
    rows_g = (part.rows + d_idx * part.block).reshape(-1)
    cols_g = part.cols.reshape(-1)
    vals_g = part.vals.reshape(-1)
    nz = vals_g != 0
    got = sp.csr_matrix(
        (vals_g[nz], (rows_g[nz], cols_g[nz])), shape=(meta.num_shards * part.block,) * 2
    )[:n, :n]
    np.testing.assert_allclose(
        got.toarray(), expected_norm.toarray(), rtol=1e-5, atol=1e-6
    )

    # propagation through the streamed partition matches scipy
    hops = dist_propagate_reference(part, x, 2)
    direct = [x]
    for _ in range(2):
        direct.append((expected_norm @ direct[-1]).astype(np.float32))
    for i in range(3):
        np.testing.assert_allclose(
            hops[i][:n], direct[i], rtol=2e-4, atol=2e-4
        )


def test_shard_feature_block(staged, tmp_path):
    edges_path, feat_path, _, x, n = staged
    meta = stream_partition(edges_path, n, 4, str(tmp_path / "spool2"))
    blk = shard_feature_block(feat_path, meta, 0)
    assert blk.shape == (meta.block, x.shape[1])
    np.testing.assert_allclose(blk[: meta.block], x[: meta.block])
    last = shard_feature_block(feat_path, meta, 3)
    hi = n - 3 * meta.block
    np.testing.assert_allclose(last[:hi], x[3 * meta.block:])
    np.testing.assert_allclose(last[hi:], 0.0)


def test_streamed_partition_feeds_device_dist_propagate(staged, tmp_path):
    """Full out-of-core chain on DEVICE: stream_partition spools ->
    shard_adjacency over a 4-device mesh -> dist_propagate == scipy."""
    import jax

    from ssrg_tpu.parallel.dist_spmm import dist_propagate, shard_adjacency, shard_features
    from ssrg_tpu.parallel.mesh import make_mesh

    edges_path, feat_path, edges, x, n = staged
    meta = stream_partition(
        edges_path, n, 4, str(tmp_path / "spool3"), chunk_edges=128
    )
    part = assemble_row_partition(meta)
    mesh = make_mesh((4,), ("graph",), jax.devices()[:4])
    adj_dev = shard_adjacency(part, mesh)
    xs = shard_features(x, part, mesh)
    hops = np.asarray(dist_propagate(adj_dev, xs, 2))

    adj = sp.csr_matrix(
        (np.ones(edges.shape[1]), (edges[0], edges[1])), shape=(n, n)
    )
    adj = ((adj + adj.T) > 0).astype(np.float64)
    norm = sym_norm(adj, 0.5)
    direct = [x]
    for _ in range(2):
        direct.append((norm @ direct[-1]).astype(np.float32))
    for i in range(3):
        np.testing.assert_allclose(hops[i][:n], direct[i], rtol=2e-4, atol=2e-4)


def test_outofcore_propagate_matches_scipy(staged, tmp_path):
    """Block-at-a-time disk propagation == scipy, and hop-row gathers work."""
    from ssrg_tpu.parallel.outofcore import load_hop_rows, outofcore_propagate

    edges_path, feat_path, edges, x, n = staged
    meta = stream_partition(
        edges_path, n, 4, str(tmp_path / "spool_ooc"), chunk_edges=128
    )
    hop_dirs = outofcore_propagate(
        meta, feat_path, 3, str(tmp_path / "ooc_work")
    )
    assert len(hop_dirs) == 4

    adj = sp.csr_matrix(
        (np.ones(edges.shape[1]), (edges[0], edges[1])), shape=(n, n)
    )
    adj = ((adj + adj.T) > 0).astype(np.float64)
    norm = sym_norm(adj, 0.5)
    expected = x
    for h, d in enumerate(hop_dirs):
        got = load_hop_rows(d, meta, np.arange(n))
        np.testing.assert_allclose(got, expected, rtol=3e-4, atol=3e-4)
        expected = (norm @ expected).astype(np.float32)

    # random-batch gather (training feed path)
    ids = np.asarray([0, 5, n - 1, 42, n // 2])
    got = load_hop_rows(hop_dirs[2], meta, ids)
    full = load_hop_rows(hop_dirs[2], meta, np.arange(n))
    np.testing.assert_allclose(got, full[ids])
