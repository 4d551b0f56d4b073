"""Out-of-core training integration: spool -> block-at-a-time propagate ->
minibatch train over on-disk hop directories (VERDICT next-round item 5).

Hermetic: a small SBM graph is dumped to .npy files; the chain must reach an
accuracy band far above chance, reuse its own artifacts on rerun, and the
batch hop-stacks gathered from disk must equal the in-memory propagation.
"""

import os.path as osp

import numpy as np
import pytest

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.data.synthetic import sbm_graph
from ssrg_tpu.train.common import split_labels
from ssrg_tpu.train.outofcore_task import (
    OutOfCoreNodeClassification,
    ensure_hops,
    ensure_spooled,
    load_meta,
    run_outofcore,
)


@pytest.fixture(scope="module")
def staged(tmp_path_factory):
    root = tmp_path_factory.mktemp("ooc")
    g = sbm_graph(num_node=400, num_classes=4, num_features=32,
                  p_in=0.04, p_out=0.002, feature_signal=1.2, seed=3)
    # single-direction unique pairs, as the streaming loader expects
    pairs = np.unique(
        np.sort(np.stack([g.edge.row, g.edge.col], axis=1), axis=1), axis=0
    )
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    np.save(root / "edges.npy", pairs.T.astype(np.int64))
    np.save(root / "features.npy", g.x.astype(np.float32))
    np.save(root / "labels.npy", np.asarray(g.y, np.int64))
    return str(root), g


def test_run_outofcore_reaches_band(staged):
    root, g = staged
    result = run_outofcore(
        osp.join(root, "edges.npy"),
        osp.join(root, "features.npy"),
        osp.join(root, "labels.npy"),
        osp.join(root, "work"),
        num_shards=3,
        model_cfg=ModelConfig(model_name="sgc", prop_steps=2),
        train_cfg=TrainingConfig(num_epochs=30, lr=0.05, train_batch_size=64,
                                 seed=7),
    )
    # 4-class SBM with strong signal: chance is 0.25
    assert result.best_test > 0.6, result
    assert len(result.hop_dirs) == 3


def test_learnable_aggregator_on_ooc_path(staged):
    """gamlp's learnable hop attention runs per-batch on the hop stack."""
    root, g = staged
    meta = load_meta(osp.join(root, "work"))
    hop_dirs = [osp.join(root, "work", f"hop{h}") for h in range(3)]
    labels = np.load(osp.join(root, "labels.npy"))
    tr, va, te = split_labels(labels, num_val=60, num_test=120, seed=0)
    task = OutOfCoreNodeClassification(
        meta, hop_dirs, labels, tr, va, te,
        ModelConfig(model_name="gamlp", prop_steps=2, hidden_dim=64),
        TrainingConfig(num_epochs=20, lr=0.01, train_batch_size=64, seed=7),
    )
    best_val, best_test = task.execute()
    assert best_test > 0.5, (best_val, best_test)


def test_artifacts_are_reused(staged):
    """Reruns with the same work_dir skip spooling and propagation (the
    hop directories ARE the precompute checkpoint)."""
    root, _ = staged
    work = osp.join(root, "work")
    meta = load_meta(work)
    hop_file = osp.join(work, "hop2", "block0.npy")
    before = osp.getmtime(hop_file)
    meta2 = ensure_spooled(osp.join(root, "edges.npy"), meta.num_nodes,
                           meta.num_shards, work)
    dirs = ensure_hops(meta2, osp.join(root, "features.npy"), 2, work)
    assert osp.getmtime(hop_file) == before
    assert meta2.num_edges == meta.num_edges
    assert len(dirs) == 3


def test_disk_hop_stack_matches_inmemory(staged):
    """load_hop_rows batches equal the in-memory sym-norm propagation."""
    import scipy.sparse as sp

    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.parallel.outofcore import load_hop_rows

    root, g = staged
    work = osp.join(root, "work")
    meta = load_meta(work)
    edges = np.load(osp.join(root, "edges.npy"))
    x = np.load(osp.join(root, "features.npy"))
    n = x.shape[0]
    adj = sp.csr_matrix(
        (np.ones(edges.shape[1]), (edges[0], edges[1])), shape=(n, n)
    )
    adj = adj + adj.T
    adj.data[:] = 1.0
    p = sym_norm(adj, 0.5)
    hops = [x]
    for _ in range(2):
        hops.append(np.asarray(p @ hops[-1], np.float32))
    rng = np.random.default_rng(0)
    batch = rng.choice(n, size=50, replace=False)
    for h in range(3):
        got = load_hop_rows(osp.join(work, f"hop{h}"), meta, batch)
        np.testing.assert_allclose(got, hops[h][batch], rtol=2e-4, atol=2e-5)


def test_ooc_rejects_unsupported_models(staged):
    root, _ = staged
    work = osp.join(root, "work")
    meta = load_meta(work)
    labels = np.load(osp.join(root, "labels.npy"))
    hop_dirs = [osp.join(work, f"hop{h}") for h in range(3)]
    tr, va, te = split_labels(labels, num_val=40, num_test=60, seed=0)
    with pytest.raises(ValueError, match="sym-norm precompute"):
        OutOfCoreNodeClassification(
            meta, hop_dirs, labels, tr, va, te,
            ModelConfig(model_name="gcn", prop_steps=2),
        )


def test_ooc_cli(staged, tmp_path):
    from ssrg_tpu.cli import main

    root, _ = staged
    rc = main([
        "ooc",
        "--edges", osp.join(root, "edges.npy"),
        "--features", osp.join(root, "features.npy"),
        "--labels", osp.join(root, "labels.npy"),
        "--work_dir", str(tmp_path / "work"),
        "--num_shards", "2",
        "--model_name", "ssgc",
        "--prop_steps", "2",
        "--num_epochs", "5",
        "--lr", "0.05",
        "--train_batch_size", "64",
    ])
    assert rc == 0


def test_per_batch_dropout_keys_are_distinct(staged):
    """Regression (round-2 verdict weak #4): every minibatch in an epoch must
    get its OWN dropout key — reusing the epoch key drops the same units for
    all batches."""
    root, g = staged
    work = osp.join(root, "work")
    labels = np.load(osp.join(root, "labels.npy"))
    meta = ensure_spooled(osp.join(root, "edges.npy"), labels.shape[0], 3, work)
    hop_dirs = ensure_hops(meta, osp.join(root, "features.npy"), 2, work)
    tr, va, te = split_labels(labels, num_val=60, num_test=120, seed=0)
    task = OutOfCoreNodeClassification(
        meta, hop_dirs, labels, tr, va, te,
        ModelConfig(model_name="sgc", prop_steps=2),
        TrainingConfig(num_epochs=1, lr=0.05, train_batch_size=32, seed=7),
    )
    task.execute()
    keys = task.epoch0_batch_keys
    assert len(keys) > 1, "fixture must produce multiple train batches"
    assert len(set(keys)) == len(keys), f"duplicate per-batch dropout keys: {keys}"


def test_prefetched_batches_match_direct_gather(staged):
    """The background-thread prefetcher must yield exactly the same stacks,
    indices and weights as direct synchronous gathering."""
    root, g = staged
    work = osp.join(root, "work")
    labels = np.load(osp.join(root, "labels.npy"))
    meta = ensure_spooled(osp.join(root, "edges.npy"), labels.shape[0], 3, work)
    hop_dirs = ensure_hops(meta, osp.join(root, "features.npy"), 2, work)
    tr, va, te = split_labels(labels, num_val=60, num_test=120, seed=0)
    task = OutOfCoreNodeClassification(
        meta, hop_dirs, labels, tr, va, te,
        ModelConfig(model_name="sgc", prop_steps=2),
        TrainingConfig(train_batch_size=32),
    )
    from ssrg_tpu.train.common import batch_iterator
    rng = np.random.default_rng(0)
    batches = list(batch_iterator(tr, 32, rng, shuffle=False))
    got = list(task._prefetched(iter(batches)))
    assert len(got) == len(batches)
    for (stack, b, w), (b0, w0) in zip(got, batches):
        assert np.array_equal(b, b0) and np.array_equal(w, w0)
        np.testing.assert_array_equal(stack, task._stack(b0))


def test_propagate_schedules_agree(staged, tmp_path):
    """source_outer (transfer-optimal) and dest_outer (memory-minimal)
    schedules produce identical hop files; bfloat16 transfer stays within
    half-precision tolerance."""
    from ssrg_tpu.parallel.outofcore import outofcore_propagate

    root, g = staged
    labels = np.load(osp.join(root, "labels.npy"))
    meta = ensure_spooled(osp.join(root, "edges.npy"), labels.shape[0], 3,
                          osp.join(root, "work"))
    feats = osp.join(root, "features.npy")
    d_src = outofcore_propagate(meta, feats, 2, str(tmp_path / "src"),
                                mode="source_outer")
    d_dst = outofcore_propagate(meta, feats, 2, str(tmp_path / "dst"),
                                mode="dest_outer")
    d_bf = outofcore_propagate(meta, feats, 2, str(tmp_path / "bf"),
                               mode="source_outer",
                               transfer_dtype="bfloat16")
    # round-5: the hybrid default must agree with the coo oracle tier
    d_coo = outofcore_propagate(meta, feats, 2, str(tmp_path / "coo"),
                                mode="source_outer", local_engine="coo")
    for h in range(3):
        for i in range(meta.num_shards):
            a = np.load(osp.join(d_src[h], f"block{i}.npy"))
            b = np.load(osp.join(d_dst[h], f"block{i}.npy"))
            np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)
            c = np.load(osp.join(d_bf[h], f"block{i}.npy"))
            np.testing.assert_allclose(c, a, rtol=2e-2, atol=2e-2)
            d = np.load(osp.join(d_coo[h], f"block{i}.npy"))
            np.testing.assert_allclose(d, a, rtol=2e-5, atol=2e-5)
