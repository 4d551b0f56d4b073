"""End-to-end training: the full L0–L7 slice on a hermetic SBM dataset
(SURVEY.md §4(d) — accuracy-band tests; §7 step 6 minimum slice).

An SBM community graph with class-correlated features is separable by
spectral precompute models; each model must clearly beat chance and reach a
high accuracy band within a modest epoch budget."""

import numpy as np
import pytest

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.data.synthetic import planetoid_like
from ssrg_tpu.models.zoo import load_model
from ssrg_tpu.train.node_classification import NodeClassification


@pytest.fixture(scope="module")
def dataset():
    return planetoid_like(num_node=800, num_classes=4, num_features=48, seed=0)


def _run(dataset, model_name, epochs=120, **model_kwargs):
    model_cfg = ModelConfig(
        model_name=model_name, hidden_dim=64, prop_steps=3, num_layers=2,
        **model_kwargs,
    )
    train_cfg = TrainingConfig(num_epochs=epochs, normalize_times=1, seed=7, lr=0.01)
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, model_cfg, train_cfg)
    return task.best_val, task.best_test


@pytest.mark.parametrize("model_name", ["sgc", "ssgc", "gbp", "nafs"])
def test_precomputed_models_learn(dataset, model_name):
    val, test = _run(dataset, model_name)
    assert test > 0.75, f"{model_name}: test acc {test:.3f}"


@pytest.mark.parametrize("model_name", ["sign", "gamlp"])
def test_learnable_aggregation_models_learn(dataset, model_name):
    val, test = _run(dataset, model_name, dropout=0.3)
    assert test > 0.75, f"{model_name}: test acc {test:.3f}"


def test_gcn_learns(dataset):
    val, test = _run(dataset, "gcn", epochs=150, dropout=0.3)
    assert test > 0.70, f"gcn: test acc {test:.3f}"


def test_minibatch_matches_protocol(dataset):
    model_cfg = ModelConfig(model_name="sgc", prop_steps=3)
    train_cfg = TrainingConfig(
        num_epochs=40, normalize_times=1, train_batch_size=64, seed=7, lr=0.01
    )
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, model_cfg, train_cfg)
    assert task.best_test > 0.7


def test_normalize_times_statistics(dataset):
    model_cfg = ModelConfig(model_name="sgc", prop_steps=2)
    train_cfg = TrainingConfig(num_epochs=30, normalize_times=3, seed=7, lr=0.01)
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, model_cfg, train_cfg)
    assert len(task.record["test_acc"]) == 3
    assert np.std(task.record["test_acc"]) < 0.2


def test_postprocess_label_propagation(dataset):
    model_cfg = ModelConfig(model_name="sgc", prop_steps=2)
    train_cfg = TrainingConfig(num_epochs=40, normalize_times=1, seed=7, lr=0.01)
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = NodeClassification(
        dataset, spec, model_cfg, train_cfg, post_graph_op="sym", post_msg_aggr="mean"
    )
    assert task.best_test > 0.7


def test_directed_operator_models_learn():
    """magnet / two_dir / two_order zoo members on a directed-signal graph:
    direction encodes class info, so models using directed operators must
    beat chance clearly."""
    import numpy as np
    import scipy.sparse as sp

    from ssrg_tpu.data.graph import Graph
    from ssrg_tpu.data.synthetic import InMemoryDataset

    rng = np.random.default_rng(3)
    n, f, c = 400, 24, 3
    y = rng.integers(0, c, n)
    src = rng.integers(0, n, 4000)
    dst = rng.integers(0, n, 4000)
    keep = ((y[src] + 1) % c == y[dst]) | (rng.uniform(size=4000) < 0.1)
    src, dst = src[keep], dst[keep]
    x = (rng.normal(size=(c, f))[y] + rng.normal(size=(n, f))).astype(np.float32)
    g = Graph(src, dst, np.ones(src.shape[0], np.float32), n, "UUU",
              x=x, y=y, symmetrize=False)
    perm = rng.permutation(n)
    ds = InMemoryDataset(g, perm[:200], perm[200:300], perm[300:],
                         name="directed")

    # two_order's pi-symmetrization keeps less of the pure-direction signal
    # than the magnetic phase / in-out split, hence the lower band (chance
    # is 0.33)
    for name, thresh in (("magnet", 0.6), ("two_dir", 0.6), ("two_order", 0.45)):
        model_cfg = ModelConfig(model_name=name, hidden_dim=32, prop_steps=2,
                                num_layers=2, dropout=0.1, q=0.1)
        train_cfg = TrainingConfig(num_epochs=120, lr=0.01, seed=5)
        spec = load_model(model_cfg, ds.num_features, ds.num_classes)
        task = NodeClassification(ds, spec, model_cfg, train_cfg)
        assert task.best_test > thresh, f"{name}: {task.best_test:.3f}"


def test_bfloat16_head_trains(dataset):
    """Mixed precision: bf16 head compute with f32 params still learns."""
    model_cfg = ModelConfig(model_name="gbp", hidden_dim=64, prop_steps=3,
                            num_layers=2, dtype="bfloat16")
    train_cfg = TrainingConfig(num_epochs=100, lr=0.01, seed=7)
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, model_cfg, train_cfg)
    assert task.best_test > 0.75, f"bf16 gbp: {task.best_test:.3f}"


def test_batched_eval_matches_full_eval(dataset):
    """eval_batch_size path must give identical accuracy to full eval."""
    model_cfg = ModelConfig(model_name="sgc", prop_steps=2)
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    t_full = NodeClassification(
        dataset, spec, model_cfg,
        TrainingConfig(num_epochs=20, lr=0.01, seed=3),
    )
    t_batched = NodeClassification(
        dataset, spec, model_cfg,
        TrainingConfig(num_epochs=20, lr=0.01, seed=3, eval_batch_size=77),
    )
    assert abs(t_full.best_val - t_batched.best_val) < 1e-6
    assert abs(t_full.best_test - t_batched.best_test) < 1e-6


def test_reorder_banded_engine_trains(dataset):
    """spmm_engine='reorder_banded': RCM + banded MXU precompute, un-permuted
    hops; must reach the same accuracy band as the default engine."""
    mc = ModelConfig(model_name="sgc", prop_steps=3)
    tc = TrainingConfig(num_epochs=60, lr=0.05, spmm_engine="reorder_banded")
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    assert task.best_test > 0.85


def test_reorder_banded_matches_default_hops():
    import jax.numpy as jnp
    import numpy as np

    from ssrg_tpu.data.synthetic import sbm_graph
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.propagate import propagate
    from ssrg_tpu.ops.reorder import apply_permutation, reorder_permutation
    from ssrg_tpu.ops.sparse import build_banded, device_adjacency

    g = sbm_graph(500, 5, 16, seed=3)
    adj = sym_norm(g.adj, 0.5)
    ref = np.asarray(propagate(device_adjacency(adj, "coo"), g.x, 3))
    perm = reorder_permutation(adj, "rcm")
    adj_p, x_p, _, inverse = apply_permutation(adj, perm, g.x)
    hops_p = propagate(build_banded(adj_p, row_block=64), x_p, 3)
    hops = np.asarray(jnp.take(hops_p, jnp.asarray(inverse), axis=1))
    np.testing.assert_allclose(hops, ref, rtol=2e-4, atol=2e-4)


def test_scan_epochs_trainer_matches_band(dataset):
    """scan_epochs=True runs all epochs in one jitted lax.scan; same
    best-val protocol, same accuracy band, device-side best tracking."""
    mc = ModelConfig(model_name="sgc", prop_steps=3)
    tc = TrainingConfig(num_epochs=80, lr=0.05, scan_epochs=True)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    assert task.best_test > 0.85


def test_scan_epochs_gamlp_learnable_agg(dataset):
    mc = ModelConfig(model_name="gamlp", prop_steps=3, hidden_dim=64,
                     num_layers=2)
    tc = TrainingConfig(num_epochs=80, lr=0.01, scan_epochs=True)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    assert task.best_test > 0.85


def test_scan_epochs_checkpoints_best_params(dataset, tmp_path):
    ckpt = str(tmp_path / "best.ckpt")
    mc = ModelConfig(model_name="sgc", prop_steps=3)
    tc = TrainingConfig(num_epochs=40, lr=0.05, scan_epochs=True,
                        checkpoint_path=ckpt)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    from ssrg_tpu.cache import load_metadata

    meta = load_metadata(ckpt)
    assert meta["val_acc"] == task.best_val
    assert meta["epoch"] >= 1


def test_scan_epochs_naive_gcn_full_graph(dataset):
    mc = ModelConfig(model_name="gcn", hidden_dim=64)
    tc = TrainingConfig(num_epochs=80, lr=0.01, scan_epochs=True)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    assert task.best_test > 0.7


def test_reorder_tiled_engine_trains(dataset):
    """spmm_engine='reorder_tiled': LPA cluster reorder + tiled MXU
    precompute, un-permuted hops; same accuracy band as the default."""
    mc = ModelConfig(model_name="sgc", prop_steps=3)
    tc = TrainingConfig(num_epochs=60, lr=0.05, spmm_engine="reorder_tiled")
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    assert task.best_test > 0.85


def test_reorder_tiled_prepare_matches_default_hops(dataset):
    """Full meta-engine path through prepare(): the un-permuted hop stack
    must equal the hybrid-engine hop stack exactly (same adjacency math,
    different storage + node order)."""
    from ssrg_tpu.train.node_classification import prepare

    mc = ModelConfig(model_name="gamlp", prop_steps=3)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    ref = prepare(spec, dataset, mc, TrainingConfig(spmm_engine="hybrid"))
    got = prepare(spec, dataset, mc, TrainingConfig(spmm_engine="reorder_tiled"))
    assert ref.hops_layout and got.hops_layout
    np.testing.assert_allclose(
        np.asarray(got.inputs), np.asarray(ref.inputs), rtol=2e-4, atol=2e-4
    )


def test_reorder_tiled_bf16_tier_trains(dataset):
    """spmm_bf16=True: half-precision dense-block storage (the measured
    1.135 B edges/s tier on TPU) must stay inside the accuracy band."""
    mc = ModelConfig(model_name="sgc", prop_steps=3)
    tc = TrainingConfig(num_epochs=60, lr=0.05, spmm_engine="reorder_tiled",
                        spmm_bf16=True)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    assert task.best_test > 0.85


def test_reorder_banded_bf16_tier_matches_f32_loosely(dataset):
    """bf16 blocks through the full prepare() path stay within
    half-precision tolerance of the f32 hop stack."""
    from ssrg_tpu.train.node_classification import prepare

    mc = ModelConfig(model_name="gamlp", prop_steps=3)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    ref = prepare(spec, dataset, mc, TrainingConfig(spmm_engine="hybrid"))
    got = prepare(spec, dataset, mc,
                  TrainingConfig(spmm_engine="reorder_banded", spmm_bf16=True))
    np.testing.assert_allclose(
        np.asarray(got.inputs), np.asarray(ref.inputs), rtol=5e-2, atol=5e-2
    )


@pytest.mark.parametrize("model_name,path", [("gcn", "naive"), ("wavelet", "spectral")])
def test_meta_engine_degrade_warns(dataset, model_name, path, caplog):
    """reorder_* meta-engines silently degraded to 'auto' for naive/spectral
    models (round-3 weak #3); prepare() must now log a warning naming the
    path and the requested engine."""
    import logging

    from ssrg_tpu.train.node_classification import prepare

    model_cfg = ModelConfig(model_name=model_name, hidden_dim=16, prop_steps=2)
    train_cfg = TrainingConfig(spmm_engine="reorder_tiled")
    small = planetoid_like(num_node=120, num_classes=3, num_features=12, seed=3)
    spec = load_model(model_cfg, small.num_features, small.num_classes)
    with caplog.at_level(logging.WARNING, logger="ssrg_tpu"):
        prepare(spec, small, model_cfg, train_cfg)
    msgs = [r.getMessage() for r in caplog.records]
    assert any(
        "reorder_tiled" in m and path in m and "auto" in m for m in msgs
    ), msgs
