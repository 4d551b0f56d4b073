"""Robustness pipeline round-trip (SURVEY.md §3.3/§3.4): synthetic dataset ->
sparsify (8-file raw schema) -> SparsityDataset load -> augmentation ->
augmented load -> training recovers accuracy."""

import numpy as np
import pytest

from ssrg_tpu.configs.config import (
    DataAugmentConfig,
    ModelConfig,
    TrainingConfig,
)
from ssrg_tpu.data.sparsity import load_homo_simplex_sparsity_dataset
from ssrg_tpu.data.synthetic import planetoid_like
from ssrg_tpu.pipelines.augment import augment_dataset, edge_augment
from ssrg_tpu.pipelines.sparsify import (
    edge_masked,
    feature_masked,
    sparsify_dataset,
)


@pytest.fixture(scope="module")
def base_dataset():
    return planetoid_like(num_node=600, num_classes=3, num_features=32, seed=5)


def test_feature_mask_rate():
    rng = np.random.default_rng(0)
    x = np.ones((1000, 50), np.float32)
    mask, feat = feature_masked(x, 0.7, rng)
    assert mask.shape == x.shape
    # ~30% of entries survive
    assert abs(mask.mean() - 0.3) < 0.02
    np.testing.assert_array_equal(feat, x)


def test_edge_mask_halves_and_drops():
    rng = np.random.default_rng(0)
    row = np.array([0, 1, 2, 3, 1, 2, 3, 4])
    col = np.array([1, 0, 3, 2, 2, 1, 4, 3])
    mask, ei = edge_masked(row, col, 0.5, rng)
    # only col > row kept: 4 half edges; 50% dropped -> 2 left
    assert ei.shape == (2, 2)
    assert (ei[1] > ei[0]).all()


def test_sparsify_roundtrip(tmp_path, base_dataset):
    out = str(tmp_path / "sbm_0.5_0.5")
    sparsify_dataset(base_dataset, 0.5, 0.5, out, seed=1)
    ds = load_homo_simplex_sparsity_dataset(
        "sbm_0.5_0.5", str(tmp_path), "official"
    )
    assert ds.num_node == base_dataset.num_node
    assert ds.num_features == base_dataset.num_features
    # adjacency symmetric despite half-directed storage
    assert (ds.adj != ds.adj.T).nnz == 0
    # roughly half the undirected edges survive
    orig_und = base_dataset.adj.nnz // 2
    kept_und = ds.adj.nnz // 2
    assert 0.35 * orig_und < kept_und < 0.65 * orig_und
    # splits preserved
    np.testing.assert_array_equal(ds.train_idx, base_dataset.train_idx)
    # homophily stats computed
    assert 0 <= ds.edge_homophily <= 1


def test_edge_augment_enforces_min_degree(base_dataset, tmp_path):
    out = str(tmp_path / "sbm_0.3_0.8")
    sparsify_dataset(base_dataset, 0.3, 0.8, out, seed=2)
    ds = load_homo_simplex_sparsity_dataset("sbm_0.3_0.8", str(tmp_path))
    cfg = DataAugmentConfig(degree_level=2, candidates_per_deficit=50)
    rng = np.random.default_rng(0)
    fake_feature = rng.normal(size=(ds.num_node, 8)).astype(np.float32)
    ei = edge_augment(ds, fake_feature, cfg, seed=3)
    # symmetric + deduped
    pairs = set(map(tuple, ei.T))
    assert all((b, a) in pairs for a, b in pairs)
    deg = np.bincount(ei.reshape(-1), minlength=ds.num_node)
    assert deg.min() >= cfg.degree_level


def test_full_robustness_roundtrip(tmp_path, base_dataset):
    """Sparsify hard, then augmentation restores usable accuracy."""
    out = str(tmp_path / "sbm_0.6_0.6")
    sparsify_dataset(base_dataset, 0.6, 0.6, out, seed=4)
    sparse_ds = load_homo_simplex_sparsity_dataset("sbm_0.6_0.6", str(tmp_path))

    aug_cfg = DataAugmentConfig(
        hidden_dim=64, epochs=60, lr=0.01, degree_level=1,
        candidates_per_deficit=50,
    )
    aug_out = str(tmp_path / "aug" / "sbm_0.6_0.6")
    augment_dataset(sparse_ds, aug_cfg, aug_out, seed=4)
    aug_ds = load_homo_simplex_sparsity_dataset(
        "sbm_0.6_0.6", str(tmp_path / "aug"), is_augumented=True
    )
    assert aug_ds.num_features == 64 + sparse_ds.num_classes

    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    mc = ModelConfig(model_name="sgc", prop_steps=2)
    tc = TrainingConfig(num_epochs=60, lr=0.01, seed=1)
    spec = load_model(mc, aug_ds.num_features, aug_ds.num_classes)
    task = NodeClassification(aug_ds, spec, mc, tc)
    assert task.best_test > 0.7, f"augmented acc {task.best_test:.3f}"


def test_augment_auxiliary_losses(base_dataset, tmp_path):
    """Optional L1 + sparse-CE loss terms train without degradation."""
    out = str(tmp_path / "sbm_aux")
    sparsify_dataset(base_dataset, 0.5, 0.5, out, seed=6)
    ds = load_homo_simplex_sparsity_dataset("sbm_aux", str(tmp_path))
    from ssrg_tpu.pipelines.augment import feature_augment

    cfg = DataAugmentConfig(hidden_dim=32, epochs=30, lr=0.01,
                            l1_weight=0.1, sparse_ce_weight=0.1)
    feature, soft_label = feature_augment(ds, cfg, seed=1)
    assert feature.shape == (ds.num_node, 32 + ds.num_classes)
    assert np.isfinite(feature).all()
    np.testing.assert_allclose(soft_label.sum(1), 1.0, rtol=1e-4)


def test_heterophily_targeted_edge_deletion(base_dataset):
    """Targeted deletion removes different-label edges first, raising the
    surviving graph's edge homophily."""
    from ssrg_tpu.data.utils import edge_homophily

    coo = base_dataset.adj.tocoo()
    y = base_dataset.y
    rng = np.random.default_rng(1)
    _, ei_rand = edge_masked(coo.row, coo.col, 0.4, rng)
    rng = np.random.default_rng(1)
    _, ei_tgt = edge_masked(coo.row, coo.col, 0.4, rng, labels=y,
                            target_heterophilous=True)
    assert ei_rand.shape == ei_tgt.shape
    h_rand = edge_homophily(ei_rand[0], ei_rand[1], y)
    h_tgt = edge_homophily(ei_tgt[0], ei_tgt[1], y)
    assert h_tgt > h_rand + 0.05
