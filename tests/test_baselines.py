"""Baseline pipeline (SURVEY.md §2.11): full-graph message-passing zoo,
triplet loss, cluster-partition training, multi-run statistics."""

import numpy as np
import pytest

from ssrg_tpu.configs.config import TrainingConfig
from ssrg_tpu.data.synthetic import planetoid_like
from ssrg_tpu.train.baseline_task import BaselineTask, build_cluster_batches, mean_norm


@pytest.fixture(scope="module")
def dataset():
    return planetoid_like(num_node=500, num_classes=4, num_features=32, seed=8)


@pytest.mark.parametrize("name,thresh", [
    ("mlp", 0.7), ("gcn", 0.75), ("sage", 0.75), ("sgc", 0.75), ("sign", 0.75),
])
def test_baselines_learn(dataset, name, thresh):
    cfg = TrainingConfig(num_epochs=80, lr=0.01, seed=1)
    task = BaselineTask(dataset, name, cfg, hidden_dim=48, dropout=0.3)
    assert task.best_test > thresh, f"{name}: {task.best_test:.3f}"


def test_gat_learns(dataset):
    cfg = TrainingConfig(num_epochs=80, lr=0.01, seed=1)
    task = BaselineTask(dataset, "gat", cfg, hidden_dim=8, dropout=0.3)
    assert task.best_test > 0.7, f"gat: {task.best_test:.3f}"


def test_robust_mlp_with_triplet(dataset):
    cfg = TrainingConfig(num_epochs=80, lr=0.01, seed=1)
    task = BaselineTask(
        dataset, "robust_mlp", cfg, hidden_dim=48, dropout=0.3,
        triplet_weight=0.1,
    )
    assert task.best_test > 0.7, f"robust_mlp: {task.best_test:.3f}"


def test_multi_run_statistics(dataset):
    cfg = TrainingConfig(num_epochs=25, lr=0.01, seed=1)
    task = BaselineTask(dataset, "sgc", cfg, runs=2)
    msg = task.logger.print_statistics()
    assert "±" in msg
    assert len(task.logger.results[0]) == 25


def test_cluster_batches_cover_all_nodes(dataset):
    batches = build_cluster_batches(dataset.adj, num_parts=16, parts_per_batch=4)
    seen = np.concatenate([
        np.asarray(b.node_ids)[np.asarray(b.valid) > 0] for b in batches
    ])
    assert np.array_equal(np.sort(seen), np.arange(dataset.num_node))


def test_gcn_cluster_training(dataset):
    cfg = TrainingConfig(num_epochs=40, lr=0.01, seed=1)
    task = BaselineTask(
        dataset, "gcn", cfg, hidden_dim=48, dropout=0.3,
        cluster_parts=16, parts_per_batch=4,
    )
    assert task.best_test > 0.6, f"cluster gcn: {task.best_test:.3f}"


def test_mean_norm_rows_sum_to_one(dataset):
    p = mean_norm(dataset.adj)
    rowsum = np.asarray(p.sum(axis=1)).reshape(-1)
    nz = rowsum > 0
    np.testing.assert_allclose(rowsum[nz], 1.0, rtol=1e-5)
