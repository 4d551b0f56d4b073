"""Inference/serving path (ssrg_tpu/serve.py): checkpoint round-trip and
prediction consistency with training-time evaluation."""

import numpy as np
import pytest

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.data.synthetic import planetoid_like
from ssrg_tpu.models.zoo import load_model
from ssrg_tpu.serve import Predictor
from ssrg_tpu.train.node_classification import NodeClassification


@pytest.fixture(scope="module")
def dataset():
    return planetoid_like(num_node=600, num_classes=4, num_features=48, seed=0)


def _train(dataset, model_name, ckpt, **model_kwargs):
    mc = ModelConfig(model_name=model_name, prop_steps=3, hidden_dim=32,
                     num_layers=2, **model_kwargs)
    tc = TrainingConfig(num_epochs=60, lr=0.05, checkpoint_path=ckpt)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)
    return mc, tc, task


@pytest.mark.parametrize("model_name", ["sgc", "gamlp"])
def test_predictor_matches_training_accuracy(dataset, tmp_path, model_name):
    ckpt = str(tmp_path / f"{model_name}.ckpt")
    mc, tc, task = _train(dataset, model_name, ckpt)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    pred = Predictor(dataset, spec, mc, tc, checkpoint_path=ckpt)

    labels = pred.predict(dataset.test_idx)
    acc = float(np.mean(labels == np.asarray(dataset.y)[dataset.test_idx]))
    # checkpoint holds the BEST-val params: accuracy must be in band
    assert acc >= task.best_test - 0.03
    probs = pred.predict_proba(dataset.test_idx[:5])
    assert probs.shape == (5, dataset.num_classes)
    np.testing.assert_allclose(probs.sum(axis=1), 1.0, rtol=1e-5)
    assert pred.metadata and pred.metadata["model"]


def test_predictor_full_graph_gcn(dataset, tmp_path):
    ckpt = str(tmp_path / "gcn.ckpt")
    mc, tc, task = _train(dataset, "gcn", ckpt)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    pred = Predictor(dataset, spec, mc, tc, checkpoint_path=ckpt)
    labels = pred.predict(dataset.test_idx)
    acc = float(np.mean(labels == np.asarray(dataset.y)[dataset.test_idx]))
    assert acc >= task.best_test - 0.05


def test_cli_train_then_predict(tmp_path, capsys):
    from ssrg_tpu.cli import main

    ckpt = str(tmp_path / "cli.ckpt")
    out = str(tmp_path / "labels.npy")
    rc = main([
        "train", "--synthetic", "--synthetic_nodes", "300",
        "--synthetic_features", "48", "--num_epochs", "30",
        "--model_name", "sgc", "--hidden_dim", "32", "--lr", "0.05",
        "--checkpoint_path", ckpt,
    ])
    assert rc == 0
    rc = main([
        "predict", "--synthetic", "--synthetic_nodes", "300",
        "--synthetic_features", "48", "--model_name", "sgc",
        "--hidden_dim", "32", "--checkpoint", ckpt, "--out", out,
    ])
    assert rc == 0
    labels = np.load(out)
    assert labels.ndim == 1 and labels.shape[0] > 0


def test_predictor_bn_checkpoint_roundtrip(dataset, tmp_path):
    """BatchNorm checkpoints include batch_stats; Predictor restores both."""
    ckpt = str(tmp_path / "bn.ckpt")
    mc = ModelConfig(model_name="gamlp", prop_steps=3, hidden_dim=32,
                     num_layers=2, use_bn=True)
    tc = TrainingConfig(num_epochs=60, lr=0.05, checkpoint_path=ckpt)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    task = NodeClassification(dataset, spec, mc, tc)

    from ssrg_tpu.cache import load_metadata

    assert load_metadata(ckpt)["has_bn"] is True
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    pred = Predictor(dataset, spec, mc, tc, checkpoint_path=ckpt)
    labels = pred.predict(dataset.test_idx)
    acc = float(np.mean(labels == np.asarray(dataset.y)[dataset.test_idx]))
    assert acc >= task.best_test - 0.05


def test_predictor_batch_padding_stable(dataset, tmp_path):
    """Varying batch sizes map to pow2-padded shapes with exact results."""
    ckpt = str(tmp_path / "pad.ckpt")
    mc, tc, task = _train(dataset, "sgc", ckpt)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    pred = Predictor(dataset, spec, mc, tc, checkpoint_path=ckpt)
    full = pred.predict(dataset.test_idx)
    for size in (1, 3, 7, 20):
        sub = pred.predict(dataset.test_idx[:size])
        np.testing.assert_array_equal(sub, full[:size])


def test_predictor_rejects_legacy_bn_checkpoint(dataset, tmp_path):
    """Params-only checkpoints (no has_bn metadata) must be refused for BN
    models with a clear message instead of serving init batch_stats."""
    from ssrg_tpu.cache import save_params

    mc = ModelConfig(model_name="gamlp", prop_steps=3, hidden_dim=32,
                     num_layers=2, use_bn=True)
    tc = TrainingConfig(num_epochs=1)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    # fabricate a legacy params-only checkpoint
    from ssrg_tpu.train.node_classification import NodeClassification

    task = NodeClassification(dataset, spec, mc, tc)
    ckpt = str(tmp_path / "legacy.ckpt")
    save_params(task.state.params, ckpt, metadata={"model": "gamlp"})
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    with pytest.raises(ValueError, match="BatchNorm"):
        Predictor(dataset, spec, mc, tc, checkpoint_path=ckpt)
