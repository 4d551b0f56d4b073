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
