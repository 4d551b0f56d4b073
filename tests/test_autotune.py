"""Engine autotuner picks a working engine and returns sane timings."""

import numpy as np
import scipy.sparse as sp

from ssrg_tpu.ops.autotune import autotune_engine


def test_autotune_small_graph():
    rng = np.random.default_rng(0)
    a = (rng.uniform(size=(120, 120)) < 0.1).astype(np.float32)
    np.fill_diagonal(a, 0)
    adj = sp.csr_matrix(np.maximum(a, a.T))
    best, timings = autotune_engine(adj, 16, reps=2)
    assert best in timings
    assert all(t > 0 for t in timings.values())
    assert "dense" in timings  # small graph: dense candidate included


def test_autotune_in_training():
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    ds = planetoid_like(num_node=300, num_classes=3, num_features=16, seed=2)
    mc = ModelConfig(model_name="sgc", prop_steps=2)
    tc = TrainingConfig(num_epochs=20, lr=0.01, spmm_engine="autotune")
    spec = load_model(mc, ds.num_features, ds.num_classes)
    task = NodeClassification(ds, spec, mc, tc)
    assert task.best_test > 0.6
