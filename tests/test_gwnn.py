"""Standalone GWNN pipeline (SURVEY.md §2.12): readers, sparsifier, trainer."""

import json

import numpy as np
import pytest

from ssrg_tpu.models.gwnn import (
    GWNNConfig,
    GWNNTrainer,
    WaveletSparsifier,
    read_edges_csv,
    read_features_json,
    read_targets_csv,
)


def _write_dataset(tmp_path, n=120, c=3, f=20, seed=0):
    """SBM-ish CSV/JSON dataset in the reference's input format."""
    from ssrg_tpu.data.synthetic import sbm_graph

    g = sbm_graph(n, c, f, p_in=0.08, p_out=0.01, seed=seed)
    coo = g.adj.tocoo()
    half = coo.row < coo.col
    edges = np.stack([coo.row[half], coo.col[half]], axis=1)
    edge_path = tmp_path / "edges.csv"
    with open(edge_path, "w") as fh:
        fh.write("id1,id2\n")
        for a, b in edges:
            fh.write(f"{a},{b}\n")
    # binarize features into sparse id lists
    feat = {str(i): np.where(g.x[i] > 0.5)[0].tolist() for i in range(n)}
    feat_path = tmp_path / "features.json"
    with open(feat_path, "w") as fh:
        json.dump(feat, fh)
    target_path = tmp_path / "target.csv"
    with open(target_path, "w") as fh:
        fh.write("id,target\n")
        for i in range(n):
            fh.write(f"{i},{g.y[i]}\n")
    return str(edge_path), str(feat_path), str(target_path), g


def test_readers_roundtrip(tmp_path):
    e, f, t, g = _write_dataset(tmp_path)
    adj = read_edges_csv(e)
    assert adj.shape[0] == g.num_node
    assert (adj != adj.T).nnz == 0
    assert adj.nnz == g.adj.nnz
    x = read_features_json(f, g.num_node)
    assert x.shape[0] == g.num_node
    y = read_targets_csv(t)
    np.testing.assert_array_equal(y, g.y)


def test_gwnn_trainer_fit_score(tmp_path):
    e, f, t, g = _write_dataset(tmp_path, n=150, seed=3)
    adj = read_edges_csv(e)
    x = read_features_json(f, adj.shape[0])
    y = read_targets_csv(t)
    cfg = GWNNConfig(epochs=120, filters=16, scale=1.0, learning_rate=0.02)
    sparsifier = WaveletSparsifier(
        adj, cfg.scale, cfg.approximation_order, cfg.tolerance
    )
    sparsifier.calculate_all_wavelets()
    assert len(sparsifier.phi_matrices) == 2
    assert sparsifier.stats["phi_density"] > 0
    trainer = GWNNTrainer(cfg, sparsifier, x, y)
    trainer.fit()
    assert len(trainer.logs) == cfg.epochs
    assert all("seconds" in l for l in trainer.logs)
    acc = trainer.score()
    assert acc > 0.5, f"gwnn acc {acc:.3f}"


def test_gwnn_scan_fit_matches_band():
    from ssrg_tpu.models.gwnn import GWNNConfig, GWNNTrainer, WaveletSparsifier
    from ssrg_tpu.data.synthetic import sbm_graph

    g = sbm_graph(200, 3, 24, p_in=0.08, p_out=0.01, seed=5)
    cfg = GWNNConfig(epochs=40, filters=8)
    sp_ = WaveletSparsifier(g.adj, cfg.scale, cfg.approximation_order,
                            cfg.tolerance)
    sp_.calculate_all_wavelets()
    tr = GWNNTrainer(cfg, sp_, g.x, g.y)
    tr.fit(scan=True)
    assert len(tr.logs) == 40
    assert tr.score() > 0.7
