"""Gated OGB/Reddit/Flickr npz loaders + visualization utilities."""

import os.path as osp

import numpy as np
import pytest


def _write_npz(raw_dir, name, n=60, f=8, c=3, e=200, seed=0):
    import os

    os.makedirs(raw_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    np.savez(
        osp.join(raw_dir, f"{name}.npz"),
        x=rng.normal(size=(n, f)).astype(np.float32),
        y=rng.integers(0, c, n),
        edge_index=rng.integers(0, n, (2, e)),
        train_idx=np.arange(0, 30),
        val_idx=np.arange(30, 45),
        test_idx=np.arange(45, 60),
    )


def test_ogbn_npz_loader(tmp_path):
    from ssrg_tpu.data.ogbn import Ogbn

    _write_npz(str(tmp_path / "arxiv" / "raw"), "arxiv")
    ds = Ogbn("arxiv", str(tmp_path))
    assert ds.num_node == 60
    assert ds.num_features == 8
    assert ds.train_idx.shape[0] == 30
    assert (ds.adj != ds.adj.T).nnz == 0


def test_data_read_dispatch(tmp_path):
    from ssrg_tpu.data.ogbn import data_read

    _write_npz(str(tmp_path / "reddit" / "raw"), "reddit")
    ds = data_read(str(tmp_path), "reddit")
    assert ds.num_node == 60
    with pytest.raises(ValueError):
        data_read(str(tmp_path), "unknown_ds")


def test_missing_dataset_raises_clear_error(tmp_path):
    from ssrg_tpu.data.ogbn import Ogbn

    with pytest.raises(FileNotFoundError, match="egress"):
        Ogbn("products", str(tmp_path))


def test_tsne_and_loss_plots(tmp_path):
    from ssrg_tpu.train.visualize import loss_curve_plot, tsne_plot

    rng = np.random.default_rng(0)
    feats = rng.normal(size=(80, 16))
    labels = rng.integers(0, 4, 80)
    out = str(tmp_path / "t.png")
    coords = tsne_plot(feats, labels, out, perplexity=10)
    assert coords.shape == (80, 2)
    assert osp.exists(out)
    loss_out = str(tmp_path / "l.png")
    loss_curve_plot([1.0, 0.5, 0.25], loss_out)
    assert osp.exists(loss_out)


def test_download_to_raises_clear_error_offline(tmp_path):
    # datasets.utils.download_to parity (SURVEY.md §2.9); no egress here
    import pytest

    from ssrg_tpu.data.utils import download_to

    target = tmp_path / "sub" / "x.bin"
    with pytest.raises(RuntimeError, match="no network egress"):
        download_to("http://127.0.0.1:9/none", str(target))
    assert target.parent.is_dir()  # directory creation happened first


def test_sbm_binary_feature_mode():
    from ssrg_tpu.data.synthetic import sbm_graph

    g = sbm_graph(400, 4, 64, seed=0, feature_mode="binary",
                  words_per_node=10, feature_signal=0.8)
    x = g.x
    assert set(np.unique(x)) <= {0.0, 1.0}
    # ~10 active words per node (duplicate draws collapse)
    per_node = x.sum(axis=1)
    assert 5 <= per_node.mean() <= 10
    # class-correlated vocabulary: same-class cosine similarity higher
    sims = x @ x.T
    same = g.y[:, None] == g.y[None, :]
    off_diag = ~np.eye(400, dtype=bool)
    assert sims[same & off_diag].mean() > 2 * sims[~same].mean()
