"""Planetoid dataset (ind.* format parser).

Rebuild of ``SSRG/sparsity_datasets/simhomo/planetoid.py:14-175`` (SURVEY.md
§2.8): parses the classic kimiyoung/planetoid raw files
(``ind.<name>.{x,y,tx,ty,allx,ally,graph,test.index}``), applies the
citeseer isolated-test-node fix, row-normalizes features, removes duplicate
edges and self-loops, and produces the official split — 20 per class train
(first 20*C rows), next 500 val, final 1000 test-index rows.

No network egress in this environment: ``download()`` raises with
instructions; place raw files under ``<root>/<name>/raw/``.
"""

from __future__ import annotations

import os.path as osp
import pickle
import sys
from typing import List

import numpy as np
import scipy.sparse as sp

from ssrg_tpu.data.base_dataset import NodeDataset
from ssrg_tpu.data.graph import Graph
from ssrg_tpu.data.utils import edge_homophily, linkx_homophily, node_homophily


def _parse_index_file(path: str) -> np.ndarray:
    with open(path) as f:
        return np.asarray([int(line.strip()) for line in f], dtype=np.int64)


def _pickle_load(path: str):
    with open(path, "rb") as f:
        if sys.version_info >= (3, 0):
            return pickle.load(f, encoding="latin1")
        return pickle.load(f)


def row_normalize(features: sp.spmatrix) -> sp.csr_matrix:
    """Row-normalize a feature matrix (reference planetoid.py:99-107)."""
    rowsum = np.asarray(features.sum(axis=1)).reshape(-1)
    with np.errstate(divide="ignore"):
        r_inv = 1.0 / rowsum
    r_inv[~np.isfinite(r_inv)] = 0.0
    return (sp.diags(r_inv) @ features).tocsr()


class Planetoid(NodeDataset):
    """cora / citeseer / pubmed from raw ind.* files."""

    def __init__(self, name: str = "cora", root: str = "./datasets/simhomo/Planetoid",
                 split: str = "official"):
        name = name.lower()
        if name not in ("cora", "citeseer", "pubmed"):
            raise ValueError(f"unknown planetoid dataset {name!r}")
        super().__init__(root, name)
        self.read_file()
        self.train_idx, self.val_idx, self.test_idx = self.generate_split(split)
        coo = self.adj.tocoo()
        self.edge_homophily = edge_homophily(coo.row, coo.col, self.y)
        self.node_homophily = node_homophily(coo.row, coo.col, self.y, self.num_node)
        self.linkx_homophily = linkx_homophily(coo.row, coo.col, self.y, self.num_node)

    @property
    def raw_file_names(self) -> List[str]:
        parts = ["x", "y", "tx", "ty", "allx", "ally", "graph", "test.index"]
        return [f"ind.{self.name}.{p}" for p in parts]

    def download(self):
        raise FileNotFoundError(
            f"planetoid raw files missing under {self.raw_dir}; this environment "
            "has no network egress — copy ind.* files from "
            "github.com/kimiyoung/planetoid (data/) manually"
        )

    def process(self) -> Graph:
        paths = self.raw_file_paths()
        x, y, tx, ty, allx, ally, graph = [
            _pickle_load(p) for p in paths[:-1]
        ]
        test_idx_reorder = _parse_index_file(paths[-1])
        test_idx_range = np.sort(test_idx_reorder)

        if self.name == "citeseer":
            # isolated-node fix (reference planetoid.py:126-136): fill missing
            # test indices with zero rows
            full = np.arange(test_idx_range.min(), test_idx_range.max() + 1)
            tx_ext = sp.lil_matrix((full.shape[0], x.shape[1]))
            tx_ext[test_idx_range - full.min(), :] = tx
            tx = tx_ext
            ty_ext = np.zeros((full.shape[0], y.shape[1]))
            ty_ext[test_idx_range - full.min(), :] = ty
            ty = ty_ext

        features = sp.vstack((allx, tx)).tolil()
        features[test_idx_reorder, :] = features[test_idx_range, :]
        features = row_normalize(sp.csr_matrix(features))

        labels_onehot = np.vstack((ally, ty))
        labels_onehot[test_idx_reorder, :] = labels_onehot[test_idx_range, :]
        labels = labels_onehot.argmax(axis=1).astype(np.int64)

        num_node = features.shape[0]
        rows, cols = [], []
        for src, dsts in graph.items():
            for dst in dsts:
                rows.append(src)
                cols.append(dst)
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(cols, dtype=np.int64)
        keep = rows != cols
        rows, cols = rows[keep], cols[keep]
        # dedupe (keep single direction entries unique; Graph symmetrizes)
        pairs = np.unique(np.stack([rows, cols], axis=1), axis=0)
        return Graph(
            pairs[:, 0], pairs[:, 1], np.ones(pairs.shape[0], np.float32),
            num_node, "UUU",
            x=np.asarray(features.todense(), np.float32), y=labels,
        )

    def generate_split(self, split: str):
        if split != "official":
            raise ValueError("only the official planetoid split is supported")
        num_classes = self.num_classes
        train_idx = np.arange(num_classes * 20)
        val_idx = np.arange(num_classes * 20, num_classes * 20 + 500)
        test_idx = _parse_index_file(self.raw_file_paths()[-1])
        return train_idx, np.sort(val_idx), np.sort(test_idx)
