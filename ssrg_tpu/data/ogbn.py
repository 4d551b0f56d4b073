"""OGB / Reddit / Flickr dataset loaders (gated).

API parity with the reference's clean-dataset classes
(``datasets.simhomo.ogbn.Ogbn`` used by ``SSRG/data_process.py:14-17``;
SURVEY.md §2.9) without network access: loads from

1. the ``ogb`` package when importable (PygNodePropPredDataset layout), else
2. a pre-downloaded ``.npz`` bundle under ``<root>/<name>/raw/<name>.npz``
   with arrays ``x [N,F] f32, y [N] i64, edge_index [2,E] i64,
   train_idx, val_idx, test_idx`` — the same schema our sparsify pipeline
   emits, so ogbn-scale experiments can be staged offline.

Raises a clear error otherwise (zero-egress environment).
"""

from __future__ import annotations

import os.path as osp

import numpy as np

from ssrg_tpu.data.base_dataset import NodeDataset
from ssrg_tpu.data.graph import Graph


class Ogbn(NodeDataset):
    """ogbn-{arxiv, products, papers100M} (reference Ogbn(name, root, split))."""

    def __init__(self, name: str = "arxiv", root: str = "./datasets/simhomo/ogbn",
                 split: str = "official"):
        super().__init__(root, name)
        self._split_cache = None
        self.read_file()
        self.train_idx, self.val_idx, self.test_idx = self.generate_split(split)

    @property
    def raw_file_names(self):
        return [f"{self.name}.npz"]

    def download(self):
        raise FileNotFoundError(
            f"ogbn-{self.name} not found: no network egress. Either install/"
            f"stage the ogb package dataset, or place an npz bundle at "
            f"{osp.join(self.raw_dir, self.name + '.npz')} with arrays "
            "x, y, edge_index, train_idx, val_idx, test_idx."
        )

    def _load_npz(self):
        path = osp.join(self.raw_dir, f"{self.name}.npz")
        return np.load(path, allow_pickle=False)

    def process(self) -> Graph:
        try:
            from ogb.nodeproppred import NodePropPredDataset  # type: ignore

            ds = NodePropPredDataset(f"ogbn-{self.name}", root=self.raw_dir)
            g, labels = ds[0]
            split = ds.get_idx_split()
            x = np.asarray(g["node_feat"], np.float32)
            edge_index = np.asarray(g["edge_index"], np.int64)
            y = np.asarray(labels, np.int64).reshape(-1)
            self._split_cache = (
                np.asarray(split["train"]), np.asarray(split["valid"]),
                np.asarray(split["test"]),
            )
        except ImportError:
            z = self._load_npz()
            x = z["x"].astype(np.float32)
            edge_index = z["edge_index"].astype(np.int64)
            y = z["y"].astype(np.int64).reshape(-1)
            self._split_cache = (z["train_idx"], z["val_idx"], z["test_idx"])
        row, col = edge_index
        keep = row != col
        g = Graph(
            row[keep], col[keep], np.ones(keep.sum(), np.float32),
            x.shape[0], "UUU", x=x, y=y,
        )
        g._splits = tuple(np.asarray(s, np.int64) for s in self._split_cache)
        return g

    def generate_split(self, split: str):
        if split != "official":
            raise ValueError("only the official OGB split is supported")
        if getattr(self.graph, "_splits", None) is not None:
            return self.graph._splits
        z = self._load_npz()
        return (
            z["train_idx"].astype(np.int64),
            z["val_idx"].astype(np.int64),
            z["test_idx"].astype(np.int64),
        )


class NpzNodeDataset(NodeDataset):
    """Generic npz-backed node dataset — covers the reference's Reddit/Flickr
    ``torch_geometric.datasets`` load path (``SSRG/data_process.py:18-29``)
    via the same staged-npz schema."""

    def __init__(self, name: str, root: str, split: str = "official"):
        super().__init__(root, name)
        self.read_file()
        self.train_idx, self.val_idx, self.test_idx = self.generate_split(split)

    @property
    def raw_file_names(self):
        return [f"{self.name}.npz"]

    def download(self):
        raise FileNotFoundError(
            f"{self.name} npz bundle missing under {self.raw_dir} "
            "(zero-egress environment; stage it offline)"
        )

    def process(self) -> Graph:
        z = np.load(osp.join(self.raw_dir, f"{self.name}.npz"))
        row, col = z["edge_index"].astype(np.int64)
        keep = row != col
        g = Graph(
            row[keep], col[keep], np.ones(keep.sum(), np.float32),
            z["x"].shape[0], "UUU",
            x=z["x"].astype(np.float32), y=z["y"].astype(np.int64).reshape(-1),
        )
        g._splits = (
            z["train_idx"].astype(np.int64), z["val_idx"].astype(np.int64),
            z["test_idx"].astype(np.int64),
        )
        return g

    def generate_split(self, split: str):
        if getattr(self.graph, "_splits", None) is not None:
            return self.graph._splits
        z = np.load(osp.join(self.raw_dir, f"{self.name}.npz"))
        return (
            z["train_idx"].astype(np.int64), z["val_idx"].astype(np.int64),
            z["test_idx"].astype(np.int64),
        )


def Reddit(root: str, split: str = "official") -> NpzNodeDataset:
    return NpzNodeDataset("reddit", root, split)


def Flickr(root: str, split: str = "official") -> NpzNodeDataset:
    return NpzNodeDataset("flickr", root, split)


def data_read(root: str, dataset: str):
    """Dataset dispatch (reference ``SSRG/data_process.py:12-33`` dataRead)."""
    name = dataset.lower()
    if name in ("cora", "citeseer", "pubmed"):
        from ssrg_tpu.data.planetoid import Planetoid

        return Planetoid(name, root, "official")
    if name in ("arxiv", "products", "papers100m"):
        return Ogbn(name, root, "official")
    if name in ("reddit", "flickr"):
        return NpzNodeDataset(name, root, "official")
    raise ValueError(f"dataset not found: {dataset!r}")
