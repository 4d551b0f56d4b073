"""Base dataset class with raw/processed directory layout.

Reconstruction of the reference's missing ``datasets.base_dataset.NodeDataset``
(used by ``SSRG/sparsity_datasets/simhomo/sparsity_dataset.py:49-50`` and
``planetoid.py:56``; SURVEY.md §2.9): PyG-style lifecycle — if processed file
is absent, run ``download()`` (if raw files absent) then ``process()`` and
cache the pickled Graph; afterwards ``read_file()`` exposes graph attributes
and ``generate_split()`` produces index arrays.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Optional, Sequence

import numpy as np

from ssrg_tpu.data.graph import Graph
from ssrg_tpu.data.utils import pkl_read_file, pkl_write_file


class NodeDataset:
    """Abstract node-level dataset.

    Subclasses implement ``raw_file_names``, ``download()``, ``process() ->
    Graph`` and ``generate_split(split)``.
    """

    def __init__(self, root: str, name: str):
        self.root = root
        self.name = name
        self.graph: Optional[Graph] = None
        self.train_idx: Optional[np.ndarray] = None
        self.val_idx: Optional[np.ndarray] = None
        self.test_idx: Optional[np.ndarray] = None

    # -- directory layout --------------------------------------------------

    @property
    def raw_dir(self) -> str:
        return osp.join(self.root, self.name, "raw")

    @property
    def processed_dir(self) -> str:
        return osp.join(self.root, self.name, "processed")

    @property
    def raw_file_names(self) -> Sequence[str]:
        raise NotImplementedError

    @property
    def processed_file_path(self) -> str:
        return osp.join(self.processed_dir, f"{self.name}.graph")

    def raw_file_paths(self) -> Sequence[str]:
        return [osp.join(self.raw_dir, f) for f in self.raw_file_names]

    # -- lifecycle ---------------------------------------------------------

    def download(self) -> None:
        raise NotImplementedError(
            f"Raw files for {self.name} not found under {self.raw_dir} and this "
            "environment has no network egress; place the raw files there."
        )

    def process(self) -> Graph:
        raise NotImplementedError

    def _prepare(self) -> Optional[Graph]:
        if not osp.exists(self.processed_file_path):
            if not all(osp.exists(p) for p in self.raw_file_paths()):
                os.makedirs(self.raw_dir, exist_ok=True)
                self.download()
            graph = self.process()
            try:
                os.makedirs(self.processed_dir, exist_ok=True)
                pkl_write_file(graph, self.processed_file_path)
            except OSError:
                # read-only dataset root (e.g. the mounted reference
                # snapshot): serve the processed graph from memory
                return graph
        return None

    def read_file(self) -> Graph:
        graph = self._prepare()
        if graph is None:
            try:
                graph = pkl_read_file(self.processed_file_path)
            except Exception:
                # corrupt/truncated processed pickle (the reference snapshot
                # ships .graph blobs cut at 2,359,296 bytes, or a pickle from
                # the reference's own `datasets.base_data` classes): try the
                # compat loader, then fall back to reprocessing the raws
                try:
                    from ssrg_tpu.data.reference_compat import (
                        load_reference_processed,
                    )

                    graph = load_reference_processed(self.processed_file_path)
                except Exception:
                    if not all(osp.exists(p) for p in self.raw_file_paths()):
                        raise
                    graph = self.process()
        self.graph = graph
        return self.graph

    def generate_split(self, split: str) -> None:
        raise NotImplementedError

    # -- graph attribute passthrough --------------------------------------

    @property
    def adj(self):
        return self.graph.adj

    @property
    def x(self):
        return self.graph.x

    @property
    def y(self):
        return self.graph.y

    @property
    def edge(self):
        return self.graph.edge

    @property
    def num_node(self) -> int:
        return self.graph.num_node

    @property
    def num_edge(self) -> int:
        return self.graph.num_edge

    @property
    def num_features(self) -> int:
        return self.graph.num_features

    @property
    def num_classes(self) -> int:
        return self.graph.num_classes

    @property
    def feature_mask(self):
        return self.graph.feature_mask

    @property
    def edge_mask(self):
        return self.graph.edge_mask
