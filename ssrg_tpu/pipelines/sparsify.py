"""Graph sparsification pipeline.

Rebuild of ``SSRG/data_process.py:12-117`` (SURVEY.md §2.10, §3.3): Bernoulli
feature keep-mask (``rand > r``), random edge deletion over the ``col > row``
half-directed edge list, and the 8-file raw ``.pt`` dataset dump consumed by
:class:`ssrg_tpu.data.sparsity.SparsityDataset`.
"""

from __future__ import annotations

import os
import os.path as osp
from typing import Tuple

import numpy as np

from ssrg_tpu.data.graph import Graph


def feature_masked(
    x: np.ndarray, rate: float, rng: np.random.Generator
) -> Tuple[np.ndarray, np.ndarray]:
    """Bernoulli keep-mask over [N, F]: entry survives when rand > rate
    (reference ``featureMasked``, data_process.py:35-41). Returns
    (mask int [N,F], features unchanged)."""
    mask = (rng.uniform(size=x.shape) > rate).astype(np.int64)
    return mask, x.astype(np.float32)


def edge_masked(
    row: np.ndarray, col: np.ndarray, shading_rate: float,
    rng: np.random.Generator,
    labels: np.ndarray = None,
    target_heterophilous: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Edge deletion (reference ``edgeMasked``, data_process.py:43-67):
    keep the ``col > row`` half, drop ``shading_rate`` of it.

    ``target_heterophilous=True`` preferentially deletes edges whose
    endpoints have different labels — the reference's commented-out
    heterophily-targeted variant (data_process.py:59-64), here a working
    option (falls back to random among homophilous edges if the
    heterophilous pool runs out). Returns (mask = surviving-edge permutation
    indices, half-directed edge_index [2, E'])."""
    half = col > row
    row_h, col_h = row[half], col[half]
    e = row_h.shape[0]
    need_delete = int(e * shading_rate)
    if target_heterophilous and labels is not None and need_delete:
        hetero = np.where(labels[row_h] != labels[col_h])[0]
        homo = np.setdiff1d(np.arange(e), hetero)
        order = np.concatenate(
            [rng.permutation(hetero), rng.permutation(homo)]
        )
        deleted = order[:need_delete]
        mask = np.setdiff1d(np.arange(e), deleted)
        mask = rng.permutation(mask)
    else:
        mask = rng.permutation(e)[need_delete:]
    return mask, np.stack([row_h[mask], col_h[mask]])


def save_raw_dataset(
    out_dir: str,
    feature: np.ndarray,
    edge_index: np.ndarray,
    label: np.ndarray,
    train_idx: np.ndarray,
    val_idx: np.ndarray,
    test_idx: np.ndarray,
    feature_mask,
    edge_mask,
) -> str:
    """Write the 8-file raw schema (reference ``dataSave``,
    data_process.py:69-106) with torch serialization so the directories are
    interchangeable with the reference's."""
    import torch

    raw = osp.join(out_dir, "raw")
    os.makedirs(raw, exist_ok=True)

    def t(arr):
        return torch.from_numpy(np.ascontiguousarray(arr).copy())

    blobs = {
        "feature.pt": t(feature),
        "edge_index.pt": t(edge_index),
        "label.pt": t(label),
        "train_idx.pt": t(train_idx),
        "val_idx.pt": t(val_idx),
        "test_idx.pt": t(test_idx),
        "feature_mask.pt": t(feature_mask) if feature_mask is not None else torch.zeros(0),
        "edge_mask.pt": t(edge_mask) if edge_mask is not None else torch.zeros(0),
    }
    for name, tensor in blobs.items():
        torch.save(tensor, osp.join(raw, name))
    return raw


def sparsify_dataset(
    dataset,
    feature_rate: float,
    edge_rate: float,
    out_dir: str,
    seed: int = 2023,
) -> str:
    """Full pipeline: mask features + drop edges + dump raw dir. ``dataset``
    must expose ``x, y, adj, train_idx, val_idx, test_idx``."""
    rng = np.random.default_rng(seed)
    feature_mask, feature = feature_masked(dataset.x, feature_rate, rng)
    coo = dataset.adj.tocoo()
    edge_mask, edge_index = edge_masked(coo.row, coo.col, edge_rate, rng)
    return save_raw_dataset(
        out_dir, feature, edge_index, dataset.y,
        np.asarray(dataset.train_idx), np.asarray(dataset.val_idx),
        np.asarray(dataset.test_idx), feature_mask, edge_mask,
    )


def run_sparsify(args) -> None:
    """CLI hook (``ssrg-tpu sparsify``)."""
    if getattr(args, "synthetic", False) or args.dataset.startswith("sbm"):
        from ssrg_tpu.data.synthetic import planetoid_like

        dataset = planetoid_like(seed=args.seed)
        name = "sbm"
    else:
        from ssrg_tpu.data.sparsity import load_homo_simplex_sparsity_dataset

        dataset = load_homo_simplex_sparsity_dataset(
            args.dataset, args.dataroot, "official", is_augumented=True
        )
        name = args.dataset
    fr, er = args.sparse_rate
    out = osp.join(args.out_root, f"{name}_{fr}_{er}")
    raw = sparsify_dataset(dataset, fr, er, out, args.seed)
    print(f"sparsified dataset written to {raw}")
