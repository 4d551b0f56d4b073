"""Link-classification dataset protocol + synthetic generator.

The reference's LinkClassification consumes ``dataset.observed_edge_idx/
observed_edge_weight`` plus ``{train,val,test}_edge_pairs_idx/_label``
(``SSRG/tasks/link_classification.py:22-31``); this module defines that
protocol as a dataclass and provides a hermetic SBM-based generator (pair
label = same-community) for tests.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ssrg_tpu.data.synthetic import sbm_graph


@dataclass
class LinkDataset:
    x: np.ndarray                   # [N, F]
    observed_edge_idx: np.ndarray   # [2, E] (directed entries)
    observed_edge_weight: np.ndarray
    train_edge_pairs_idx: np.ndarray   # [P, 2]
    train_edge_pairs_label: np.ndarray
    val_edge_pairs_idx: np.ndarray
    val_edge_pairs_label: np.ndarray
    test_edge_pairs_idx: np.ndarray
    test_edge_pairs_label: np.ndarray
    num_node: int
    num_classes: int

    @property
    def num_features(self) -> int:
        return int(self.x.shape[1])


def synthetic_link_dataset(
    num_node: int = 600,
    num_classes: int = 3,
    num_features: int = 32,
    num_pairs: int = 900,
    seed: int = 0,
    label_mode: str = "source_class",
) -> LinkDataset:
    """SBM graph; query pairs labeled either by the source node's community
    (``source_class`` — linearly decodable from concatenated endpoint
    features, matching the reference heads' concat+linear edge scorer) or by
    same-community membership (``same_community`` — requires feature
    interaction, beyond a concat+linear scorer). Split 60/20/20."""
    g = sbm_graph(num_node, num_classes, num_features, seed=seed)
    rng = np.random.default_rng(seed + 1)
    coo = g.adj.tocoo()

    a = rng.integers(0, num_node, size=num_pairs * 2)
    b = rng.integers(0, num_node, size=num_pairs * 2)
    keep = a != b
    a, b = a[keep][:num_pairs], b[keep][:num_pairs]
    if label_mode == "source_class":
        labels = g.y[a].astype(np.int64)
        n_cls = num_classes
    elif label_mode == "same_community":
        labels = (g.y[a] == g.y[b]).astype(np.int64)
        n_cls = 2
    else:
        raise ValueError(label_mode)
    pairs = np.stack([a, b], axis=1)

    n_train = int(0.6 * num_pairs)
    n_val = int(0.2 * num_pairs)
    perm = rng.permutation(pairs.shape[0])
    tr, va, te = np.split(perm, [n_train, n_train + n_val])
    return LinkDataset(
        x=g.x,
        observed_edge_idx=np.stack([coo.row, coo.col]),
        observed_edge_weight=coo.data.astype(np.float32),
        train_edge_pairs_idx=pairs[tr],
        train_edge_pairs_label=labels[tr],
        val_edge_pairs_idx=pairs[va],
        val_edge_pairs_label=labels[va],
        test_edge_pairs_idx=pairs[te],
        test_edge_pairs_label=labels[te],
        num_node=num_node,
        num_classes=n_cls,
    )
