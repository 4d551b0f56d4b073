"""Clustering evaluation: Munkres-matched ACC + NMI/ARI/F1.

Rebuild of ``SSRG/tasks/clustering_metrics.py:11-84`` (SURVEY.md §2.7):
optimal cluster-to-class assignment via the Hungarian algorithm
(``scipy.optimize.linear_sum_assignment`` instead of the munkres package)
plus sklearn NMI/ARI.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def clustering_accuracy(true_labels: np.ndarray, pred_labels: np.ndarray) -> Dict[str, float]:
    """Best-match accuracy and macro-F1 under the optimal label permutation."""
    from scipy.optimize import linear_sum_assignment
    from sklearn import metrics

    true_labels = np.asarray(true_labels)
    pred_labels = np.asarray(pred_labels)
    classes = np.unique(true_labels)
    clusters = np.unique(pred_labels)
    cost = np.zeros((clusters.shape[0], classes.shape[0]))
    for i, c in enumerate(clusters):
        mask = pred_labels == c
        for j, k in enumerate(classes):
            cost[i, j] = np.sum(true_labels[mask] == k)
    row, col = linear_sum_assignment(-cost)
    mapping = {clusters[i]: classes[j] for i, j in zip(row, col)}
    remapped = np.asarray([mapping.get(p, -1) for p in pred_labels])
    acc = float(np.mean(remapped == true_labels))
    f1 = float(metrics.f1_score(true_labels, remapped, average="macro"))
    return {"acc": acc, "f1_macro": f1}


def evaluation_cluster_model_from_label(
    true_labels: np.ndarray, pred_labels: np.ndarray
) -> Dict[str, float]:
    """ACC / NMI / ARI / F1 bundle (reference clusteringMetrics.evaluationClusterModelFromLabel)."""
    from sklearn import metrics

    out = clustering_accuracy(true_labels, pred_labels)
    out["nmi"] = float(
        metrics.normalized_mutual_info_score(true_labels, pred_labels)
    )
    out["ari"] = float(metrics.adjusted_rand_score(true_labels, pred_labels))
    return out
