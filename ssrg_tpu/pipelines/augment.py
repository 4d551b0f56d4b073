"""Robust augmentation pipeline: learned feature repair + edge completion.

Rebuild of ``SSRG/data_augument.py:19-157`` (SURVEY.md §2.10, §3.4):

1. ``feature_augment`` — train a :class:`FeatureAugment2MLP` encoder (jitted
   optax loop): the training loss is CE on the CLEAN features' logits over
   the train split (the reference defines L1/CE variants but uses only
   ``loss2``, ``data_augument.py:39-44``); the best snapshot is selected by
   test accuracy on the SPARSE features. The emitted node representation is
   ``[hidden_act | softmax(logits)]`` evaluated on the sparse features.
2. ``edge_augment`` — for every node with degree < ``degree_level``, sample
   ``deficit * candidates_per_deficit`` candidate partners and connect the
   ``deficit`` nearest by L2 distance in the augmented-feature space, then
   symmetrize + dedupe. The reference's per-node Python loop
   (``data_augument.py:84-98``) is replaced by one vectorized batch of
   candidate draws and a top-k.
3. ``augment_dataset`` — write the augmented 8-file raw dir
   (``augument_datasets/...`` layout).
"""

from __future__ import annotations

import os.path as osp
from typing import Optional, Tuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssrg_tpu.configs.config import DataAugmentConfig
from ssrg_tpu.models.heads import FeatureAugment2MLP
from ssrg_tpu.pipelines.sparsify import save_raw_dataset
from ssrg_tpu.train.common import make_optimizer


def feature_augment(
    dataset,
    cfg: DataAugmentConfig,
    seed: int = 2023,
    verbose: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Train the repair encoder; return (augmented_features [N, H+C],
    soft_label [N, C])."""
    x_clean = jnp.asarray(dataset.x, jnp.float32)
    x_sparse = jnp.asarray(dataset.sparse_x, jnp.float32) \
        if hasattr(dataset, "sparse_x") else x_clean
    y = jnp.asarray(dataset.y)
    train_idx = jnp.asarray(np.asarray(dataset.train_idx))
    test_idx = jnp.asarray(np.asarray(dataset.test_idx))

    module = FeatureAugment2MLP(
        hidden_dim=cfg.hidden_dim,
        output_dim=dataset.num_classes,
        dropout=cfg.dropout,
    )
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = module.init(
        {"params": init_rng, "dropout": init_rng}, x_clean[:2], train=False
    )["params"]
    tx = make_optimizer(cfg.lr, cfg.weight_decay)
    opt_state = tx.init(params)

    # feature/label arrays ride through jit as ARGUMENTS (partial-bound),
    # not closure captures — captured device arrays become HLO constants
    @jax.jit
    def train_step(x_clean, x_sparse, y, train_idx, params, opt_state,
                   dropout_rng):
        def loss_fn(p):
            _, logits = module.apply(
                {"params": p}, x_clean, train=True,
                rngs={"dropout": dropout_rng},
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits[train_idx], y[train_idx]
            ).mean()
            if cfg.l1_weight or cfg.sparse_ce_weight:
                rng2 = jax.random.fold_in(dropout_rng, 1)
                _, sp_logits = module.apply(
                    {"params": p}, x_sparse, train=True, rngs={"dropout": rng2}
                )
                if cfg.l1_weight:
                    # loss1: L1 between sparse and clean logits on train rows
                    loss = loss + cfg.l1_weight * jnp.abs(
                        sp_logits[train_idx] - logits[train_idx]
                    ).mean()
                if cfg.sparse_ce_weight:
                    # loss3: CE on the sparse-feature logits
                    loss = loss + cfg.sparse_ce_weight * (
                        optax.softmax_cross_entropy_with_integer_labels(
                            sp_logits[train_idx], y[train_idx]
                        ).mean()
                    )
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def test_acc(x_sparse, y, test_idx, params):
        _, logits = module.apply({"params": params}, x_sparse, train=False)
        pred = jnp.argmax(logits[test_idx], axis=1)
        return jnp.mean((pred == y[test_idx]).astype(jnp.float32))

    train_step = partial(train_step, x_clean, x_sparse, y, train_idx)
    test_acc = partial(test_acc, x_sparse, y, test_idx)

    best_acc, best_params = -1.0, params
    for epoch in range(cfg.epochs):
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss = train_step(params, opt_state, step_rng)
        acc = float(test_acc(params))
        if acc > best_acc:
            best_acc = acc
            best_params = jax.tree_util.tree_map(lambda a: a.copy(), params)
    if verbose:
        print(f"best_acc: {best_acc:.4f}")

    hidden, logits = module.apply({"params": best_params}, x_sparse, train=False)
    soft_label = jax.nn.softmax(logits, axis=1)
    feature = jnp.concatenate([hidden, soft_label], axis=1)
    return np.asarray(feature), np.asarray(soft_label)


def edge_augment(
    dataset,
    feature: np.ndarray,
    cfg: DataAugmentConfig,
    seed: int = 2023,
) -> np.ndarray:
    """Low-degree edge completion; returns symmetric, deduped
    edge_index [2, E']. Distances are computed in the space of ``feature``
    (the reference passes the full augmented feature as the ranking key,
    ``data_augument.py:155-156``)."""
    rng = np.random.default_rng(seed)
    edge = dataset.edge
    row = np.asarray(edge.row, np.int64)
    col = np.asarray(edge.col, np.int64)
    n = dataset.x.shape[0]

    # degree = occurrences in the stored (single-direction) edge list, both
    # endpoints counted — the reference counts over concat(row, col)
    deg = np.bincount(np.concatenate([row, col]), minlength=n)
    need = np.where(deg < cfg.degree_level)[0]
    new_pairs = []
    if need.size:
        deficits = (cfg.degree_level - deg[need]).astype(np.int64)
        max_def = int(deficits.max())
        n_cand = max_def * cfg.candidates_per_deficit
        # candidate draw per needy node, excluding self (vectorized re-draw)
        cand = rng.integers(0, n, size=(need.size, n_cand))
        self_hit = cand == need[:, None]
        while self_hit.any():
            cand[self_hit] = rng.integers(0, n, size=int(self_hit.sum()))
            self_hit = cand == need[:, None]
        # L2 distance in feature space: [need, n_cand]
        diff = feature[cand] - feature[need][:, None, :]
        dist = np.linalg.norm(diff, axis=2)
        order = np.argsort(dist, axis=1)
        for i, node in enumerate(need):
            k = int(deficits[i])
            chosen = cand[i, order[i, :k]]
            new_pairs.append(
                np.stack([np.full(k, node, np.int64), chosen.astype(np.int64)])
            )
    edge_index = np.concatenate(
        [np.stack([row, col])] + new_pairs, axis=1
    ) if new_pairs else np.stack([row, col])
    # mirror + unique (reference data_augument.py:99-102)
    mirrored = np.concatenate([edge_index, edge_index[::-1]], axis=1)
    uniq = np.unique(mirrored.T, axis=0).T
    return uniq


def augment_dataset(
    dataset,
    cfg: DataAugmentConfig,
    out_dir: str,
    seed: int = 2023,
    verbose: bool = False,
) -> str:
    """Full pipeline: feature repair -> edge completion -> raw dump."""
    feature, soft_label = feature_augment(dataset, cfg, seed, verbose)
    edge_index = edge_augment(dataset, feature, cfg, seed)
    return save_raw_dataset(
        out_dir, feature, edge_index, np.asarray(dataset.y),
        np.asarray(dataset.train_idx), np.asarray(dataset.val_idx),
        np.asarray(dataset.test_idx),
        np.asarray(dataset.feature_mask) if dataset.feature_mask is not None else None,
        np.asarray(dataset.edge_mask) if dataset.edge_mask is not None else None,
    )


def run_augment(args) -> None:
    """CLI hook (``ssrg-tpu augment``)."""
    from ssrg_tpu.data.sparsity import load_homo_simplex_sparsity_dataset

    cfg = DataAugmentConfig(
        data_name=args.data_name, data_root=args.data_root,
        hidden_dim=args.hidden_dim, dropout=args.dropout,
        weight_decay=args.weight_decay, lr=args.lr, epochs=args.epochs,
        degree_level=args.degree_level, data_save_path=args.data_save_path,
    )
    dataset = load_homo_simplex_sparsity_dataset(
        cfg.data_name, cfg.data_root, args.data_split,
        surrogate_features=getattr(args, "surrogate_features", False),
    )
    out = osp.join(cfg.data_save_path, cfg.data_name)
    raw = augment_dataset(dataset, cfg, out, args.seed, verbose=True)
    print(f"augmented dataset written to {raw}")
