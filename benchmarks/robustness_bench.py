#!/usr/bin/env python
"""Robustness benchmark: accuracy under sparsification, with and without the
learned repair pipeline (the framework's namesake capability).

For each (feature_rate, edge_rate): train on the clean graph, the sparsified
graph, and the augmented (repaired) graph, and report best-test accuracy.
Hermetic (SBM dataset); CPU- or TPU-runnable.

Usage: python benchmarks/robustness_bench.py [--nodes 1500] [--model sgc]
"""

import argparse
import json
import sys
import tempfile

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def run_one(dataset, model_name, epochs, lr, seed):
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    mc = ModelConfig(model_name=model_name, prop_steps=3, hidden_dim=64,
                     num_layers=2)
    tc = TrainingConfig(num_epochs=epochs, lr=lr, seed=seed)
    spec = load_model(mc, dataset.num_features, dataset.num_classes)
    return NodeClassification(dataset, spec, mc, tc).best_test


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1500)
    ap.add_argument("--classes", type=int, default=5)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--model", default="sgc")
    ap.add_argument("--epochs", type=int, default=120)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--seed", type=int, default=2023)
    ap.add_argument("--feature_signal", type=float, default=0.7)
    ap.add_argument("--feature_mode", default="binary",
                    help="binary (cora-like bag-of-words; masking destroys "
                         "signal, repair has something to recover) | gaussian")
    ap.add_argument("--rates", type=float, nargs="*",
                    default=[0.5, 0.7, 0.9])
    args = ap.parse_args()

    from ssrg_tpu.configs.config import DataAugmentConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.data.sparsity import load_homo_simplex_sparsity_dataset
    from ssrg_tpu.pipelines.augment import augment_dataset
    from ssrg_tpu.pipelines.sparsify import sparsify_dataset

    clean = planetoid_like(
        num_node=args.nodes, num_classes=args.classes,
        num_features=args.features, seed=args.seed,
        feature_signal=args.feature_signal,
        feature_mode=args.feature_mode,
    )
    acc_clean = run_one(clean, args.model, args.epochs, args.lr, args.seed)
    rows = []
    with tempfile.TemporaryDirectory() as tmp:
        for rate in args.rates:
            name = f"sbm_{rate}_{rate}"
            sp_out = f"{tmp}/sp/{name}"
            aug_out = f"{tmp}/aug/{name}"
            sparsify_dataset(clean, rate, rate, sp_out, seed=args.seed)
            ds_sparse = load_homo_simplex_sparsity_dataset(
                name, f"{tmp}/sp", "official"
            )
            acc_sparse = run_one(
                ds_sparse, args.model, args.epochs, args.lr, args.seed
            )
            augment_dataset(
                ds_sparse, DataAugmentConfig(epochs=150, hidden_dim=64),
                aug_out, seed=args.seed,
            )
            ds_aug = load_homo_simplex_sparsity_dataset(
                name, f"{tmp}/aug", "official", is_augumented=True,
            )
            acc_aug = run_one(
                ds_aug, args.model, args.epochs, args.lr, args.seed
            )
            rows.append({
                "rate": rate,
                "sparse_acc": round(float(acc_sparse), 4),
                "augmented_acc": round(float(acc_aug), 4),
                "recovered": round(float(acc_aug - acc_sparse), 4),
            })
    print(json.dumps({
        "metric": "robustness_recovery",
        "model": args.model,
        "clean_acc": round(float(acc_clean), 4),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
