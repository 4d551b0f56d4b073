#!/usr/bin/env python
"""Example: train any zoo model on a dataset (synthetic SBM by default).

    python examples/train_node_classification.py --model gamlp
    python examples/train_node_classification.py --model wavelet --epochs 150
"""

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sgc")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--nodes", type=int, default=2000)
    ap.add_argument("--prop_steps", type=int, default=3)
    args = ap.parse_args()

    from ssrg_tpu import ModelConfig, TrainingConfig
    from ssrg_tpu.data.synthetic import planetoid_like
    from ssrg_tpu.models import load_model
    from ssrg_tpu.train import NodeClassification

    ds = planetoid_like(num_node=args.nodes, num_classes=5, num_features=64)
    cfg = ModelConfig(model_name=args.model, prop_steps=args.prop_steps,
                      hidden_dim=128, num_layers=2)
    tcfg = TrainingConfig(num_epochs=args.epochs, lr=args.lr)
    spec = load_model(cfg, ds.num_features, ds.num_classes)
    task = NodeClassification(ds, spec, cfg, tcfg, verbose=False)
    print(f"{args.model}: best val {task.best_val:.4f}, "
          f"best test {task.best_test:.4f} "
          f"(preprocess {task.prepared.preprocess_seconds:.2f}s)")


if __name__ == "__main__":
    main()
