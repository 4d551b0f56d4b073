"""Single CLI entry point.

Replaces the reference's five import-time argparse config modules and three
entry scripts (``SSRG/main.py``, ``data_process.py``, ``data_augument.py``;
SURVEY.md §2.10) with one subcommand CLI that populates the dataclass config
tree — no import-time side effects.

Subcommands:
- ``train``     node classification on a dataset (reference SSRG/main.py)
- ``spmd``      multi-chip SPMD training over a (graph, data) device mesh
- ``sparsify``  graph sparsification pipeline (reference SSRG/data_process.py)
- ``augment``   robust augmentation pipeline (reference SSRG/data_augument.py)
- ``baseline``  message-passing baseline zoo (reference /main.py)
- ``link``      link classification (reference tasks/link_classification.py)
- ``gwnn``      standalone GWNN pipeline (reference wavelet/src/main.py)
- ``predict``   checkpoint-backed inference (ssrg_tpu/serve.py)
- ``autotune``  per-graph SpMM engine diagnosis
- ``ooc``       out-of-core spool -> propagate -> train (papers100M ladder)
- ``bench``     K-hop SpMM precompute benchmark
"""

from __future__ import annotations

import argparse
import sys


def _add_model_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--model_name", default="sgc",
                   help="sgc|ssgc|sign|gbp|gamlp|nafs|gcn|wavelet|clean_train"
                        "|magnet|two_dir|two_order")
    p.add_argument("--num_layers", type=int, default=3)
    p.add_argument("--dropout", type=float, default=0.5)
    p.add_argument("--hidden_dim", type=int, default=256)
    p.add_argument("--prop_steps", type=int, default=3)
    p.add_argument("--r", type=float, default=0.5)
    p.add_argument("--ppr_alpha", type=float, default=0.1)
    p.add_argument("--message_alpha", type=float, default=0.5)
    p.add_argument("--q", type=float, default=0.05)
    p.add_argument("--edge_mode", default="concat",
                   help="link-scorer pair features: concat|hadamard")


def _add_training_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--seed", type=int, default=2023)
    p.add_argument("--normalize_times", type=int, default=1)
    p.add_argument("--num_epochs", type=int, default=300)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--weight_decay", type=float, default=1e-5)
    p.add_argument("--warmup_epochs", type=int, default=0,
                   help="linear lr ramp over the first N epochs (reference "
                        "adjust_learning_rate)")
    p.add_argument("--train_batch_size", type=int, default=None)
    p.add_argument("--eval_batch_size", type=int, default=None)
    p.add_argument("--spmm_engine", default="auto",
                   help="auto|dense|coo|ell|hybrid|banded|tiled|reorder_banded|reorder_tiled|pallas|pallas_banded|autotune")
    p.add_argument("--spmm_bf16", action="store_true",
                   help="bf16 dense-block storage for the reorder engines "
                        "(fastest measured tier; rounds the precompute to "
                        "half precision)")
    p.add_argument("--cluster_merge_target", type=int, default=0,
                   help="reorder_tiled only: merge LPA communities into "
                        "super-clusters of up to N nodes (heavy-edge "
                        "matching) before the tiled pack — raises the "
                        "dense-tile fraction on fragmented community "
                        "structure (0 = flat LPA)")
    p.add_argument("--scan_epochs", action="store_true",
                   help="run all epochs inside one jitted lax.scan "
                        "(single dispatch; full-batch, BN-free runs)")
    p.add_argument("--checkpoint_path", default=None,
                   help="save best-val params here (ssrg-tpu predict reads it)")
    p.add_argument("--resume_from", default=None,
                   help="warm-start params from a checkpoint")
    p.add_argument("--cache_dir", default=None,
                   help="disk cache for propagated hop features")


def _add_data_flags(p: argparse.ArgumentParser) -> None:
    p.add_argument("--data_name", default="cora_0_0")
    p.add_argument("--data_root", default="./sparsity_datasets/simhomo/Planetoid")
    p.add_argument("--data_split", default="official")
    p.add_argument("--surrogate_features", action="store_true",
                   help="ignore feature.pt and build deterministic "
                        "structural features from the intact edge list "
                        "(for snapshots with truncated feature blobs)")
    p.add_argument("--synthetic", action="store_true",
                   help="use a hermetic SBM dataset instead of files")
    p.add_argument("--synthetic_nodes", type=int, default=2708)
    p.add_argument("--synthetic_classes", type=int, default=7)
    p.add_argument("--synthetic_features", type=int, default=256)


def _load_dataset(args):
    if args.synthetic:
        from ssrg_tpu.data.synthetic import planetoid_like

        return planetoid_like(
            num_node=args.synthetic_nodes,
            num_classes=args.synthetic_classes,
            num_features=args.synthetic_features,
            seed=args.seed,
        )
    from ssrg_tpu.data.sparsity import load_homo_simplex_sparsity_dataset

    return load_homo_simplex_sparsity_dataset(
        name=args.data_name, root=args.data_root, split=args.data_split,
        surrogate_features=getattr(args, "surrogate_features", False),
    )


def cmd_train(args) -> int:
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.node_classification import NodeClassification

    dataset = _load_dataset(args)
    model_cfg = ModelConfig(
        model_name=args.model_name, num_layers=args.num_layers,
        dropout=args.dropout, hidden_dim=args.hidden_dim,
        prop_steps=args.prop_steps, r=args.r, ppr_alpha=args.ppr_alpha,
        message_alpha=args.message_alpha, q=args.q,
        edge_mode=getattr(args, "edge_mode", "concat"),
    )
    train_cfg = TrainingConfig(
        seed=args.seed, normalize_times=args.normalize_times,
        num_epochs=args.num_epochs, lr=args.lr,
        weight_decay=args.weight_decay,
        warmup_epochs=args.warmup_epochs,
        train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size,
        spmm_engine=args.spmm_engine,
        spmm_bf16=getattr(args, "spmm_bf16", False),
        cluster_merge_target=getattr(args, "cluster_merge_target", 0),
        scan_epochs=args.scan_epochs,
        checkpoint_path=args.checkpoint_path,
        resume_from=args.resume_from,
        cache_dir=args.cache_dir,
    )
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = NodeClassification(
        dataset, spec, model_cfg, train_cfg, verbose=args.verbose
    )
    print(f"Best val: {task.best_val:.4f}, best test: {task.best_test:.4f}")
    return 0


def cmd_spmd(args) -> int:
    """Multi-chip SPMD training over a (graph, data) device mesh.

    The CLI surface for ``parallel.dist_train.build_spmd_context`` — the
    scaling layer the single-device reference lacks (SURVEY.md §2.14):
    cluster-aligned row partition, per-shard fast local SpMM (tiled or
    hybrid) inside shard_map, all-gather or halo-only exchange, and a
    data-parallel head. Run under real chips it scales over ICI; in this
    container it validates on the virtual CPU mesh (tests/conftest.py)."""
    import jax
    import numpy as np

    from ssrg_tpu.configs.config import ModelConfig
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.parallel.dist_train import (
        build_spmd_context, run_epochs_scan, run_multi,
    )
    from ssrg_tpu.parallel.mesh import make_mesh

    if args.steps < 1:
        print(f"error: --steps must be >= 1 (got {args.steps})")
        return 2
    if args.num_runs < 1:
        print(f"error: --num_runs must be >= 1 (got {args.num_runs})")
        return 2
    dataset = _load_dataset(args)
    devices = jax.devices()
    shards = args.num_shards or len(devices)
    data_par = args.data_parallel
    need = shards * max(data_par, 1)
    if len(devices) < need:
        print(f"error: mesh needs {need} devices "
              f"({shards} graph x {max(data_par, 1)} data), "
              f"have {len(devices)}")
        return 2
    if data_par > 1:
        mesh = make_mesh((shards, data_par), ("graph", "data"),
                         devices[:need])
        data_axis = "data"
    else:
        mesh = make_mesh((shards,), ("graph",), devices[:shards])
        data_axis = None

    model_cfg = ModelConfig(
        model_name=args.model_name, num_layers=args.num_layers,
        dropout=args.dropout, hidden_dim=args.hidden_dim,
        prop_steps=args.prop_steps, r=args.r,
    )
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    adj_norm = sym_norm(dataset.adj, model_cfg.r)
    ctx = build_spmd_context(
        adj_norm, dataset.x, dataset.y, dataset.train_idx, spec.module,
        mesh, model_cfg.prop_steps, lr=args.lr,
        weight_decay=args.weight_decay, data_axis=data_axis,
        seed=args.seed, local_engine=args.local_engine, comm=args.comm,
        reorder=None if args.reorder in (None, "none") else args.reorder,
        tile_bf16=args.tile_bf16,
        val_idx=dataset.val_idx, test_idx=dataset.test_idx,
    )
    # reference protocol under the mesh (VERDICT r4 ask 2): hop tensor
    # precomputed once via the sharded propagate, then ONE lax.scan dispatch
    # trains --steps epochs with per-epoch masked val/test accuracy and
    # device-side best-val→test tracking; --num_runs > 1 adds the reference
    # multi-run mean±std
    if args.num_runs > 1:
        ctx, res = run_multi(ctx, args.steps, args.num_runs, seed=args.seed)
        vm, vs, tm, ts = res.mean_std
        acc_note = (f"val {vm:.4f}±{vs:.4f}, test {tm:.4f}±{ts:.4f} "
                    f"over {args.num_runs} runs")
    else:
        ctx, res = run_epochs_scan(ctx, args.steps, seed=args.seed)
        acc_note = (f"best val {res.best_val:.4f}, "
                    f"best test {res.best_test:.4f} "
                    f"(epoch {res.best_epoch + 1})")
    loss0 = float(res.history[0][0])
    loss = res.final_loss
    print(f"spmd: mesh {dict(mesh.shape)}, engine {args.local_engine}, "
          f"comm {args.comm}, loss {loss0:.4f} -> {loss:.4f} "
          f"over {args.steps} epochs (one scanned dispatch), {acc_note}")
    if not np.isfinite(loss):
        return 1
    return 0


def cmd_sparsify(args) -> int:
    from ssrg_tpu.pipelines.sparsify import run_sparsify

    run_sparsify(args)
    return 0


def cmd_augment(args) -> int:
    from ssrg_tpu.pipelines.augment import run_augment

    run_augment(args)
    return 0


def cmd_baseline(args) -> int:
    from ssrg_tpu.configs.config import TrainingConfig
    from ssrg_tpu.train.baseline_task import BaselineTask

    dataset = _load_dataset(args)
    unsupported = [
        name for name in ("train_batch_size", "eval_batch_size",
                          "scan_epochs", "checkpoint_path", "resume_from",
                          "cache_dir")
        if getattr(args, name, None)
    ]
    if unsupported:
        print(f"note: the baseline task ignores {', '.join(unsupported)} "
              f"(use --cluster_parts for minibatching)")
    cfg = TrainingConfig(
        seed=args.seed, num_epochs=args.num_epochs, lr=args.lr,
        weight_decay=args.weight_decay, spmm_engine=args.spmm_engine,
    )
    task = BaselineTask(
        dataset, args.model_name, cfg, hidden_dim=args.hidden_dim,
        num_layers=args.num_layers, dropout=args.dropout, runs=args.runs,
        cluster_parts=args.cluster_parts,
        parts_per_batch=args.parts_per_batch,
    )
    task.logger.print_statistics()
    return 0


def cmd_link(args) -> int:
    """Link classification (reference SSRG/tasks/link_classification.py).

    With ``--data_name`` the edge-pair splits are generated from the
    file-backed graph (held-out-edge protocol,
    ``data/link.py::link_dataset_from_graph``); otherwise a hermetic
    synthetic dataset is used."""
    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.data.link import link_dataset_from_graph, synthetic_link_dataset
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.train.link_classification import LinkClassification

    if args.data_name:
        from ssrg_tpu.data.sparsity import load_homo_simplex_sparsity_dataset

        node_ds = load_homo_simplex_sparsity_dataset(
            name=args.data_name, root=args.data_root, split=args.data_split,
            surrogate_features=args.surrogate_features,
        )
        dataset = link_dataset_from_graph(
            node_ds, val_frac=args.val_frac, test_frac=args.test_frac,
            neg_ratio=args.neg_ratio, seed=args.seed,
        )
    else:
        dataset = synthetic_link_dataset(
            num_node=args.synthetic_nodes,
            num_classes=args.synthetic_classes,
            num_features=args.synthetic_features,
            num_pairs=args.num_pairs,
            seed=args.seed,
            label_mode=args.label_mode,
        )
    model_cfg = ModelConfig(
        model_name=args.model_name, num_layers=args.num_layers,
        dropout=args.dropout, hidden_dim=args.hidden_dim,
        prop_steps=args.prop_steps, r=args.r, ppr_alpha=args.ppr_alpha,
        message_alpha=args.message_alpha, q=args.q,
        edge_mode=getattr(args, "edge_mode", "concat"),
    )
    train_cfg = TrainingConfig(
        seed=args.seed, normalize_times=args.normalize_times,
        num_epochs=args.num_epochs, lr=args.lr,
        weight_decay=args.weight_decay, spmm_engine=args.spmm_engine,
        warmup_epochs=args.warmup_epochs,
        train_batch_size=args.train_batch_size,
        eval_batch_size=args.eval_batch_size,
        scan_epochs=args.scan_epochs,
        checkpoint_path=args.checkpoint_path,
        resume_from=args.resume_from,
        cache_dir=args.cache_dir,
    )
    if args.checkpoint_path or args.resume_from:
        print("note: the link task does not checkpoint/resume yet; "
              "--checkpoint_path/--resume_from are ignored")
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    task = LinkClassification(
        dataset, spec, model_cfg, train_cfg, verbose=args.verbose
    )
    print(f"Best val: {task.best_val:.4f}, best test: {task.best_test:.4f}")
    return 0


def cmd_gwnn(args) -> int:
    """Standalone GWNN pipeline (reference wavelet/src/main.py:8-26)."""
    import json

    import numpy as np

    from ssrg_tpu.models.gwnn import (
        GWNNConfig, GWNNTrainer, WaveletSparsifier,
        read_edges_csv, read_features_json, read_targets_csv,
    )

    if args.edge_path:
        adj = read_edges_csv(args.edge_path)
        features = read_features_json(args.features_path, adj.shape[0])
        targets = read_targets_csv(args.target_path)
    else:
        from ssrg_tpu.data.synthetic import sbm_graph

        g = sbm_graph(
            args.synthetic_nodes, args.synthetic_classes,
            args.synthetic_features, seed=args.seed,
        )
        adj, features, targets = g.adj, g.x, g.y

    cfg = GWNNConfig(
        epochs=args.num_epochs, filters=args.filters,
        approximation_order=args.approximation_order,
        tolerance=args.tolerance, scale=args.scale, dropout=args.dropout,
        learning_rate=args.lr, weight_decay=args.weight_decay,
        test_size=args.test_size, seed=args.seed,
    )
    # the GWNN path builds device adjacencies directly: meta-engines that
    # need the precompute pipeline resolve to auto here
    engine = args.spmm_engine
    if engine in ("autotune", "reorder_banded", "reorder_tiled"):
        engine = "auto"
    sparsifier = WaveletSparsifier(
        adj, cfg.scale, cfg.approximation_order, cfg.tolerance,
        engine=engine,
    )
    sparsifier.calculate_all_wavelets(verbose=args.verbose)
    trainer = GWNNTrainer(
        cfg, sparsifier, features, targets, engine=engine
    )
    trainer.fit(verbose=args.verbose, scan=args.scan_epochs)
    acc = trainer.score()
    print(f"Test accuracy: {acc:.4f}")
    if args.log_path:
        with open(args.log_path, "w") as f:
            json.dump(trainer.logs, f, indent=2)
    return 0


def cmd_predict(args) -> int:
    """Checkpoint-backed inference (ssrg_tpu/serve.py)."""
    import numpy as np

    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.models.zoo import load_model
    from ssrg_tpu.serve import Predictor

    dataset = _load_dataset(args)
    model_cfg = ModelConfig(
        model_name=args.model_name, num_layers=args.num_layers,
        dropout=args.dropout, hidden_dim=args.hidden_dim,
        prop_steps=args.prop_steps, r=args.r, ppr_alpha=args.ppr_alpha,
        message_alpha=args.message_alpha, q=args.q,
        edge_mode=getattr(args, "edge_mode", "concat"),
    )
    spec = load_model(model_cfg, dataset.num_features, dataset.num_classes)
    pred = Predictor(
        dataset, spec, model_cfg,
        TrainingConfig(spmm_engine=args.spmm_engine),
        checkpoint_path=args.checkpoint,
    )
    node_ids = (
        np.asarray([int(t) for t in args.nodes.split(",")])
        if args.nodes else np.asarray(dataset.test_idx)
    )
    labels = pred.predict(node_ids)
    if args.out:
        np.save(args.out, labels)
        print(f"wrote {labels.shape[0]} predictions to {args.out}")
    else:
        print(labels.tolist())
    if pred.metadata:
        print(f"checkpoint metadata: {pred.metadata}")
    return 0


def cmd_autotune(args) -> int:
    """Per-graph SpMM engine diagnosis (ops/autotune.py)."""
    import json

    from ssrg_tpu.ops.autotune import autotune_engine

    dataset = _load_dataset(args)
    best, timings = autotune_engine(
        dataset.adj, args.features, reps=args.reps, verbose=True
    )
    print(json.dumps({
        "best": best,
        "ms_per_hop": {k: round(v * 1e3, 3) for k, v in timings.items()},
        "num_nodes": int(dataset.adj.shape[0]),
        "nnz": int(dataset.adj.nnz),
    }))
    return 0


def cmd_ooc(args) -> int:
    """Out-of-core node classification (papers100M ladder as a command):
    spool the adjacency from a memory-mapped edge file, propagate K hops
    block-at-a-time, then minibatch-train a precompute model over the on-disk
    hop directories (O(block·F) device / O(batch·K·F) host memory)."""
    import numpy as np

    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.train.outofcore_task import run_outofcore

    model_cfg = ModelConfig(
        model_name=args.model_name, num_layers=args.num_layers,
        dropout=args.dropout, hidden_dim=args.hidden_dim,
        prop_steps=args.prop_steps, r=args.r, ppr_alpha=args.ppr_alpha,
        message_alpha=args.message_alpha, q=args.q,
    )
    train_cfg = TrainingConfig(
        seed=args.seed, num_epochs=args.num_epochs, lr=args.lr,
        weight_decay=args.weight_decay, warmup_epochs=args.warmup_epochs,
        train_batch_size=args.train_batch_size or 512,
    )

    def _load_idx(path):
        return np.load(path) if path else None

    result = run_outofcore(
        args.edges, args.features, args.labels, args.work_dir,
        num_shards=args.num_shards, model_cfg=model_cfg,
        train_cfg=train_cfg,
        train_idx=_load_idx(args.train_idx),
        val_idx=_load_idx(args.val_idx),
        test_idx=_load_idx(args.test_idx),
        verbose=args.verbose,
    )
    print(f"Best val: {result.best_val:.4f}, best test: {result.best_test:.4f}")
    return 0


def cmd_bench(args) -> int:
    from ssrg_tpu.bench import run_bench

    run_bench(
        num_nodes=args.nodes, avg_degree=args.degree,
        num_features=args.features, prop_steps=args.prop_steps,
        engine=args.spmm_engine,
    )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(
        prog="ssrg-tpu", description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    sub = parser.add_subparsers(dest="command", required=True)

    p_train = sub.add_parser("train", help="train a model (node classification)")
    _add_model_flags(p_train)
    _add_training_flags(p_train)
    _add_data_flags(p_train)
    p_train.add_argument("--verbose", action="store_true")
    p_train.set_defaults(fn=cmd_train)

    p_spmd = sub.add_parser(
        "spmd", help="multi-chip SPMD training over a (graph, data) mesh"
    )
    p_spmd.add_argument("--model_name", default="gamlp",
                        help="precompute-family model (sgc|ssgc|sign|gbp|"
                             "gamlp|...)")
    p_spmd.add_argument("--num_layers", type=int, default=2)
    p_spmd.add_argument("--dropout", type=float, default=0.5)
    p_spmd.add_argument("--hidden_dim", type=int, default=64)
    p_spmd.add_argument("--prop_steps", type=int, default=3)
    p_spmd.add_argument("--r", type=float, default=0.5)
    p_spmd.add_argument("--num_shards", type=int, default=None,
                        help="graph-axis size (default: all devices)")
    p_spmd.add_argument("--data_parallel", type=int, default=1,
                        help=">1 adds a data axis (2-D mesh)")
    p_spmd.add_argument("--local_engine", default="tiled",
                        help="tiled|hybrid|coo per-shard SpMM layout")
    p_spmd.add_argument("--comm", default="halo",
                        help="halo|all_gather exchange mode")
    p_spmd.add_argument("--reorder", default="cluster",
                        help="cluster|none — cluster-align shard boundaries")
    p_spmd.add_argument("--tile_bf16", action="store_true",
                        help="bf16 dense-tile storage (tiled engine)")
    p_spmd.add_argument("--steps", type=int, default=100,
                        help="training epochs (head-only, one scanned "
                             "dispatch over precomputed hops)")
    p_spmd.add_argument("--num_runs", type=int, default=1,
                        help="re-init + retrain this many times; reports "
                             "mean±std (reference multi-run protocol)")
    p_spmd.add_argument("--lr", type=float, default=0.01)
    p_spmd.add_argument("--weight_decay", type=float, default=1e-5)
    p_spmd.add_argument("--seed", type=int, default=2023)
    _add_data_flags(p_spmd)
    p_spmd.set_defaults(fn=cmd_spmd)

    p_sp = sub.add_parser("sparsify", help="sparsify a dataset (mask features/edges)")
    p_sp.add_argument("--dataset", default="cora")
    p_sp.add_argument("--dataroot", default="./datasets/simhomo/")
    p_sp.add_argument("--seed", type=int, default=2023)
    p_sp.add_argument("--sparse_rate", type=float, nargs=2, default=[0.6, 0.6])
    p_sp.add_argument("--out_root", default="./sparsity_datasets/simhomo")
    p_sp.add_argument("--synthetic", action="store_true")
    p_sp.set_defaults(fn=cmd_sparsify)

    p_aug = sub.add_parser("augment", help="repair a sparsified dataset")
    _add_data_flags(p_aug)
    p_aug.add_argument("--hidden_dim", type=int, default=256)
    p_aug.add_argument("--dropout", type=float, default=0.5)
    p_aug.add_argument("--weight_decay", type=float, default=5e-4)
    p_aug.add_argument("--lr", type=float, default=0.01)
    p_aug.add_argument("--epochs", type=int, default=200)
    p_aug.add_argument("--degree_level", type=int, default=1)
    p_aug.add_argument("--seed", type=int, default=2023)
    p_aug.add_argument("--data_save_path", default="./augument_datasets/simhomo/")
    p_aug.set_defaults(fn=cmd_augment)

    p_base = sub.add_parser(
        "baseline", help="baseline message-passing pipeline (reference main.py)"
    )
    p_base.add_argument("--model_name", default="gcn",
                        help="mlp|robust_mlp|gcn|sage|gat|sgc|sign")
    p_base.add_argument("--runs", type=int, default=1)
    p_base.add_argument("--hidden_dim", type=int, default=64)
    p_base.add_argument("--num_layers", type=int, default=2)
    p_base.add_argument("--dropout", type=float, default=0.5)
    p_base.add_argument("--cluster_parts", type=int, default=None)
    p_base.add_argument("--parts_per_batch", type=int, default=8)
    _add_training_flags(p_base)
    _add_data_flags(p_base)
    p_base.set_defaults(fn=cmd_baseline)

    p_link = sub.add_parser(
        "link", help="link classification (reference tasks/link_classification.py)"
    )
    _add_model_flags(p_link)
    _add_training_flags(p_link)
    p_link.add_argument("--data_name", default=None,
                        help="file-backed dataset name (e.g. cora_0_0); "
                             "omit for a hermetic synthetic graph")
    p_link.add_argument("--data_root",
                        default="./sparsity_datasets/simhomo/Planetoid")
    p_link.add_argument("--data_split", default="official")
    p_link.add_argument("--surrogate_features", action="store_true",
                        help="structural features from the intact edge list")
    p_link.add_argument("--val_frac", type=float, default=0.1,
                        help="fraction of edges held out as val positives")
    p_link.add_argument("--test_frac", type=float, default=0.2,
                        help="fraction of edges held out as test positives")
    p_link.add_argument("--neg_ratio", type=float, default=1.0,
                        help="sampled non-edges per positive pair")
    p_link.add_argument("--synthetic_nodes", type=int, default=600)
    p_link.add_argument("--synthetic_classes", type=int, default=3)
    p_link.add_argument("--synthetic_features", type=int, default=32)
    p_link.add_argument("--num_pairs", type=int, default=900)
    p_link.add_argument("--label_mode", default="source_class",
                        help="source_class|same_community")
    p_link.add_argument("--verbose", action="store_true")
    p_link.set_defaults(fn=cmd_link)

    p_gwnn = sub.add_parser(
        "gwnn", help="standalone GWNN pipeline (reference wavelet/src/main.py)"
    )
    p_gwnn.add_argument("--edge_path", default=None,
                        help="edge-list CSV; omit for a hermetic SBM graph")
    p_gwnn.add_argument("--features_path", default=None)
    p_gwnn.add_argument("--target_path", default=None)
    p_gwnn.add_argument("--log_path", default=None,
                        help="write per-epoch JSON logs here")
    p_gwnn.add_argument("--num_epochs", type=int, default=200)
    p_gwnn.add_argument("--filters", type=int, default=32)
    p_gwnn.add_argument("--approximation_order", type=int, default=3)
    p_gwnn.add_argument("--tolerance", type=float, default=1e-4)
    p_gwnn.add_argument("--scale", type=float, default=1.0)
    p_gwnn.add_argument("--dropout", type=float, default=0.5)
    p_gwnn.add_argument("--lr", type=float, default=0.01)
    p_gwnn.add_argument("--weight_decay", type=float, default=1e-5)
    p_gwnn.add_argument("--test_size", type=float, default=0.2)
    p_gwnn.add_argument("--seed", type=int, default=42)
    p_gwnn.add_argument("--spmm_engine", default="auto")
    p_gwnn.add_argument("--scan_epochs", action="store_true",
                        help="all epochs in one jitted lax.scan")
    p_gwnn.add_argument("--synthetic_nodes", type=int, default=600)
    p_gwnn.add_argument("--synthetic_classes", type=int, default=3)
    p_gwnn.add_argument("--synthetic_features", type=int, default=32)
    p_gwnn.add_argument("--verbose", action="store_true")
    p_gwnn.set_defaults(fn=cmd_gwnn)

    p_pred = sub.add_parser(
        "predict", help="checkpoint-backed inference (serve.py)"
    )
    _add_model_flags(p_pred)
    _add_data_flags(p_pred)
    p_pred.add_argument("--checkpoint", required=True,
                        help="params file written by train --checkpoint_path")
    p_pred.add_argument("--nodes", default=None,
                        help="comma-separated node ids (default: test split)")
    p_pred.add_argument("--out", default=None, help="write labels to .npy")
    p_pred.add_argument("--seed", type=int, default=2023)
    p_pred.add_argument("--spmm_engine", default="auto")
    p_pred.set_defaults(fn=cmd_predict)

    p_tune = sub.add_parser(
        "autotune", help="measure every SpMM engine on a dataset's graph"
    )
    _add_data_flags(p_tune)
    p_tune.add_argument("--features", type=int, default=128)
    p_tune.add_argument("--reps", type=int, default=8)
    p_tune.add_argument("--seed", type=int, default=2023)
    p_tune.set_defaults(fn=cmd_autotune)

    p_ooc = sub.add_parser(
        "ooc", help="out-of-core training: spool -> block-at-a-time K-hop "
                    "propagate -> minibatch train (papers100M ladder)"
    )
    _add_model_flags(p_ooc)
    _add_training_flags(p_ooc)
    p_ooc.add_argument("--edges", required=True,
                       help="int64 .npy [2, E] edge file (memory-mapped)")
    p_ooc.add_argument("--features", required=True,
                       help="f32 .npy [N, F] feature file (memory-mapped)")
    p_ooc.add_argument("--labels", required=True,
                       help="int64 .npy [N] label file")
    p_ooc.add_argument("--work_dir", required=True,
                       help="spool + hop-directory root (doubles as the "
                            "precompute checkpoint; reruns skip done work)")
    p_ooc.add_argument("--num_shards", type=int, default=8)
    p_ooc.add_argument("--train_idx", default=None, help=".npy index file")
    p_ooc.add_argument("--val_idx", default=None)
    p_ooc.add_argument("--test_idx", default=None)
    p_ooc.add_argument("--verbose", action="store_true")
    p_ooc.set_defaults(fn=cmd_ooc)

    p_bench = sub.add_parser("bench", help="K-hop SpMM precompute benchmark")
    p_bench.add_argument("--nodes", type=int, default=169_343)
    p_bench.add_argument("--degree", type=float, default=13.7)
    p_bench.add_argument("--features", type=int, default=128)
    p_bench.add_argument("--prop_steps", type=int, default=3)
    p_bench.add_argument("--spmm_engine", default="auto")
    p_bench.set_defaults(fn=cmd_bench)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
