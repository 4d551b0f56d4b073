"""CLI smoke tests — every subcommand runs end-to-end on tiny hermetic data.

The reference's entry points are SSRG/main.py (train), SSRG/data_process.py
(sparsify), SSRG/data_augument.py (augment), /root/reference/main.py
(baseline) and wavelet/src/main.py (gwnn); here they are subcommands of one
CLI (ssrg_tpu/cli.py).
"""

import json

from ssrg_tpu.cli import main


def test_cli_train_synthetic(capsys):
    rc = main([
        "train", "--synthetic", "--synthetic_nodes", "300",
        "--synthetic_features", "48", "--num_epochs", "30",
        "--model_name", "sgc", "--hidden_dim", "32", "--lr", "0.05",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Best val:" in out and "best test:" in out


def test_cli_link_synthetic(capsys):
    rc = main([
        "link", "--synthetic_nodes", "300", "--synthetic_features", "32",
        "--num_pairs", "400", "--num_epochs", "30", "--model_name", "sgc",
        "--hidden_dim", "32", "--lr", "0.05",
    ])
    assert rc == 0
    assert "Best val:" in capsys.readouterr().out


def test_cli_gwnn_synthetic(tmp_path, capsys):
    log_path = tmp_path / "logs.json"
    rc = main([
        "gwnn", "--synthetic_nodes", "200", "--synthetic_features", "24",
        "--num_epochs", "15", "--filters", "8",
        "--log_path", str(log_path),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Test accuracy:" in out
    logs = json.loads(log_path.read_text())
    assert len(logs) == 15 and {"epoch", "loss", "seconds"} <= set(logs[0])


def test_cli_sparsify_augment_train_roundtrip(tmp_path, capsys):
    sp_root = tmp_path / "sp"
    aug_root = tmp_path / "aug"
    rc = main([
        "sparsify", "--synthetic", "--sparse_rate", "0.5", "0.5",
        "--out_root", str(sp_root), "--seed", "7",
    ])
    assert rc == 0
    # discover the written dataset name (family dir layout)
    raws = list(sp_root.rglob("raw"))
    assert raws, "sparsify wrote no raw/ directory"
    name = raws[0].parent.name
    root = str(raws[0].parent.parent)
    rc = main([
        "augment", "--data_name", name, "--data_root", root,
        "--data_save_path", str(aug_root), "--epochs", "20",
        "--hidden_dim", "32",
    ])
    assert rc == 0
    aug_raws = list(aug_root.rglob("raw"))
    assert aug_raws
    rc = main([
        "train", "--data_name", aug_raws[0].parent.name,
        "--data_root", str(aug_raws[0].parent.parent),
        "--num_epochs", "30", "--model_name", "sgc", "--hidden_dim", "32",
    ])
    assert rc == 0
    assert "Best val:" in capsys.readouterr().out


def test_cli_spmd_synthetic(capsys):
    """The multi-chip subcommand end-to-end on the 8-device virtual mesh:
    cluster reorder -> tiled local engine -> halo exchange -> 2-D mesh."""
    rc = main([
        "spmd", "--synthetic", "--synthetic_nodes", "256",
        "--synthetic_classes", "4", "--synthetic_features", "16",
        "--num_shards", "4", "--data_parallel", "2",
        "--local_engine", "tiled", "--comm", "halo", "--reorder", "cluster",
        "--hidden_dim", "16", "--prop_steps", "2", "--steps", "8",
        "--lr", "0.05",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "spmd: mesh {'graph': 4, 'data': 2}" in out
    assert "engine tiled" in out and "comm halo" in out
    # round-5: the spmd surface reports the eval protocol, not just loss
    assert "best val" in out and "best test" in out


def test_cli_spmd_multi_run(capsys):
    rc = main([
        "spmd", "--synthetic", "--synthetic_nodes", "128",
        "--synthetic_classes", "3", "--synthetic_features", "8",
        "--num_shards", "2", "--local_engine", "hybrid",
        "--comm", "all_gather", "--reorder", "none",
        "--hidden_dim", "8", "--prop_steps", "1", "--steps", "5",
        "--num_runs", "2", "--lr", "0.05",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "±" in out and "over 2 runs" in out


def test_cli_spmd_rejects_zero_steps(capsys):
    rc = main([
        "spmd", "--synthetic", "--synthetic_nodes", "64",
        "--num_shards", "2", "--steps", "0",
    ])
    assert rc == 2
    assert "--steps must be >= 1" in capsys.readouterr().out


def test_cli_autotune(capsys):
    rc = main([
        "autotune", "--synthetic", "--synthetic_nodes", "400",
        "--synthetic_features", "32", "--features", "32", "--reps", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["best"] in payload["ms_per_hop"]


def test_cli_baseline_synthetic(capsys):
    rc = main([
        "baseline", "--synthetic", "--synthetic_nodes", "250",
        "--synthetic_features", "32", "--model_name", "gcn",
        "--hidden_dim", "16", "--num_epochs", "20", "--lr", "0.05",
        "--runs", "1",
    ])
    assert rc == 0
    assert "All runs:" in capsys.readouterr().out


def test_cli_train_checkpoint_then_predict(tmp_path, capsys):
    ckpt = tmp_path / "params.msgpack"
    rc = main([
        "train", "--synthetic", "--synthetic_nodes", "250",
        "--synthetic_features", "32", "--num_epochs", "20",
        "--model_name", "sgc", "--hidden_dim", "16", "--lr", "0.05",
        "--checkpoint_path", str(ckpt),
    ])
    assert rc == 0 and ckpt.exists()
    out_npy = tmp_path / "labels.npy"
    rc = main([
        "predict", "--synthetic", "--synthetic_nodes", "250",
        "--synthetic_features", "32", "--model_name", "sgc",
        "--hidden_dim", "16", "--checkpoint", str(ckpt),
        "--nodes", "0,1,2,3", "--out", str(out_npy),
    ])
    assert rc == 0
    import numpy as np

    assert np.load(out_npy).shape == (4,)
    assert "wrote 4 predictions" in capsys.readouterr().out


def test_cli_ooc(tmp_path, capsys):
    import numpy as np

    from ssrg_tpu.data.synthetic import sbm_graph

    g = sbm_graph(num_node=200, num_classes=3, num_features=16,
                  p_in=0.06, p_out=0.003, feature_signal=1.2, seed=5)
    pairs = np.unique(
        np.sort(np.stack([g.edge.row, g.edge.col], axis=1), axis=1), axis=0
    )
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    np.save(tmp_path / "edges.npy", pairs.T.astype(np.int64))
    np.save(tmp_path / "features.npy", g.x.astype(np.float32))
    np.save(tmp_path / "labels.npy", np.asarray(g.y, np.int64))
    rc = main([
        "ooc", "--edges", str(tmp_path / "edges.npy"),
        "--features", str(tmp_path / "features.npy"),
        "--labels", str(tmp_path / "labels.npy"),
        "--work_dir", str(tmp_path / "work"), "--num_shards", "2",
        "--model_name", "sgc", "--prop_steps", "2", "--hidden_dim", "16",
        "--num_epochs", "15", "--lr", "0.05", "--train_batch_size", "64",
    ])
    assert rc == 0
    assert "Best val:" in capsys.readouterr().out


def test_cli_bench_tiny(capsys):
    rc = main([
        "bench", "--nodes", "1500", "--degree", "6", "--features", "16",
        "--prop_steps", "2",
    ])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["metric"] == "khop_spmm_edges_per_s"
    assert payload["value"] > 0
    # dense engine resolved at this size: the gather-roofline fields must be
    # absent (ADVICE r3: the traffic model is wrong for non-gather engines)
    assert "hbm_frac" not in payload and "achieved_gbps" not in payload


def test_cli_train_flag_plumbing(monkeypatch):
    """Parser → TrainingConfig/ModelConfig plumbing (round-3 weak #6): a
    typo'd argparse dest would silently drop a flag; capture the configs the
    train command actually builds."""
    captured = {}

    import ssrg_tpu.train.node_classification as nc

    class FakeTask:
        def __init__(self, dataset, spec, model_cfg, train_cfg, verbose=False):
            captured["model_cfg"] = model_cfg
            captured["train_cfg"] = train_cfg
            self.best_val = self.best_test = 0.0

    monkeypatch.setattr(nc, "NodeClassification", FakeTask)
    rc = main([
        "train", "--synthetic", "--synthetic_nodes", "120",
        "--synthetic_features", "8", "--model_name", "gamlp",
        "--hidden_dim", "24", "--prop_steps", "4", "--num_layers", "3",
        "--spmm_engine", "reorder_tiled", "--spmm_bf16",
        "--cluster_merge_target", "1024",
        "--scan_epochs", "--num_epochs", "17", "--lr", "0.02",
        "--weight_decay", "3e-4", "--warmup_epochs", "5",
        "--normalize_times", "2", "--seed", "99",
        "--train_batch_size", "32", "--eval_batch_size", "64",
        "--cache_dir", "/tmp/nope",
    ])
    assert rc == 0
    t = captured["train_cfg"]
    assert (t.spmm_engine, t.spmm_bf16, t.scan_epochs) == (
        "reorder_tiled", True, True)
    assert t.cluster_merge_target == 1024
    assert (t.num_epochs, t.lr, t.weight_decay, t.warmup_epochs) == (
        17, 0.02, 3e-4, 5)
    assert (t.normalize_times, t.seed) == (2, 99)
    assert (t.train_batch_size, t.eval_batch_size) == (32, 64)
    assert t.cache_dir == "/tmp/nope"
    m = captured["model_cfg"]
    assert (m.model_name, m.hidden_dim, m.prop_steps, m.num_layers) == (
        "gamlp", 24, 4, 3)
