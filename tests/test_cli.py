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


def test_cli_autotune(capsys):
    rc = main([
        "autotune", "--synthetic", "--synthetic_nodes", "400",
        "--synthetic_features", "32", "--features", "32", "--reps", "2",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    payload = json.loads(out.strip().splitlines()[-1])
    assert payload["best"] in payload["ms_per_hop"]
