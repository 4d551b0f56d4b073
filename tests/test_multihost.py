"""Multi-host bootstrap (SURVEY.md §7 step 10): per-host shard loading into
the SPMD train step.

Two layers of evidence on the CPU harness:

1. single-process, 8 fake devices — the spool-fed context must produce the
   SAME losses as the in-memory ``build_spmd_context`` path;
2. an ACTUAL 2-process run — two subprocesses join one runtime via
   ``jax.distributed.initialize`` (localhost coordinator), each loads only
   its own spool shards, and both must compute identical finite losses.
"""

import os
import os.path as osp
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
import scipy.sparse as sp

from ssrg_tpu.data.streaming import stream_partition
from ssrg_tpu.data.synthetic import sbm_graph
from ssrg_tpu.ops.normalize import sym_norm

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


@pytest.fixture(scope="module")
def spooled(tmp_path_factory):
    root = tmp_path_factory.mktemp("mh")
    g = sbm_graph(num_node=240, num_classes=3, num_features=16,
                  p_in=0.05, p_out=0.005, feature_signal=1.0, seed=1)
    pairs = np.unique(
        np.sort(np.stack([g.edge.row, g.edge.col], axis=1), axis=1), axis=0
    )
    pairs = pairs[pairs[:, 0] != pairs[:, 1]]
    np.save(root / "edges.npy", pairs.T.astype(np.int64))
    np.save(root / "features.npy", g.x.astype(np.float32))
    np.save(root / "labels.npy", np.asarray(g.y, np.int64))
    meta = stream_partition(
        str(root / "edges.npy"), g.num_node, 4, str(root / "spool")
    )
    return str(root), meta, g, pairs


def _module(num_classes):
    from ssrg_tpu.models.heads import LogisticRegression
    from ssrg_tpu.models.zoo import PrecomputeModel
    from ssrg_tpu.ops.combine import make_message_op

    return PrecomputeModel(
        msg_op=make_message_op("mean"),
        head=LogisticRegression(output_dim=num_classes),
    )


@pytest.mark.parametrize("local_engine,comm", [
    ("coo", "all_gather"),
    ("hybrid", "all_gather"),
    ("hybrid", "halo"),
])
def test_spool_context_matches_inmemory(spooled, local_engine, comm):
    """Same losses from per-device spool loading and the in-memory path —
    for the oracle coo tier AND the round-5 fast tiers (hybrid local engine,
    halo-only exchange) that the spool path previously could not run
    (VERDICT r4 Missing #1)."""
    import jax

    from ssrg_tpu.parallel.dist_train import build_spmd_context, run_steps
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.multihost import build_spmd_context_from_spool

    root, meta, g, pairs = spooled
    mesh = make_mesh((4, 2), ("graph", "data"))
    module = _module(int(g.y.max()) + 1)
    train_idx = np.arange(0, g.num_node, 3)

    ctx_spool = build_spmd_context_from_spool(
        meta, osp.join(root, "features.npy"), g.y, train_idx, module, mesh,
        prop_steps=2, lr=0.05, data_axis="data", seed=0,
        local_engine=local_engine, comm=comm,
    )
    if comm == "halo":
        assert ctx_spool.adj.send_idx is not None
        assert ctx_spool.adj.halo_pad > 0
    adj = sp.csr_matrix(
        (np.ones(pairs.shape[0] * 2),
         (np.concatenate([pairs[:, 0], pairs[:, 1]]),
          np.concatenate([pairs[:, 1], pairs[:, 0]]))),
        shape=(g.num_node, g.num_node),
    )
    ctx_mem = build_spmd_context(
        sym_norm(adj, 0.5), g.x, g.y, train_idx, module, mesh,
        prop_steps=2, lr=0.05, data_axis="data", seed=0,
    )
    # identical params (same seed), identical normalized adjacency => the
    # loss trajectories must agree to f32 tolerance
    _, loss_spool = run_steps(ctx_spool, 3, seed=0)
    _, loss_mem = run_steps(ctx_mem, 3, seed=0)
    assert np.isfinite(loss_spool)
    np.testing.assert_allclose(loss_spool, loss_mem, rtol=2e-4, atol=2e-5)


def test_spool_context_epoch_scan_eval(spooled):
    """The spool-fed context carries the full round-5 eval protocol."""
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.dist_train import evaluate, run_epochs_scan
    from ssrg_tpu.parallel.multihost import build_spmd_context_from_spool

    import jax

    root, meta, g, _ = spooled
    mesh = make_mesh((4,), ("graph",), jax.devices()[:4])
    module = _module(int(g.y.max()) + 1)
    n = g.num_node
    ctx = build_spmd_context_from_spool(
        meta, osp.join(root, "features.npy"), g.y,
        np.arange(0, n, 3), module, mesh, prop_steps=2, lr=0.1, seed=0,
        local_engine="hybrid", comm="halo",
        val_idx=np.arange(1, n, 3), test_idx=np.arange(2, n, 3),
    )
    ctx, res = run_epochs_scan(ctx, 30, seed=0)
    assert np.isfinite(res.final_loss)
    assert res.best_val > 0.5  # separable SBM
    accs = evaluate(ctx)
    assert accs["test_acc"] > 0.5


def test_initialize_multihost_single_process_noop(monkeypatch):
    from ssrg_tpu.parallel import multihost

    monkeypatch.delenv("JAX_COORDINATOR_ADDRESS", raising=False)
    monkeypatch.delenv("JAX_NUM_PROCESSES", raising=False)
    assert multihost.initialize_multihost() is False


def test_shard_count_mismatch_raises(spooled):
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.multihost import shard_adjacency_from_spool

    root, meta, g, _ = spooled
    mesh = make_mesh((8,), ("graph",))
    with pytest.raises(ValueError, match="re-spool"):
        shard_adjacency_from_spool(meta, mesh)


_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    sys.path.insert(0, {repo!r})
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    from ssrg_tpu.parallel.multihost import (
        build_spmd_context_from_spool, global_mesh, initialize_multihost)
    from ssrg_tpu.parallel.dist_train import run_steps
    from ssrg_tpu.data.streaming import StreamingGraphMeta
    from ssrg_tpu.models.heads import LogisticRegression
    from ssrg_tpu.models.zoo import PrecomputeModel
    from ssrg_tpu.ops.combine import make_message_op

    pid = int(sys.argv[1])
    ok = initialize_multihost(
        coordinator_address="localhost:{port}", num_processes=2,
        process_id=pid)
    assert ok and jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4  # 2 hosts x 2 local fake devices

    meta = StreamingGraphMeta(**{meta!r})
    labels = np.load({labels!r})
    mesh = global_mesh((4,), ("graph",))
    module = PrecomputeModel(
        msg_op=make_message_op("mean"),
        head=LogisticRegression(output_dim=int(labels.max()) + 1))
    ctx = build_spmd_context_from_spool(
        meta, {features!r}, labels, np.arange(0, labels.shape[0], 3),
        module, mesh, prop_steps=2, lr=0.05, seed=0,
        local_engine="hybrid", comm="halo")
    assert ctx.adj.send_idx is not None  # the fast tier, not the coo oracle
    ctx, loss = run_steps(ctx, 2, seed=0)
    print(f"LOSS {{loss:.6f}}", flush=True)
""")


def test_two_process_cpu_run(spooled):
    """Two OS processes, one JAX runtime: the real multi-host code path
    (process_count()==2, cross-process collectives over the distributed
    service), minus only the DCN transport."""
    root, meta, g, _ = spooled
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    code = _WORKER.format(
        repo=REPO, port=port,
        meta=dict(num_nodes=meta.num_nodes, num_edges=meta.num_edges,
                  block=meta.block, num_shards=meta.num_shards,
                  spool_dir=meta.spool_dir),
        labels=osp.join(root, "labels.npy"),
        features=osp.join(root, "features.npy"),
    )
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                         text=True, env=env)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            assert p.returncode == 0, f"worker failed:\n{err[-2000:]}"
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSS")][-1]
        losses.append(float(line.split()[1]))
    assert np.isfinite(losses[0])
    assert losses[0] == pytest.approx(losses[1], abs=1e-6)


def test_fast_layout_recomputed_for_old_spools(spooled, tmp_path):
    """Pre-round-5 spools (no fast_meta.json / halo_<d>.npy) must still feed
    the fast path: the loaders recompute the side files on demand."""
    import shutil

    from ssrg_tpu.data.streaming import (
        StreamingGraphMeta, load_spool_fast_meta, load_spool_halo_cols,
    )

    root, meta, g, _ = spooled
    old_dir = tmp_path / "old_spool"
    shutil.copytree(meta.spool_dir, old_dir)
    for p in old_dir.glob("fast_meta.json"):
        p.unlink()
    for p in old_dir.glob("halo_*.npy"):
        p.unlink()
    old_meta = StreamingGraphMeta(
        meta.num_nodes, meta.num_edges, meta.block, meta.num_shards,
        str(old_dir),
    )
    fast = load_spool_fast_meta(old_meta)
    assert fast["width"] >= 8 and len(fast["tail_sizes"]) == meta.num_shards
    halos = load_spool_halo_cols(old_meta)
    ref = load_spool_halo_cols(meta)
    for a, b in zip(halos, ref):
        np.testing.assert_array_equal(a, b)
