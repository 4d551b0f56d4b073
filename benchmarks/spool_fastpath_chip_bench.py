#!/usr/bin/env python
"""Spool fast path on REAL hardware (round-5): the v5p/papers100M recipe —
`stream_partition` → `build_spmd_context_from_spool(local_engine="hybrid")`
→ hop precompute + epoch-scan eval — executed end-to-end on the chip at
reduced scale (1-shard mesh on the single available device; the multi-shard
behavior of the same entry points is covered by the 2-process CPU-mesh
tests in tests/test_multihost.py).

    python benchmarks/spool_fastpath_chip_bench.py [--nodes N]
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import time

import numpy as np

DATA_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    ".spool_fastpath")


def emit(**kv):
    print(json.dumps(kv), flush=True)


def stage(n: int, deg: int, f: int, classes: int, seed: int = 0) -> str:
    root = osp.join(DATA_DIR, f"n{n}_d{deg}_f{f}")
    os.makedirs(root, exist_ok=True)
    if osp.exists(osp.join(root, "staged")):
        return root
    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    comm = 1024
    e = n * deg
    r = rng.integers(0, n, e, dtype=np.int64)
    intra = rng.random(e) < 0.75
    c = np.where(
        intra,
        ((r // comm) * comm + rng.integers(0, comm, e, dtype=np.int64)) % n,
        rng.integers(0, n, e, dtype=np.int64),
    )
    keep = r != c
    key = np.unique(np.minimum(r, c)[keep] * n + np.maximum(r, c)[keep])
    np.save(osp.join(root, "edges.npy"),
            np.stack([key // n, key % n]).astype(np.int64))
    y = ((np.arange(n) // comm) % classes).astype(np.int64)
    np.save(osp.join(root, "labels.npy"), y)
    means = rng.normal(size=(classes, f)).astype(np.float32)
    x = np.lib.format.open_memmap(
        osp.join(root, "features.npy"), mode="w+", dtype=np.float32,
        shape=(n, f),
    )
    blk = 1_000_000
    for lo in range(0, n, blk):
        hi = min(lo + blk, n)
        x[lo:hi] = means[y[lo:hi]] + rng.normal(size=(hi - lo, f)).astype(
            np.float32
        )
    x.flush()
    del x
    open(osp.join(root, "staged"), "w").close()
    emit(phase="stage", nodes=n, edges=int(key.size),
         seconds=round(time.perf_counter() - t0, 1))
    return root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=2_500_000)
    ap.add_argument("--deg", type=int, default=12)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--classes", type=int, default=32)
    ap.add_argument("--prop_steps", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssrg_tpu.data.streaming import stream_partition, StreamingGraphMeta
    from ssrg_tpu.models.heads import MultiLayerPerceptron
    from ssrg_tpu.models.zoo import PrecomputeModel
    from ssrg_tpu.ops.combine import make_message_op
    from ssrg_tpu.parallel.dist_train import ensure_hops, run_epochs_scan
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.multihost import build_spmd_context_from_spool

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    root = stage(args.nodes, args.deg, args.features, args.classes)
    spool_dir = osp.join(root, "spool1")
    t0 = time.perf_counter()
    if osp.exists(osp.join(spool_dir, "fast_meta.json")):
        import json as _json

        sizes = sum(
            osp.getsize(osp.join(spool_dir, f"shard_{d}.bin")) // 12
            for d in range(1)
        )
        meta = StreamingGraphMeta(args.nodes, sizes,
                                  -(-args.nodes // 1 // 8) * 8, 1, spool_dir)
    else:
        meta = stream_partition(
            osp.join(root, "edges.npy"), args.nodes, 1, spool_dir
        )
    emit(phase="spool", seconds=round(time.perf_counter() - t0, 1),
         sym_edges=int(meta.num_edges), block=meta.block)

    labels = np.load(osp.join(root, "labels.npy"))
    rng = np.random.default_rng(0)
    idx = rng.permutation(args.nodes)
    tr, va, te = idx[:200_000], idx[200_000:300_000], idx[300_000:500_000]
    module = PrecomputeModel(
        msg_op=make_message_op("mean"),
        head=MultiLayerPerceptron(hidden_dim=128, output_dim=args.classes,
                                  num_layers=2),
    )
    mesh = make_mesh((1,), ("graph",), jax.devices()[:1])

    t0 = time.perf_counter()
    ctx = build_spmd_context_from_spool(
        meta, osp.join(root, "features.npy"), labels, tr, module, mesh,
        prop_steps=args.prop_steps, lr=0.01, seed=0,
        local_engine="hybrid", val_idx=va, test_idx=te,
    )
    emit(phase="build_context", seconds=round(time.perf_counter() - t0, 1),
         ell_width=int(ctx.adj.width), note="includes relay transfers")

    t0 = time.perf_counter()
    ensure_hops(ctx)
    _ = np.asarray(ctx.hops[0, :1, :1])  # force through the relay
    t_prop = time.perf_counter() - t0
    emit(phase="precompute", seconds=round(t_prop, 1),
         edges_per_s=round(meta.num_edges * args.prop_steps / t_prop, 1),
         note="one dispatch incl. compile")

    t0 = time.perf_counter()
    ctx, res = run_epochs_scan(ctx, args.epochs, seed=0)
    t_train = time.perf_counter() - t0
    emit(phase="train", seconds=round(t_train, 1), epochs=args.epochs,
         best_val=round(res.best_val, 4), best_test=round(res.best_test, 4))
    emit(metric="spool_fastpath_chip", nodes=args.nodes,
         sym_edges=int(meta.num_edges), device=jax.default_backend(),
         best_test=round(res.best_test, 4),
         train_s_per_epoch=round(t_train / args.epochs, 2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
