#!/usr/bin/env python
"""Out-of-core ladder dress rehearsal (round-2 verdict ask 5).

Stages the largest on-disk graph the environment affords and runs the FULL
``ssrg-tpu ooc`` ladder end-to-end — spool (two streaming passes) →
block-at-a-time propagation → minibatch training over hop directories —
timing every phase and printing one JSON line per phase.

Scale notes for this container: host RAM (125 GB) and disk (120 GB free)
afford N=10-20M / E=200-400M easily; the binding constraint for the CHIP
run is the tunneled host↔device relay (~3-4 MB/s measured for bulk
transfers), which prices every streamed feature block. The source-outer
schedule (one pass of X up + hops down per hop) and bfloat16 transfer are
exactly the knobs this rehearsal exercises. ``--cpu`` runs the same ladder
on the XLA CPU backend (no relay) for the full-scale measurement.

    python benchmarks/ooc_rehearsal.py --nodes 10000000 --cpu
    python benchmarks/ooc_rehearsal.py --nodes 2000000        # on the chip
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import time

import numpy as np

DATA_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                    ".ooc_rehearsal")


def emit(**kv):
    print(json.dumps(kv), flush=True)


def stage(n: int, deg: int, f: int, classes: int, seed: int = 0) -> str:
    """Stage edges/features/labels .npy files (idempotent per size)."""
    root = osp.join(DATA_DIR, f"n{n}_d{deg}_f{f}")
    os.makedirs(root, exist_ok=True)
    marker = osp.join(root, "staged.json")
    if osp.exists(marker):
        return root
    t0 = time.perf_counter()
    rng = np.random.default_rng(seed)
    comm = 1024
    # community graph in directed-unique-pair form (the streaming loader's
    # input contract), generated in chunks to bound peak memory
    base = None
    rs, cs = [], []
    chunk = 20_000_000
    total = n * deg
    for lo in range(0, total, chunk):
        m = min(chunk, total - lo)
        r = rng.integers(0, n, m, dtype=np.int64)
        intra = rng.random(m) < 0.75
        c = np.where(
            intra,
            ((r // comm) * comm
             + rng.integers(0, comm, m, dtype=np.int64)) % n,
            rng.integers(0, n, m, dtype=np.int64),
        )
        keep = r != c
        r, c = r[keep], c[keep]
        key = np.minimum(r, c) * n + np.maximum(r, c)
        rs.append(key)
    key = np.unique(np.concatenate(rs))
    del rs, cs
    edges = np.stack([key // n, key % n]).astype(np.int64)
    del key
    np.save(osp.join(root, "edges.npy"), edges)
    e_count = edges.shape[1]
    del edges

    y = ((np.arange(n, dtype=np.int64) // comm) % classes).astype(np.int64)
    np.save(osp.join(root, "labels.npy"), y)
    means = rng.normal(scale=1.0, size=(classes, f)).astype(np.float32)
    x = np.memmap(osp.join(root, "features_raw.bin"), np.float32, "w+",
                  shape=(n, f))
    blk = 1_000_000
    for lo in range(0, n, blk):
        hi = min(lo + blk, n)
        x[lo:hi] = means[y[lo:hi]] + rng.normal(
            size=(hi - lo, f)
        ).astype(np.float32)
    x.flush()
    # .npy header wrapper around the raw memmap
    feat = np.lib.format.open_memmap(
        osp.join(root, "features.npy"), mode="w+", dtype=np.float32,
        shape=(n, f),
    )
    for lo in range(0, n, blk):
        hi = min(lo + blk, n)
        feat[lo:hi] = x[lo:hi]
    feat.flush()
    del x, feat
    os.remove(osp.join(root, "features_raw.bin"))
    with open(marker, "w") as fh:
        json.dump({"edges": int(e_count), "seconds":
                   round(time.perf_counter() - t0, 1)}, fh)
    emit(phase="stage", nodes=n, directed_edges=int(e_count),
         seconds=round(time.perf_counter() - t0, 1))
    return root


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--deg", type=int, default=16)
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--classes", type=int, default=40)
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--prop_steps", type=int, default=3)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=4096)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--transfer_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--local_engine", default="hybrid",
                    choices=["hybrid", "coo"],
                    help="per-bucket SpMM: ELL+COO hybrid (round-5 "
                         "default) or the segment-sum coo oracle")
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing spool/hop artifacts")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    root = stage(args.nodes, args.deg, args.features, args.classes)

    from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
    from ssrg_tpu.parallel.outofcore import outofcore_propagate
    from ssrg_tpu.train.common import split_labels
    from ssrg_tpu.train.outofcore_task import (
        OutOfCoreNodeClassification, ensure_spooled,
    )

    backend = jax.default_backend()
    tag = "cpu" if args.cpu else backend
    work = osp.join(root, f"work_{tag}_s{args.shards}")
    if args.fresh and osp.exists(work):
        import shutil
        shutil.rmtree(work)
    labels = np.load(osp.join(root, "labels.npy"))

    t0 = time.perf_counter()
    meta = ensure_spooled(osp.join(root, "edges.npy"), args.nodes,
                          args.shards, work)
    t_spool = time.perf_counter() - t0
    emit(phase="spool", seconds=round(t_spool, 1),
         sym_edges=int(meta.num_edges), shards=meta.num_shards,
         device=backend)

    t0 = time.perf_counter()
    hop_dirs = outofcore_propagate(
        meta, osp.join(root, "features.npy"), args.prop_steps, work,
        verbose=True, transfer_dtype=args.transfer_dtype,
        local_engine=args.local_engine,
    )
    t_prop = time.perf_counter() - t0
    eps = meta.num_edges * args.prop_steps / max(t_prop, 1e-9)
    emit(phase="propagate", seconds=round(t_prop, 1),
         edges_per_s=round(eps, 1), prop_steps=args.prop_steps,
         transfer_dtype=args.transfer_dtype, local_engine=args.local_engine)

    rng = np.random.default_rng(0)
    tr = rng.choice(args.nodes, 100_000, replace=False)
    rest = np.setdiff1d(np.arange(args.nodes, dtype=np.int64), tr)
    va, te = rest[:50_000], rest[50_000:150_000]
    task = OutOfCoreNodeClassification(
        meta, hop_dirs, labels, tr, va, te,
        ModelConfig(model_name="sgc", prop_steps=args.prop_steps),
        TrainingConfig(num_epochs=args.epochs, lr=0.05,
                       train_batch_size=args.batch, seed=7),
    )
    t0 = time.perf_counter()
    best_val, best_test = task.execute()
    t_train = time.perf_counter() - t0
    emit(phase="train", seconds=round(t_train, 1), epochs=args.epochs,
         best_val=round(best_val, 4), best_test=round(best_test, 4))
    emit(metric="ooc_rehearsal", nodes=args.nodes,
         sym_edges=int(meta.num_edges), device=backend,
         spool_s=round(t_spool, 1), propagate_s=round(t_prop, 1),
         propagate_edges_per_s=round(eps, 1),
         train_s_per_epoch=round(t_train / max(args.epochs, 1), 1),
         best_test=round(best_test, 4))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
