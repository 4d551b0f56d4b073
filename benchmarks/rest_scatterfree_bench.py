#!/usr/bin/env python
"""Scatter-free rest engines vs the segment_sum bound (VERDICT r4 ask 3).

docs/PERFORMANCE.md established ~40-44 M edges/s for the scattered rest —
measured exclusively through `jax.ops.segment_sum` (the XLA scatter op).
This measures, on the same class of matrix (uniformly scattered edges at
products-scale sparsity — the regime the bound was established in):

  1. chunked segment_sum COO        (the measured bound)
  2. hybrid ELL+COO rest            (round-3 configuration)
  3. RestSegmentedAdj.spmm          (XLA one-hot matmul pair-scan, no scatter)
  4. RestSegmentedAdj.spmm_pallas   (Pallas revisited-output kernel)
  (3/4 swept over chunk x row_block)

Run on the chip: python benchmarks/rest_scatterfree_bench.py [--nodes N]
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np
import scipy.sparse as sp


def random_rest_matrix(n: int, avg_degree: float, seed: int = 0):
    """Uniformly scattered edges — the untileable inter-community rest."""
    rng = np.random.default_rng(seed)
    e = int(n * avg_degree)
    r = rng.integers(0, n, size=e)
    c = rng.integers(0, n, size=e)
    v = rng.uniform(0.1, 1.0, size=e).astype(np.float32)
    m = sp.csr_matrix((v, (r, c)), shape=(n, n))
    m.sum_duplicates()
    return m


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=1_048_576)
    ap.add_argument("--degree", type=float, default=4.0)
    ap.add_argument("--features", type=int, default=128)
    ap.add_argument("--hops", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssrg_tpu.ops.pallas_rest import build_rest_segmented
    from ssrg_tpu.ops.sparse import build_coo, build_hybrid

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    adj = random_rest_matrix(args.nodes, args.degree)
    nnz = int(adj.nnz)
    emit(phase="setup", nodes=args.nodes, nnz=nnz, features=args.features)

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.nodes, args.features), jnp.float32
        )
    )()
    hops = args.hops

    @partial(jax.jit, static_argnames=("k", "method"))
    def many(a, h0, k, method="spmm"):
        def hop(h, _):
            out = getattr(a, method)(h)
            # rest matrices are rectangular-safe here (square), chain output
            return out, None

        out, _ = jax.lax.scan(hop, h0, None, length=k)
        return out[0, :2] + out[-1, :2]

    ref = None

    def measure(name, eng, method="spmm"):
        nonlocal ref
        try:
            out1 = np.asarray(getattr(eng, method)(x)[:4, :4])  # probe
            if ref is None:
                ref = out1
            else:
                err = float(np.max(np.abs(out1 - ref)))
                if err > 1e-2:
                    emit(phase="MISMATCH", engine=name, max_err=err)
            _ = np.asarray(many(eng, x, hops, method))
            t0 = time.perf_counter()
            _ = np.asarray(many(eng, x, hops, method))
            dt = time.perf_counter() - t0
            emit(phase="measure", engine=name,
                 ms_per_hop=round(dt / hops * 1e3, 2),
                 edges_per_s=round(nnz * hops / dt, 1))
        except Exception as exc:  # noqa: BLE001 — one engine must not kill
            emit(phase="error", engine=name,
                 error=f"{type(exc).__name__}: {exc}"[:400])

    measure("segment_sum_coo", build_coo(adj))
    measure("hybrid_rest", build_hybrid(adj))
    for chunk in (512, 1024):
        for rb in (256, 512):
            eng = build_rest_segmented(adj, row_block=rb, chunk=chunk)
            emit(phase="layout", chunk=chunk, row_block=rb,
                 num_chunks=eng.num_chunks,
                 pad_frac=round(eng.num_chunks * chunk / nnz - 1.0, 3))
            measure(f"onehot_xla_c{chunk}_rb{rb}", eng)
            measure(f"onehot_pallas_c{chunk}_rb{rb}", eng, "spmm_pallas")
            del eng
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
