#!/usr/bin/env python
"""One-process combination of the round-3 TPU experiments (the relay charges
~250-400 s of claim stall per PROCESS, so experiments batch into one):

  A. blockcoo bucket-geometry sweep on the scattered rest (ask 2)
  B. banded Pallas kernel variants: bf16 window, row_block 512 (ask 8)

    python benchmarks/combined_round3_bench.py
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "benchmarks")


def emit(**kv):
    print(json.dumps(kv), flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    from tiled_cluster_pipeline_bench import shuffled_community_graph

    from ssrg_tpu.ops.autotune import _many_hops
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation
    from ssrg_tpu.ops.sparse import build_blockcoo, build_tiled

    N, F = 1_048_576, 100
    iters, k = 5, 3
    total = iters * k

    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (N, F), jnp.float32)
    )()

    def measure(name, eng, edge_count):
        _ = np.asarray(_many_hops(eng, x, total))
        t0 = time.perf_counter()
        _ = np.asarray(_many_hops(eng, x, total))
        dt = time.perf_counter() - t0
        emit(phase="measure", engine=name,
             ms_per_hop=round(dt / total * 1e3, 2),
             edges_per_s=round(edge_count * total / dt, 1))
        return dt / total

    # ---- A: blockcoo geometry sweep on the real scattered rest ----------
    adj_n = sym_norm(shuffled_community_graph(N), 0.5)
    perm = cluster_permutation(adj_n)
    adj_p, _, _, _ = apply_permutation(adj_n, perm)
    import scipy.sparse as sp

    tiled = build_tiled(adj_p, dtype=jnp.bfloat16, device_scatter=True,
                        mem_budget_bytes=8 << 30, rest_engine="hybrid")
    hyb = tiled.rest
    ell, tail = hyb.ell, hyb.tail
    rows_of = np.repeat(np.arange(ell.cols.shape[0]), ell.width)
    ecols = np.asarray(ell.cols).reshape(-1)
    evals = np.asarray(ell.vals).reshape(-1)
    keep = evals != 0
    tr = np.concatenate([rows_of[keep], np.asarray(tail.row)])
    tc = np.concatenate([ecols[keep], np.asarray(tail.col)])
    tv = np.concatenate([evals[keep], np.asarray(tail.val)])
    keep2 = tv != 0
    rest_sp = sp.coo_matrix((tv[keep2], (tr[keep2], tc[keep2])),
                            shape=(N, N)).tocsr()
    emit(phase="setup", nnz=int(adj_n.nnz), rest_nnz=int(rest_sp.nnz),
         tiled_fraction=round(tiled.tiled_fraction, 4))
    del tiled
    measure("rest:hybrid", hyb, rest_sp.nnz)
    del hyb
    best = (None, 1e9)
    for rb, cb in ((1 << 18, 1 << 18), (1 << 19, 1 << 19),
                   (1 << 19, 1 << 18), (1 << 18, 1 << 19)):
        eng = build_blockcoo(rest_sp, row_bucket=rb, col_bucket=cb)
        t = measure(f"rest:blockcoo_{rb>>10}k_{cb>>10}k", eng, rest_sp.nnz)
        if t < best[1]:
            best = ((rb, cb), t)
        del eng
    emit(metric="blockcoo_best", buckets=list(best[0]),
         ms_per_hop=round(best[1] * 1e3, 2), rest_nnz=int(rest_sp.nnz))
    del rest_sp, adj_n, adj_p

    # ---- B: banded Pallas kernel variants (on-device synth storage) -----
    from banded_kernel_bench import F_DIM, NNZ_MODEL, ROW_BLOCK, WINDOW, synth_banded

    from ssrg_tpu.ops.pallas_banded import PallasBandedAdj
    from ssrg_tpu.ops.sparse import BandedAdj

    xb = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(1), (661 * ROW_BLOCK, F_DIM), jnp.float32)
    )()

    def measure_b(name, eng):
        _ = np.asarray(_many_hops(eng, xb, total))
        t0 = time.perf_counter()
        _ = np.asarray(_many_hops(eng, xb, total))
        dt = time.perf_counter() - t0
        emit(phase="banded", engine=name,
             ms_per_hop=round(dt / total * 1e3, 2),
             edges_per_s=round(NNZ_MODEL * total / dt, 1))

    for eng_name in ("pallas_bf16", "pallas_bf16w", "pallas_bf16w_rb512",
                     "pallas_bf16_rb512", "xla_bf16"):
        parts = eng_name.split("_")
        kind, dt_name = parts[0], parts[1].rstrip("w")
        win_bf16 = parts[1].endswith("w")
        rb = 512 if "rb512" in parts else ROW_BLOCK
        window = WINDOW + (rb - ROW_BLOCK)
        nb = 661 * ROW_BLOCK // rb
        blocks, los, n = synth_banded(nb, dt_name, row_block=rb,
                                      window=window)
        if kind == "xla":
            eng = BandedAdj(blocks, los, n, n, rb)
        else:
            eng = PallasBandedAdj(blocks, los, n, n, rb, interpret=False,
                                  window_bf16=win_bf16)
        measure_b(eng_name, eng)
        del eng, blocks
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
