#!/usr/bin/env python
"""Round-2 sweep of the scatter-free rest kernel: larger row blocks + bf16
gather (follow-up to rest_scatterfree_bench.py's 55.0 M edges/s winner).

Run on the chip: python benchmarks/rest_scatterfree_sweep2.py
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

from rest_scatterfree_bench import random_rest_matrix  # noqa: E402


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
    from ssrg_tpu.ops.sparse import build_coo

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    adj = random_rest_matrix(args.nodes, args.degree)
    nnz = int(adj.nnz)
    emit(phase="setup", nodes=args.nodes, nnz=nnz)
    x = jax.jit(
        lambda: jax.random.normal(
            jax.random.PRNGKey(0), (args.nodes, args.features), jnp.float32
        )
    )()
    hops = args.hops

    @partial(jax.jit, static_argnames=("k", "method"))
    def many(a, h0, k, method="spmm"):
        def hop(h, _):
            return getattr(a, method)(h).astype(jnp.float32), None

        out, _ = jax.lax.scan(hop, h0, None, length=k)
        return out[0, :2] + out[-1, :2]

    ref = np.asarray(build_coo(adj).spmm(x)[:4, :4])

    def measure(name, eng, method="spmm"):
        try:
            out1 = np.asarray(getattr(eng, method)(x)[:4, :4])
            err = float(np.max(np.abs(out1 - ref)))
            if err > (2e-2 if eng.gather_bf16 else 1e-3):
                emit(phase="MISMATCH", engine=name, max_err=err)
            _ = np.asarray(many(eng, x, hops, method))
            t0 = time.perf_counter()
            _ = np.asarray(many(eng, x, hops, method))
            dt = time.perf_counter() - t0
            emit(phase="measure", engine=name,
                 ms_per_hop=round(dt / hops * 1e3, 2),
                 edges_per_s=round(nnz * hops / dt, 1))
        except Exception as exc:  # noqa: BLE001
            emit(phase="error", engine=name,
                 error=f"{type(exc).__name__}: {exc}"[:300])

    for chunk, rb in ((1024, 512), (1024, 1024), (2048, 1024), (2048, 2048)):
        for bf16 in (False, True):
            eng = build_rest_segmented(
                adj, row_block=rb, chunk=chunk, gather_bf16=bf16,
            )
            tag = f"c{chunk}_rb{rb}" + ("_bf16" if bf16 else "")
            emit(phase="layout", tag=tag, num_chunks=eng.num_chunks,
                 pad_frac=round(eng.num_chunks * chunk / nnz - 1.0, 3))
            measure(f"pallas_{tag}", eng, "spmm_pallas")
            del eng
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
