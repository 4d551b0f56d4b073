#!/usr/bin/env python
"""Root-cause probe for the round-5 f32-slab composite pathology
(docs/PERFORMANCE.md): the one-hot rest measures ~60 M edges/s standalone
(f32) but ~15 M inside the tiled composite, while the bf16-slab composite
is fine. Four measurements on the SAME 1M cluster-reordered graph isolate
the failing combination:

  A. rest standalone, Pallas, f32 slab     (expected fine)
  B. composite, Pallas rest, f32 slab      (the pathology)
  C. composite, XLA pair-scan rest, f32    (kernel vs scheduling split)
  D. composite, Pallas rest, bf16 slab     (the known-good config)

    python benchmarks/onehot_composite_probe.py
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    from ssrg_tpu.bench import make_community_graph
    from ssrg_tpu.ops.normalize import sym_norm
    from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation
    from ssrg_tpu.ops.sparse import build_tiled

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    n = 1_048_576
    adj = sym_norm(make_community_graph(n), 0.5)
    perm = cluster_permutation(adj)
    adj_p, _, _, _ = apply_permutation(adj, perm)
    nnz = int(adj.nnz)
    tiled = build_tiled(adj_p, dtype=jnp.bfloat16, device_scatter=True,
                        mem_budget_bytes=8 << 30, rest_engine="onehot")
    rest = tiled.rest
    rest_nnz = int(round(nnz * (1 - tiled.tiled_fraction)))
    emit(phase="setup", nnz=nnz, rest_nnz=rest_nnz,
         tiled_fraction=round(tiled.tiled_fraction, 4),
         rest_chunks=rest.num_chunks)

    x = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, 100),
                                  jnp.float32)
    )()
    hops = 9

    @partial(jax.jit, static_argnames=("k",))
    def many(a, h0, k):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=k)
        return out[0, :2] + out[-1, :2]

    def measure(name, eng, edges):
        try:
            _ = np.asarray(many(eng, x, hops))
            t0 = time.perf_counter()
            _ = np.asarray(many(eng, x, hops))
            dt = time.perf_counter() - t0
            emit(phase="measure", engine=name,
                 ms_per_hop=round(dt / hops * 1e3, 2),
                 edges_per_s=round(edges * hops / dt, 1))
        except Exception as exc:  # noqa: BLE001
            emit(phase="error", engine=name,
                 error=f"{type(exc).__name__}: {exc}"[:300])

    rest.default_executor = "pallas"
    rest.gather_bf16 = False
    measure("A_rest_standalone_pallas_f32", rest, rest_nnz)
    measure("B_composite_pallas_f32", tiled, nnz)
    rest.default_executor = "xla"
    measure("C_composite_xla_f32", tiled, nnz)
    rest.default_executor = "pallas"
    rest.gather_bf16 = True
    measure("D_composite_pallas_bf16", tiled, nnz)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
