#!/usr/bin/env python
"""Products-scale TiledAdj vs HybridAdj measurement (VERDICT r1 item 2).

The large-table gather slowdown (docs/PERFORMANCE.md "Scale dependence"):
at N=2.45M the hybrid gather engine drops to ~63 M edges/s because random
row access into a ~1 GB feature table loses DRAM page locality. TiledAdj is
the locality remedy — on a clustered (community/RCM-reordered) graph most
edges fall into dense [256 x 512] tiles that run as MXU matmuls against
contiguous windows of X, plus a scattered-remainder hybrid tail.

Measurement protocol notes:

- Arrays are GENERATED ON DEVICE with the exact shapes ``build_tiled`` /
  ``build_hybrid`` would produce for the modeled graph. SpMM timing is
  value-independent (no data-dependent control flow), and shipping the
  2.5 GiB bf16 tile array through the ~3-4 MB/s relay would take ~12
  minutes for no measurement benefit. Shapes, not values, determine cost.
- Modeled graph: ogbn-products scale, N=2,449,408 (9568 row blocks x 256),
  F=100, mean degree ~26 — communities of 512 nodes aligned to column
  segments (the post-RCM/cluster-reorder layout build_tiled targets),
  80% intra-community edges (tiled), 20% scattered (hybrid rest, ELL w=8).
- Same one-scan/fetch-a-slice timing as ssrg_tpu/bench.py (relay-safe).

Run on the chip: ``python benchmarks/tiled_products_bench.py``
(add ``--engines hybrid`` etc. to run a subset; one TPU process at a time).
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

N_BLOCKS = 9568
ROW_BLOCK = 256
TILE_COLS = 512
F_DIM = 100
INTRA_DEG = 21          # intra-community edges per row (tiled part)
INTER_DEG = 5           # scattered edges per row (hybrid rest)
HYBRID_WIDTH = 40       # ELL width the hybrid builder picks at products scale
REST_WIDTH = 8


def _many_hops_fn():
    import jax

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops(a, h0, hops):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        return out[0, :2] + out[-1, :2]

    return many_hops


def synth_x(n: int, f: int):
    import jax
    import jax.numpy as jnp

    return jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (n, f), jnp.float32)
    )()


def synth_rest_hybrid(n: int, width: int):
    """On-device ELL(+minimal tail) with HybridAdj's exact shapes."""
    import jax
    import jax.numpy as jnp

    from ssrg_tpu.ops.sparse import COOAdj, ELLAdj, HybridAdj

    n_pad = -(-n // ROW_BLOCK) * ROW_BLOCK

    @jax.jit
    def gen():
        k = jax.random.PRNGKey(1)
        cols = jax.random.randint(k, (n_pad, width), 0, n, jnp.int32)
        vals = jax.random.normal(k, (n_pad, width), jnp.float32)
        return cols, vals

    cols, vals = gen()
    chunk = 1 << 17
    zero = jax.jit(lambda: (jnp.zeros(chunk, jnp.int32),
                            jnp.zeros(chunk, jnp.float32)))()
    tail = COOAdj(zero[0], zero[0], zero[1], n, n, chunk)
    return HybridAdj(ELLAdj(cols, vals, n, n, ROW_BLOCK), tail)


def synth_tiled(n: int, dtype_name: str):
    """On-device TiledAdj shaped as build_tiled would pack the modeled
    community graph: T=1 dense tile per row block, window = the 512-wide
    community segment two consecutive row blocks share."""
    import jax
    import jax.numpy as jnp

    from ssrg_tpu.ops.sparse import TiledAdj

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    nb = N_BLOCKS

    @jax.jit
    def gen_tiles():
        return jax.random.normal(
            jax.random.PRNGKey(2), (nb, ROW_BLOCK, TILE_COLS), jnp.float32
        ).astype(dtype)

    tiles = gen_tiles()  # flat-pair layout: one tile per row block (T=1)
    starts = np.minimum(
        (np.arange(nb) // 2) * TILE_COLS, n - TILE_COLS
    ).astype(np.int32)
    block_of = np.arange(nb, dtype=np.int32)
    rest = synth_rest_hybrid(n, REST_WIDTH)
    return TiledAdj(tiles, jnp.asarray(starts), jnp.asarray(block_of),
                    rest, n, n)


def measure(name: str, adj_dev, x, nnz_model: int, prop_steps=3, iters=10):
    many_hops = _many_hops_fn()
    total = iters * prop_steps
    t0 = time.perf_counter()
    _ = np.asarray(many_hops(adj_dev, x, total))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(many_hops(adj_dev, x, total))
    dt = time.perf_counter() - t0
    rate = total * nnz_model / dt
    print(json.dumps({
        "bench": "tiled_products", "engine": name,
        "edges_per_s": round(rate, 1), "nnz_model": nnz_model,
        "num_nodes": N_BLOCKS * ROW_BLOCK, "num_features": F_DIM,
        "ms_per_hop": round(dt / total * 1e3, 2),
        "compile_s": round(t_compile, 1),
    }), flush=True)
    return rate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", nargs="+",
                    default=["tiled_bf16", "tiled_f32", "hybrid"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--blocks", type=int, default=None,
                    help="override N_BLOCKS (CPU smoke tests)")
    args = ap.parse_args()

    import jax

    global N_BLOCKS
    if args.blocks:
        N_BLOCKS = args.blocks
    print(f"device: {jax.devices()[0].platform}", flush=True)
    n = N_BLOCKS * ROW_BLOCK
    nnz = n * (INTRA_DEG + INTER_DEG)
    x = synth_x(n, F_DIM)

    for eng in args.engines:
        if eng == "hybrid":
            adj = synth_rest_hybrid(n, HYBRID_WIDTH)
        elif eng.startswith("tiled"):
            adj = synth_tiled(n, "bf16" if eng.endswith("bf16") else "f32")
        else:
            raise SystemExit(f"unknown engine {eng}")
        measure(eng, adj, x, nnz, iters=args.iters)
        del adj


if __name__ == "__main__":
    main()
