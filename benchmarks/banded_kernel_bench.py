#!/usr/bin/env python
"""Pallas window-DMA banded kernel vs the XLA banded engine (VERDICT r1
item 9): does manual double-buffering of the [W, F] window beat XLA's
``lax.scan`` + ``dynamic_slice`` schedule?

Both engines share IDENTICAL storage (dense [nb, 256, W] blocks + window
starts), generated ON DEVICE (shipping ~1.5 GiB of blocks through the
~3-4 MB/s relay teaches nothing about kernel speed). Setup mirrors the
banded row of docs/PERFORMANCE.md: arxiv-scale, bandwidth-1000 reordered
graph -> window 2176, F=128, nnz accounted at the arxiv edge count.

Run on the chip: python benchmarks/banded_kernel_bench.py
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np

ROW_BLOCK = 256
WINDOW = 2176           # bandwidth-1000 band, sublane-aligned + lane-padded
F_DIM = 128
NNZ_MODEL = 2_489_237   # arxiv-scale symmetric+loops edge count


def synth_banded(n_blocks: int, dtype_name: str, row_block: int = ROW_BLOCK,
                 window: int = WINDOW):
    import jax
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32

    @jax.jit
    def gen():
        return jax.random.normal(
            jax.random.PRNGKey(0), (n_blocks, row_block, window), jnp.float32
        ).astype(dtype)

    blocks = gen()
    n = n_blocks * row_block
    los = np.minimum(
        np.maximum(np.arange(n_blocks) * row_block - window // 2, 0),
        n - window,
    )
    los = ((los // 16) * 16).astype(np.int32)
    return blocks, jnp.asarray(los), n


def measure(name, adj_dev, x, prop_steps=3, iters=10):
    import jax

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops(a, h0, hops):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        return out[0, :2] + out[-1, :2]

    total = iters * prop_steps
    t0 = time.perf_counter()
    _ = np.asarray(many_hops(adj_dev, x, total))
    t_compile = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(many_hops(adj_dev, x, total))
    dt = time.perf_counter() - t0
    print(json.dumps({
        "bench": "banded_kernel", "engine": name,
        "edges_per_s": round(total * NNZ_MODEL / dt, 1),
        "ms_per_hop": round(dt / total * 1e3, 2),
        "compile_s": round(t_compile, 1),
    }), flush=True)


def main():
    ap = argparse.ArgumentParser()
    # rb512 doubles the row block (window grows to cover the 512-row span,
    # halving window-DMA count); "w" suffix = window staged in bf16
    ap.add_argument("--engines", nargs="+",
                    default=["xla_bf16", "pallas_bf16", "pallas_bf16w",
                             "pallas_bf16w_rb512", "pallas_bf16_rb512",
                             "xla_f32", "pallas_f32"])
    ap.add_argument("--blocks", type=int, default=661)  # arxiv-scale
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax

    from ssrg_tpu.ops.pallas_banded import PallasBandedAdj
    from ssrg_tpu.ops.sparse import BandedAdj

    print(f"device: {jax.devices()[0].platform}", flush=True)
    for eng in args.engines:
        parts = eng.split("_")
        kind, dt = parts[0], parts[1].rstrip("w")
        win_bf16 = parts[1].endswith("w")
        rb = 512 if "rb512" in parts else ROW_BLOCK
        # same band: at rb=512 each block spans 256 more rows of the band
        window = WINDOW + (rb - ROW_BLOCK)
        nb = args.blocks * ROW_BLOCK // rb
        blocks, los, n = synth_banded(nb, dt, row_block=rb, window=window)
        x = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(1), (n, F_DIM), jax.numpy.float32
            )
        )()
        if kind == "xla":
            adj = BandedAdj(blocks, los, n, n, rb)
        else:
            adj = PallasBandedAdj(
                blocks, los, n, n, rb,
                interpret=jax.default_backend() == "cpu",
                window_bf16=win_bf16,
            )
        measure(eng, adj, x, iters=args.iters)
        del adj, blocks, x


if __name__ == "__main__":
    main()
