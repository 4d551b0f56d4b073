#!/usr/bin/env python
"""Out-of-core BUCKET kernels in isolation: segment_sum vs hybrid ELL+tail
(VERDICT r4 ask 4 "Done" evidence).

End-to-end `ooc_rehearsal.py` through this container's relay is ~99%
host→device transfer (round-4: 833 s propagate of which ~5 s chip compute),
so the local-engine change is invisible there BY CONSTRUCTION — this bench
stages ONE representative (dest, src) bucket resident on device and times
the two jitted block kernels the schedule calls per bucket:

  - `_block_spmm`      — chunked gather + segment_sum (the r4 engine)
  - `_block_spmm_ell`+tail — ELL gather+einsum reduce + COO overflow (r5)

Run on the chip: python benchmarks/ooc_bucket_kernel_bench.py
"""

from __future__ import annotations

import argparse
import json
import time
from functools import partial

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--block", type=int, default=1_245_184)  # N=10M / 8
    ap.add_argument("--edges", type=int, default=5_000_000)  # intra bucket
    ap.add_argument("--features", type=int, default=64)
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from ssrg_tpu import native
    from ssrg_tpu.parallel.outofcore import (
        _block_spmm, _block_spmm_ell, _pow2_pad,
    )

    def emit(**kv):
        print(json.dumps(kv), flush=True)

    t0 = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2).sum())(jnp.ones((8, 8))))
    emit(phase="relay_warmup", seconds=round(time.perf_counter() - t0, 2),
         device=jax.devices()[0].platform)

    rng = np.random.default_rng(0)
    block, e, f = args.block, args.edges, args.features
    # community-biased bucket (75% of edges land in 1024-node neighborhoods,
    # like the rehearsal generator)
    r = np.sort(rng.integers(0, block, e)).astype(np.int64)
    comm = 1024
    intra = rng.random(e) < 0.75
    c = np.where(
        intra,
        (r // comm) * comm + rng.integers(0, comm, e),
        rng.integers(0, block, e),
    ).astype(np.int64)
    v = rng.uniform(0.1, 1.0, e).astype(np.float32)
    emit(phase="setup", block=block, edges=e, features=f)

    # device-resident source block + accumulator
    x = jax.jit(
        lambda: jax.random.normal(jax.random.PRNGKey(0), (block, f),
                                  jnp.float32)
    )()
    acc0 = jnp.zeros((block, f), jnp.float32)

    @partial(jax.jit, static_argnames=("reps", "block"))
    def many_coo(rows, cols, vals, xb, reps, block):
        def it(a, _):
            return _block_spmm(rows, cols, vals, xb, a, block), None

        out, _ = jax.lax.scan(it, jnp.zeros_like(xb), None, length=reps)
        return out[0, :2]

    @partial(jax.jit, static_argnames=("reps", "block", "has_tail"))
    def many_ell(ec, ev, tail, xb, reps, block, has_tail):
        def it(a, _):
            a = _block_spmm_ell(ec, ev, xb, a, block)
            if has_tail:
                a = _block_spmm(*tail, xb, a, block)
            return a, None

        out, _ = jax.lax.scan(it, jnp.zeros_like(xb), None, length=reps)
        return out[0, :2]

    # --- coo tier
    n_pad = _pow2_pad(e)
    rows_p = np.zeros(n_pad, np.int32)
    cols_p = np.zeros(n_pad, np.int32)
    vals_p = np.zeros(n_pad, np.float32)
    rows_p[:e], cols_p[:e], vals_p[:e] = r, c, v
    rows_d, cols_d, vals_d = map(jnp.asarray, (rows_p, cols_p, vals_p))
    _ = np.asarray(many_coo(rows_d, cols_d, vals_d, x, args.reps, block))
    t0 = time.perf_counter()
    _ = np.asarray(many_coo(rows_d, cols_d, vals_d, x, args.reps, block))
    dt = time.perf_counter() - t0
    emit(phase="measure", engine="segment_sum_coo",
         ms_per_bucket=round(dt / args.reps * 1e3, 2),
         edges_per_s=round(e * args.reps / dt, 1))
    del rows_d, cols_d, vals_d

    # --- hybrid tier (the r5 default's host pack)
    order = np.lexsort((c, r))
    rs, cs, vs = r[order], c[order], v[order]
    deg = np.bincount(rs, minlength=block)
    nz = deg[deg > 0]
    width = int(np.percentile(nz, 95)) if nz.size else 1
    w = 8
    while w < width:
        w <<= 1
    indptr = np.zeros(block + 1, np.int64)
    np.add.at(indptr, rs + 1, 1)
    ec, ev, tr, tc, tv = native.ell_hybrid_pack(
        np.cumsum(indptr), cs.astype(np.int32), vs, w, block
    )
    tail = None
    has_tail = tr.size > 0
    if has_tail:
        t_pad = _pow2_pad(tr.size, floor=1 << 9)
        tr_p = np.zeros(t_pad, np.int32)
        tc_p = np.zeros(t_pad, np.int32)
        tv_p = np.zeros(t_pad, np.float32)
        tr_p[: tr.size], tc_p[: tc.size], tv_p[: tv.size] = tr, tc, tv
        tail = (jnp.asarray(tr_p), jnp.asarray(tc_p), jnp.asarray(tv_p))
    ec_d, ev_d = jnp.asarray(ec), jnp.asarray(ev)
    emit(phase="layout", width=w, tail_edges=int(tr.size),
         tail_frac=round(tr.size / e, 4))
    _ = np.asarray(many_ell(ec_d, ev_d, tail, x, args.reps, block, has_tail))
    t0 = time.perf_counter()
    _ = np.asarray(many_ell(ec_d, ev_d, tail, x, args.reps, block, has_tail))
    dt = time.perf_counter() - t0
    emit(phase="measure", engine="hybrid_ell_tail",
         ms_per_bucket=round(dt / args.reps * 1e3, 2),
         edges_per_s=round(e * args.reps / dt, 1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
