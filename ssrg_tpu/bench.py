"""K-hop SpMM precompute benchmark — the framework's headline metric.

Measures edges/s for the K-hop propagation (the reference's hot loop:
``FloatCSRMulDenseOMP`` in ``SSRG/operators/csrc/matmul.c:23-40`` called K
times per feature matrix; BASELINE.md north star) on the current JAX default
device, and compares against a baseline on the host CPU:

1. the reference's own prebuilt C OpenMP kernel (``libmatmul.so``) when the
   reference checkout is present (exact apples-to-apples), else
2. scipy CSR @ dense (the reference's non-Linux fallback path,
   ``base_operator.py:309-314``).

edges/s = iterations * K * nnz / wall_time.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import numpy as np
import scipy.sparse as sp

REFERENCE_SO = (
    "/root/reference/Scalable Spectral Robust GNN/operators/csrc/libmatmul.so"
)


def make_benchmark_graph(
    num_nodes: int, avg_degree: float, num_features: int, seed: int = 0,
    kind: str = "uniform",
):
    """Random graph with ogbn-arxiv-like statistics + sym normalization.
    ``kind='powerlaw'`` uses a hub-heavy degree distribution (the realistic
    stress case for the hybrid format's overflow tail)."""
    from ssrg_tpu.data.synthetic import powerlaw_graph, random_graph
    from ssrg_tpu.ops.normalize import sym_norm

    if kind == "powerlaw":
        g = powerlaw_graph(num_nodes, avg_degree, num_features, seed=seed)
    else:
        g = random_graph(num_nodes, avg_degree, num_features, seed=seed)
    adj_norm = sym_norm(g.adj, 0.5)
    return adj_norm, g.x


def _reference_kernel(adj: sp.csr_matrix):
    """ctypes handle to the reference's OMP CSR kernel, or None."""
    if not os.path.exists(REFERENCE_SO):
        return None
    try:
        import ctypes
        import numpy.ctypeslib as ctl

        lib = ctypes.CDLL(REFERENCE_SO)
        arr_f = ctl.ndpointer(dtype=np.float32, ndim=1, flags="CONTIGUOUS")
        arr_i = ctl.ndpointer(dtype=np.int32, ndim=1, flags="CONTIGUOUS")
        fn = lib.FloatCSRMulDenseOMP
        fn.argtypes = [arr_f, arr_f, arr_i, arr_i, arr_f,
                       ctypes.c_int, ctypes.c_int]
        fn.restype = None

        data = adj.data.astype(np.float32)
        indices = adj.indices.astype(np.int32)
        indptr = adj.indptr.astype(np.int32)

        def spmm(x: np.ndarray) -> np.ndarray:
            out = np.zeros(x.size, np.float32)
            fn(out, data, indices, indptr, x.reshape(-1),
               x.shape[0], x.shape[1])
            return out.reshape(x.shape)

        return spmm
    except Exception:
        return None


def sgc_precompute(adj_dev, x, prop_steps: int):
    """K-hop precompute with per-hop wall-time reporting (reference
    top-level utils.py:71-78 sgc_precompute — the profiling hook).
    Returns (final feature, [seconds per hop])."""
    import jax
    import numpy as np

    h = jax.device_put(np.asarray(x, np.float32))
    times = []
    for _ in range(prop_steps):
        t0 = time.perf_counter()
        h = adj_dev.spmm(h)
        _ = np.asarray(h[:1, :1])  # force through remote backends
        times.append(time.perf_counter() - t0)
    return h, times


def baseline_edges_per_s(
    adj: sp.csr_matrix, x: np.ndarray, prop_steps: int, iters: int = 2
) -> tuple[float, str]:
    """CPU baseline: reference C kernel if available, else scipy."""
    kernel = _reference_kernel(adj)
    name = "reference_c_omp" if kernel is not None else "scipy_csr"
    if kernel is None:
        kernel = lambda h: adj @ h  # noqa: E731
    # warmup
    h = kernel(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        h = x
        for _ in range(prop_steps):
            h = kernel(h)
    dt = time.perf_counter() - t0
    return iters * prop_steps * adj.nnz / dt, name


def device_edges_per_s(
    adj: sp.csr_matrix, x: Optional[np.ndarray], prop_steps: int,
    engine: str = "auto", iters: int = 10, num_features: Optional[int] = None,
    diag: Optional[dict] = None,
) -> float:
    """TPU (or current default device) K-hop propagation throughput.

    All ``iters * prop_steps`` hops run inside ONE jitted ``lax.scan`` and the
    measurement fetches a tiny output slice: on a tunneled/remote backend,
    per-dispatch RTT (~60ms here) would otherwise dominate, and
    ``block_until_ready`` alone does not actually synchronize through the
    relay. Fetching forces full execution.

    When ``x is None`` the feature matrix is generated ON DEVICE with
    ``jax.random.normal`` (``num_features`` columns): through a ~3-4 MB/s
    host→device relay, shipping an arxiv-scale [N, 128] f32 matrix costs
    ~25 s of pure transfer the benchmark does not need — throughput is
    value-independent. ``diag`` (if given) collects phase timings.
    """
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ssrg_tpu.ops.sparse import device_adjacency

    # Phase 0 — relay warmup. Measured (round 3): through the tunneled
    # backend the FIRST execution in a process stalls 1-9 minutes (device
    # claim / session setup), regardless of program size, while real XLA
    # compiles take <1 s and later first-executions of NEW programs take
    # ~30 ms. The round-2 bench attributed that stall to compilation
    # ("compile_warm_s: 655") and the persistent compile cache could never
    # remove it. Absorb it here on a trivial program so the phases below
    # time what they claim to time.
    t_warm = time.perf_counter()
    _ = np.asarray(jax.jit(lambda v: (v * 2.0).sum())(jnp.ones((8, 8))))
    warmup_s = time.perf_counter() - t_warm

    t_build = time.perf_counter()
    adj_dev = device_adjacency(adj, engine)
    if x is not None:
        x_dev = jax.device_put(np.asarray(x, np.float32))
        f = x_dev.shape[1]
    else:
        f = int(num_features)
        x_dev = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (adj.shape[1], f), jnp.float32
            )
        )()
    total_hops = iters * prop_steps

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops(a, h0, hops):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        # tiny, data-dependent output: forces the whole chain to execute
        return out[0, :2] + out[-1, :2]

    cache_dir = jax.config.jax_compilation_cache_dir
    n_cache_before = (
        len(os.listdir(cache_dir))
        if cache_dir and os.path.isdir(cache_dir) else None
    )
    t_compile = time.perf_counter()
    compiled = many_hops.lower(adj_dev, x_dev, hops=total_hops).compile()
    t_exec1 = time.perf_counter()
    _ = np.asarray(compiled(adj_dev, x_dev))  # load + warm the executable
    t0 = time.perf_counter()
    _ = np.asarray(compiled(adj_dev, x_dev))
    dt = time.perf_counter() - t0
    t1 = time.perf_counter()
    _ = np.asarray(compiled(adj_dev, x_dev))
    dt2 = time.perf_counter() - t1
    spread = abs(dt - dt2) / max(dt, dt2)
    dt = min(dt, dt2)  # best-of-2 (VERDICT r4 weak #2: per-tier noise)
    if diag is not None:
        diag["headline_spread"] = round(spread, 4)
        diag["relay_warmup_s"] = round(warmup_s, 2)
        diag["build_transfer_s"] = round(t_compile - t_build, 2)
        diag["xla_compile_s"] = round(t_exec1 - t_compile, 2)
        diag["first_exec_s"] = round(t0 - t_exec1, 2)
        # continuity with BENCH_r01/r02: compile+warm of the measured program
        diag["compile_warm_s"] = round(t0 - t_compile, 2)
        diag["measure_s"] = round(dt, 2)
        if n_cache_before is not None:
            n_after = len(os.listdir(cache_dir))
            diag["persistent_cache_new_entries"] = n_after - n_cache_before
            diag["persistent_cache_hit"] = n_after == n_cache_before
        diag["device"] = jax.devices()[0].platform
        # roofline accounting: the traffic model below is the GATHER-engine
        # one (per hop: one F-row read per edge = nnz·F·4 B, plus nnz·8 B of
        # indices/weights, plus the N·F·4 B output write). It is only valid
        # for the gather family — banded/tiled/pallas engines stream dense
        # blocks with padded-zero work, so emitting these fields for them
        # would report a wrong HBM fraction (ADVICE r3).
        from ssrg_tpu.ops.sparse import DENSE_THRESHOLD

        resolved = engine
        if engine == "auto":
            resolved = "dense" if adj.shape[0] <= DENSE_THRESHOLD else "hybrid"
        if resolved in ("coo", "ell", "hybrid"):
            bytes_per_hop = adj.nnz * (f * 4 + 8) + adj.shape[0] * f * 4
            flops_per_hop = 2 * adj.nnz * f
            diag["achieved_gbps"] = round(
                bytes_per_hop * total_hops / dt / 1e9, 1
            )
            diag["achieved_gflops"] = round(
                flops_per_hop * total_hops / dt / 1e9, 1
            )
            if diag["device"] == "tpu":
                # v5e (TPU v5 lite) peaks: ~819 GB/s HBM, ~197 bf16 TFLOPS
                diag["hbm_frac"] = round(diag["achieved_gbps"] / 819.0, 3)
                diag["mxu_frac"] = round(
                    diag["achieved_gflops"] / 197_000.0, 4
                )
    return total_hops * adj.nnz / dt


# canonical generator lives in data.synthetic (single copy shared with the
# pipeline benchmarks and reorder tests); re-exported under the historical
# name for benchmarks/sharded_overhead_bench.py et al.
from ssrg_tpu.data.synthetic import community_graph as make_community_graph  # noqa: E402,F401


def _scan_hops_edges_per_s(
    adj_dev, x_dev, nnz: int, total_hops: int, reps: int = 2,
) -> tuple[float, float]:
    """Amortized-scan throughput of ``total_hops`` SpMM hops (one dispatch,
    tiny fetched output — the relay measurement protocol).

    Returns ``(best_rate, rel_spread)`` over ``reps`` timed repetitions
    (round-5, VERDICT r4 weak #2: single-sample tiers made a 6% run-to-run
    spread indistinguishable from a real regression)."""
    from functools import partial

    import jax

    @partial(jax.jit, static_argnames=("hops",))
    def many_hops(a, h0, hops):
        def hop(h, _):
            return a.spmm(h), None

        out, _ = jax.lax.scan(hop, h0, None, length=hops)
        return out[0, :2] + out[-1, :2]

    _ = np.asarray(many_hops(adj_dev, x_dev, total_hops))  # compile + warm
    rates = []
    for _i in range(max(reps, 1)):
        t0 = time.perf_counter()
        _ = np.asarray(many_hops(adj_dev, x_dev, total_hops))
        rates.append(total_hops * nnz / (time.perf_counter() - t0))
    best = max(rates)
    spread = (best - min(rates)) / best if best else 0.0
    return best, spread


def fast_tier_metrics(
    num_nodes: int = 169_343,
    num_features: int = 128,
    prop_steps: int = 3,
    iters: int = 10,
) -> dict:
    """Scoreboard rows for the flagship LOCALITY engines (round-3 verdict
    "weak #1": the headline hybrid number on a uniformly random graph is the
    one topology the fast tiers cannot serve, so a regression in them was
    driver-invisible). Measured in the SAME process as the headline (one
    relay claim):

    - ``clustered_edges_per_s``: the REAL pipeline — raw shuffled community
      graph → native LPA ``cluster_permutation`` → ``build_tiled`` (bf16,
      device scatter) → K-hop scan (docs/PERFORMANCE.md "REAL pipeline").
    - ``banded_pallas_edges_per_s``: the window-DMA Pallas kernel, bf16
      storage + bf16-staged window, row_block 512 — the measured-fastest
      tier (docs/PERFORMANCE.md: 1.135 B edges/s). Storage is generated ON
      DEVICE with the builder's exact shapes (shipping ~0.8 GiB of blocks
      through the ~3-4 MB/s relay teaches nothing about kernel speed);
      edges/s is accounted at the arxiv-scale model edge count, matching
      ``benchmarks/banded_kernel_bench.py``.

    Each tier degrades to an ``*_error`` field instead of failing the
    headline. On CPU (fallback/test runs) sizes shrink and the Pallas kernel
    runs in interpret mode — the numbers are then only liveness checks.
    """
    import jax
    import jax.numpy as jnp

    out: dict = {}
    on_tpu = jax.default_backend() != "cpu"
    total_hops = iters * prop_steps

    try:
        from ssrg_tpu.ops.normalize import sym_norm
        from ssrg_tpu.ops.reorder import apply_permutation, cluster_permutation
        from ssrg_tpu.ops.sparse import build_tiled

        # CPU (fallback/test) runs shrink to the requested size so a tiny
        # bench request is not dwarfed by a fixed 32k side workload
        n_c = num_nodes if on_tpu else min(num_nodes, 32_768)
        adj = sym_norm(make_community_graph(n_c), 0.5)
        t0 = time.perf_counter()
        perm = cluster_permutation(adj)
        adj_p, _, _, _ = apply_permutation(adj, perm)
        tiled = build_tiled(
            adj_p, dtype=jnp.bfloat16, device_scatter=on_tpu,
            mem_budget_bytes=8 << 30,
        )
        jax.tree_util.tree_leaves(tiled)[0].block_until_ready()
        out["clustered_build_s"] = round(time.perf_counter() - t0, 1)
        x = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(0), (n_c, num_features), jnp.float32
            )
        )()
        rate, spread = _scan_hops_edges_per_s(tiled, x, adj.nnz, total_hops)
        out["clustered_edges_per_s"] = round(rate, 1)
        out["clustered_spread"] = round(spread, 4)
        out["clustered_tiled_fraction"] = round(tiled.tiled_fraction, 4)
        out["clustered_num_nodes"] = n_c
        del tiled, x
    except Exception as exc:  # noqa: BLE001 — scoreboard must not die
        out["clustered_error"] = f"{type(exc).__name__}: {exc}"[:300]

    try:
        from ssrg_tpu.ops.pallas_banded import PallasBandedAdj

        row_block, window = 512, 2432  # bandwidth-1000 band at rb512
        nb = 330 if on_tpu else 2      # 330*512 ≈ arxiv N
        nnz_model = 2_489_237 if on_tpu else 10_000
        n = nb * row_block
        # on the shrunken CPU shapes the full window may exceed n; shrink it
        # (16-aligned) so the window starts stay in [0, n - window]
        window = min(window, (n // 16) * 16)
        los = np.maximum(
            0, np.minimum(np.arange(nb) * row_block - window // 2, n - window)
        )
        los = ((los // 16) * 16).astype(np.int32)

        @jax.jit
        def gen_blocks():
            return jax.random.normal(
                jax.random.PRNGKey(0), (nb, row_block, window), jnp.float32
            ).astype(jnp.bfloat16)

        blocks = gen_blocks()
        banded = PallasBandedAdj(
            blocks, jnp.asarray(los), n, n, row_block,
            interpret=not on_tpu, window_bf16=True,
        )
        x = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(1), (n, num_features), jnp.float32
            )
        )()
        hops = total_hops if on_tpu else 2
        rate, spread = _scan_hops_edges_per_s(banded, x, nnz_model, hops)
        out["banded_pallas_edges_per_s"] = round(rate, 1)
        out["banded_pallas_spread"] = round(spread, 4)
        del banded, blocks, x
    except Exception as exc:  # noqa: BLE001
        out["banded_pallas_error"] = f"{type(exc).__name__}: {exc}"[:300]
    return out


def sharded_tier_metrics(
    adj, num_features: int, prop_steps: int, iters: int = 10,
) -> dict:
    """Driver-visible sharded tier (round-5, VERDICT r4 weak #3): the
    round-4 flagship claim — fast local engines under shard_map at ~zero
    wrapper overhead — previously lived only in
    ``benchmarks/sharded_overhead_bench.py`` output quoted in docs, so a
    shard_map/layout regression would not move any BENCH number. Runs the
    HYBRID engine on a 1-shard mesh over the headline graph in the same
    process; ``sharded_edges_per_s`` ÷ headline ``value`` is the wrapper
    overhead."""
    from functools import partial

    import jax
    import jax.numpy as jnp

    from ssrg_tpu.parallel.dist_spmm import (
        dist_propagate_hybrid, shard_adjacency_hybrid,
    )
    from ssrg_tpu.parallel.mesh import make_mesh
    from ssrg_tpu.parallel.partition import partition_rows_hybrid

    out: dict = {}
    try:
        mesh = make_mesh((1,), ("graph",), jax.devices()[:1])
        part = partition_rows_hybrid(adj, 1)
        sharded = shard_adjacency_hybrid(part, mesh)
        xs = jax.jit(
            lambda: jax.random.normal(
                jax.random.PRNGKey(2), (part.n_pad, num_features),
                jnp.float32,
            )
        )()

        total_hops = iters * prop_steps

        @partial(jax.jit, static_argnames=("hops",))
        def many(a, h0, hops):
            # one hop per scan step ([1] of the [K+1,...] output) — the
            # dedicated benchmarks/sharded_overhead_bench.py protocol; a
            # K-hop call per step would re-materialize the full stacked hop
            # tensor every iteration and under-report the engine ~4×
            def it(h, _):
                return dist_propagate_hybrid(a, h, 1)[1], None

            final, _ = jax.lax.scan(it, h0, None, length=hops)
            return final[0, :2]

        _ = np.asarray(many(sharded, xs, total_hops))  # compile + warm
        rates = []
        for _i in range(2):
            t0 = time.perf_counter()
            _ = np.asarray(many(sharded, xs, total_hops))
            rates.append(total_hops * adj.nnz
                         / (time.perf_counter() - t0))
        best = max(rates)
        out["sharded_edges_per_s"] = round(best, 1)
        out["sharded_spread"] = round((best - min(rates)) / best, 4)
    except Exception as exc:  # noqa: BLE001 — scoreboard must not die
        out["sharded_error"] = f"{type(exc).__name__}: {exc}"[:300]
    return out


def run_bench(
    num_nodes: int = 169_343,
    avg_degree: float = 13.7,
    num_features: int = 128,
    prop_steps: int = 3,
    engine: str = "auto",
    iters: int = 10,
    seed: int = 0,
    emit: bool = True,
    fast_tiers: bool = True,
) -> dict:
    adj, x = make_benchmark_graph(num_nodes, avg_degree, num_features, seed)
    diag: dict = {}
    dev = device_edges_per_s(
        adj, None, prop_steps, engine, iters,
        num_features=num_features, diag=diag,
    )
    base, base_name = baseline_edges_per_s(adj, x, prop_steps)
    result = {
        "metric": "khop_spmm_edges_per_s",
        "value": round(dev, 1),
        "unit": "edges/s",
        "vs_baseline": round(dev / base, 3),
        "baseline": base_name,
        "baseline_edges_per_s": round(base, 1),
        "nnz": int(adj.nnz),
        "num_nodes": num_nodes,
        "num_features": num_features,
        "prop_steps": prop_steps,
        "engine": engine,
        **diag,
    }
    if fast_tiers:
        # same process: the relay claim is already paid; a regression in the
        # flagship locality engines becomes driver-visible (VERDICT r3 ask 4)
        result.update(
            fast_tier_metrics(num_nodes, num_features, prop_steps, iters)
        )
        # driver-visible shard_map tier on the SAME headline graph (r5)
        result.update(
            sharded_tier_metrics(adj, num_features, prop_steps, iters)
        )
        if "sharded_edges_per_s" in result and result["value"]:
            result["sharded_vs_bare"] = round(
                result["sharded_edges_per_s"] / result["value"], 3
            )
    if emit:
        print(json.dumps(result))
    return result
