#!/usr/bin/env python
"""Headline benchmark: K-hop SpMM precompute throughput (edges/s) on the
default device vs the reference CPU kernel. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}.

The measurement runs in a watchdog subprocess: the TPU here sits behind a
remote-compile relay that can wedge indefinitely (infra-side), and a hung
benchmark is worse than a degraded one. On timeout/failure the harness
retries on CPU and marks the result ``device: "cpu-fallback"``.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.abspath(__file__))
TIMEOUT_S = int(os.environ.get("SSRG_BENCH_TIMEOUT", "480"))

CHILD = r"""
import json, sys
sys.path.insert(0, {repo!r})
if {force_cpu}:
    import jax
    jax.config.update("jax_platforms", "cpu")
from ssrg_tpu.bench import run_bench
result = run_bench(emit=False)
if {force_cpu}:
    result["device"] = "cpu-fallback"
print("RESULT" + json.dumps(result))
"""


def _attempt(force_cpu: bool):
    code = CHILD.format(repo=REPO, force_cpu=force_cpu)
    try:
        proc = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, text=True, timeout=TIMEOUT_S,
        )
    except subprocess.TimeoutExpired:
        return None
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            return json.loads(line[len("RESULT"):])
    return None


def main() -> int:
    result = _attempt(force_cpu=False)
    if result is None:
        result = _attempt(force_cpu=True)
    if result is None:
        print(json.dumps({
            "metric": "khop_spmm_edges_per_s", "value": 0.0,
            "unit": "edges/s", "vs_baseline": 0.0,
            "error": "benchmark timed out on both device and cpu fallback",
        }))
        return 1
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
