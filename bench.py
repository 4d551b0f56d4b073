#!/usr/bin/env python
"""Headline benchmark: K-hop SpMM precompute throughput (edges/s) on the
current device vs the reference CPU kernel. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}."""

import sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])

from ssrg_tpu.bench import run_bench  # noqa: E402

if __name__ == "__main__":
    run_bench()
