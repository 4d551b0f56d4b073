"""Misc utilities (reference ``SSRG/utils.py:10-38``; SURVEY.md §2.10)."""

from __future__ import annotations

import random
from typing import List, Sequence

import jax
import numpy as np


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy (+ torch when importable) and return a JAX key
    (reference utils.py:10-18)."""
    random.seed(seed)
    np.random.seed(seed)
    try:
        import torch

        torch.manual_seed(seed)
    except ImportError:
        pass
    return jax.random.PRNGKey(seed)


def get_params(params) -> int:
    """Total trainable parameter count (reference utils.py:20-27)."""
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(params))


def generate_numbers(n: int, exclude: int, pool: Sequence[int],
                     rng: np.random.Generator | None = None) -> List[int]:
    """Sample n values from pool excluding ``exclude``
    (reference utils.py:29-33)."""
    rng = rng or np.random.default_rng()
    pool_arr = np.asarray(pool)
    pool_arr = pool_arr[pool_arr != exclude]
    return rng.choice(pool_arr, size=n, replace=True).tolist()


def compute_distance(candidates: np.ndarray, target: np.ndarray) -> np.ndarray:
    """Row-wise L2 distance to a target vector (reference utils.py:35-38)."""
    return np.linalg.norm(
        np.asarray(candidates) - np.asarray(target)[None, :], axis=1
    )
