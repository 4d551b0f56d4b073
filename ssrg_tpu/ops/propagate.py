"""K-hop propagation engines.

TPU-native replacement for the reference's ``GraphOp.propagate`` family
(``SSRG/operators/base_operator.py:11-36, 62-96, 143-208, 237-277``): a
``lax.scan`` over the device SpMM produces the stacked hop tensor
``[K+1, N, F]`` in one compiled program instead of a Python loop of ctypes
calls. Variants:

- ``propagate``          — single adjacency (SGC/SSGC/SIGN/GBP/GAMLP/NAFS)
- ``propagate_complex``  — magnetic (A_re + i*A_im)^k X as true complex
  arithmetic: 4 real SpMMs per hop, O(K) total — replacing the reference's
  exponential 2^k calculator enumeration (``base_operator.py:143-208``,
  SURVEY.md §2.13)
- ``propagate_multi``    — parallel hop lists over a tuple of adjacencies
  (TwoDir un/in/out triple, TwoOrder pair)

All are jittable with the adjacency as a pytree argument.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ssrg_tpu.ops.sparse import Adjacency


@partial(jax.jit, static_argnames=("prop_steps",))
def propagate(adj: Adjacency, feature: jnp.ndarray, prop_steps: int) -> jnp.ndarray:
    """Return stacked hop features ``[prop_steps+1, N, F]``:
    ``[X, PX, P^2 X, ..., P^K X]``."""

    def step(h, _):
        h_next = adj.spmm(h)
        return h_next, h_next

    _, hops = jax.lax.scan(step, feature, None, length=prop_steps)
    return jnp.concatenate([feature[None], hops], axis=0)


@partial(jax.jit, static_argnames=("prop_steps",))
def propagate_complex(
    real_adj: Adjacency,
    imag_adj: Adjacency,
    feature: jnp.ndarray,
    prop_steps: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Magnetic propagation: hop k = (A_re + i*A_im)^k X with X real.

    Returns (real_hops, imag_hops), each ``[prop_steps+1, N, F]``.
    Complex product per hop:
      re' = A_re @ re - A_im @ im ;  im' = A_re @ im + A_im @ re.
    """

    def step(carry, _):
        re, im = carry
        re_next = real_adj.spmm(re) - imag_adj.spmm(im)
        im_next = real_adj.spmm(im) + imag_adj.spmm(re)
        return (re_next, im_next), (re_next, im_next)

    init = (feature, jnp.zeros_like(feature))
    _, (re_hops, im_hops) = jax.lax.scan(step, init, None, length=prop_steps)
    re_all = jnp.concatenate([feature[None], re_hops], axis=0)
    im_all = jnp.concatenate([jnp.zeros_like(feature)[None], im_hops], axis=0)
    return re_all, im_all


@partial(jax.jit, static_argnames=("prop_steps",))
def propagate_multi(
    adjs: Tuple[Adjacency, ...],
    feature: jnp.ndarray,
    prop_steps: int,
) -> Tuple[jnp.ndarray, ...]:
    """Independent hop lists for each adjacency in ``adjs``
    (TwoDirGraphOp triple / TwoOrderPprApproxGraphOp pair)."""

    def step(carry, _):
        nxt = tuple(a.spmm(h) for a, h in zip(adjs, carry))
        return nxt, nxt

    init = tuple(feature for _ in adjs)
    _, hop_stacks = jax.lax.scan(step, init, None, length=prop_steps)
    return tuple(
        jnp.concatenate([feature[None], hops], axis=0) for hops in hop_stacks
    )
