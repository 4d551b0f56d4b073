"""SDDMM — sampled dense-dense matrix multiplication.

score[e] = <U[row_e], V[col_e]> for each edge e: the edge-scoring primitive
behind attention (GAT), wavelet diag-rescale patterns, and learned edge
weighting (BASELINE.json north-star kernel list names SpMM + SDDMM). On TPU
this is two row gathers + a VPU reduction, chunked over the edge dimension
so peak memory stays bounded; the MXU has no role because the contraction is
per-edge.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("chunk",))
def sddmm(
    row: jnp.ndarray,
    col: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    chunk: int = 1 << 19,
) -> jnp.ndarray:
    """Per-edge dot products. row/col int32 [E] (padded entries allowed — any
    valid index; mask the output), u [N, F], v [M, F] -> [E] f32."""
    e = row.shape[0]
    if e <= chunk:
        return jnp.einsum(
            "ef,ef->e", jnp.take(u, row, axis=0), jnp.take(v, col, axis=0),
            preferred_element_type=jnp.float32,
        )
    num_chunks = -(-e // chunk)
    pad = num_chunks * chunk - e
    row_p = jnp.pad(row, (0, pad))
    col_p = jnp.pad(col, (0, pad))

    def body(_, rc):
        r, c = rc
        out = jnp.einsum(
            "ef,ef->e", jnp.take(u, r, axis=0), jnp.take(v, c, axis=0),
            preferred_element_type=jnp.float32,
        )
        return None, out

    _, outs = jax.lax.scan(
        body, None,
        (row_p.reshape(num_chunks, chunk), col_p.reshape(num_chunks, chunk)),
    )
    return outs.reshape(-1)[:e]


def sddmm_softmax_spmm(
    row: jnp.ndarray,
    col: jnp.ndarray,
    mask: jnp.ndarray,
    u: jnp.ndarray,
    v: jnp.ndarray,
    values: jnp.ndarray,
    num_nodes: int,
) -> jnp.ndarray:
    """Fused attention pattern: edge scores = SDDMM(u, v), per-destination
    softmax, then SpMM against ``values`` — one graph-attention layer's graph
    math in three segment ops (the building block behind
    models.baselines.BaselineGAT)."""
    scores = sddmm(row, col, u, v)
    neg = jnp.finfo(scores.dtype).min
    masked = jnp.where(mask > 0, scores, neg)
    row_max = jax.ops.segment_max(masked, row, num_segments=num_nodes)
    row_max = jnp.where(jnp.isfinite(row_max), row_max, 0.0)
    ex = jnp.exp(masked - row_max[row]) * mask
    denom = jax.ops.segment_sum(ex, row, num_segments=num_nodes)
    alpha = ex / jnp.maximum(denom[row], 1e-16)
    gathered = jnp.take(values, col, axis=0) * alpha[:, None]
    return jax.ops.segment_sum(gathered, row, num_segments=num_nodes)
