"""Locality-aware Pallas SpMM: banded layout, one DMA per contiguous window.

The follow-up experiment named in ``ops/pallas_spmm.py`` and VERDICT r1
(item 9): the gather-style Pallas kernel is DMA-issue-bound because it moves
one 512-byte feature row per edge. Here the banded layout (``ops/sparse.py::
BandedAdj`` — RCM/BFS-reordered graph, all neighbors of a 256-row block in
one contiguous column window) lets ONE async copy move the whole [W, F]
window (hundreds of KB, amortizing DMA issue overhead to zero), after which
the block runs as a single MXU matmul.

Pipeline shape (vs the XLA ``lax.scan`` + ``dynamic_slice`` in
``BandedAdj.spmm``): grid over row blocks; the dense block stream is
pipelined by Pallas BlockSpecs; the X window is double-buffered manually —
at step i the kernel issues window i+1's DMA before waiting on window i's,
so HBM window traffic overlaps the MXU matmul of the current block. Window
starts are data (``los``), delivered via scalar prefetch so the DMA address
is known before the body runs.

This is the cuSPARSE stream-overlap analog (reference
``operators/csrc/cudamatmul.c:50-74``: 3 CUDA streams overlapping H2D with
SpMM) rebuilt as a TPU kernel. Forward-only, like the gather kernel (the
precompute path needs no VJP). Measured comparison vs the XLA banded engine
is recorded in docs/PERFORMANCE.md.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _banded_kernel(los_ref, blocks_ref, x_hbm, out_ref, xwin, sems):
    """One row block per grid step: window DMA double-buffered across steps,
    dense [rb, W] x [W, F] matmul on the MXU."""
    i = pl.program_id(0)
    nb = pl.num_programs(0)
    w = xwin.shape[1]
    slot = jax.lax.rem(i, 2)
    nxt = jax.lax.rem(i + 1, 2)

    # window starts are 16-aligned by the builder; Mosaic needs the proof
    # (bf16 HBM sources tile at 16 sublanes) or it rejects the dynamic slice
    @pl.when(i == 0)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(los_ref[0], 16), w)],
            xwin.at[0], sems.at[0]
        ).start()

    @pl.when(i + 1 < nb)
    def _():
        pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(los_ref[i + 1], 16), w)],
            xwin.at[nxt], sems.at[nxt]
        ).start()

    pltpu.make_async_copy(
        x_hbm.at[pl.ds(0, w)], xwin.at[slot], sems.at[slot]
    ).wait()
    a = blocks_ref[0]
    out_ref[...] = jnp.dot(
        a, xwin[slot].astype(a.dtype), preferred_element_type=jnp.float32
    )


@jax.tree_util.register_pytree_node_class
@dataclass
class PallasBandedAdj:
    """BandedAdj twin evaluated by the window-DMA Pallas kernel.

    Same storage as :class:`ssrg_tpu.ops.sparse.BandedAdj` (dense
    [nb, row_block, window] blocks + per-block window starts); only the
    execution strategy differs. Forward-only (no VJP)."""

    blocks: jnp.ndarray   # [nb, row_block, window] f32 or bf16
    los: jnp.ndarray      # int32 [nb]
    n_rows: int
    n_cols: int
    row_block: int
    pad_to: int = 0
    interpret: bool = False
    # stage the X window in bf16: halves the window-DMA bytes (the second-
    # largest traffic term after the block stream); accumulation stays f32
    window_bf16: bool = False

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def window(self) -> int:
        return int(self.blocks.shape[2])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        nb, rb, w = self.blocks.shape
        f_in = x.shape[1]
        wdtype = jnp.bfloat16 if self.window_bf16 else jnp.float32
        x32 = x.astype(wdtype)
        # bf16 VMEM windows tile the lane dimension at 128: pad F up
        # (Mosaic rejects unaligned bf16 slice shapes; observed at F=48)
        f = f_in
        if self.window_bf16 and f_in % 128:
            f = (f_in + 127) // 128 * 128
            x32 = jnp.pad(x32, ((0, 0), (0, f - f_in)))
        need = max(w, self.pad_to)
        if need > x32.shape[0]:  # pad so window DMAs never clip
            x32 = jnp.pad(x32, ((0, need - x32.shape[0]), (0, 0)))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(
                    (1, rb, w), lambda i, los: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (rb, f), lambda i, los: (i, 0), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, w, f), wdtype),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        )
        out = pl.pallas_call(
            _banded_kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb * rb, f), jnp.float32),
            interpret=self.interpret,
        )(self.los, self.blocks, x32)
        out = out[: self.n_rows, :f_in]
        return out.astype(x.dtype) if x.dtype != jnp.float32 else out

    def tree_flatten(self):
        return (self.blocks, self.los), (
            self.n_rows, self.n_cols, self.row_block, self.pad_to,
            self.interpret, self.window_bf16,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_pallas_banded(
    adj: sp.spmatrix,
    row_block: int = 256,
    lane_pad: int = 128,
    dtype=jnp.float32,
    mem_budget_bytes: int = 2 << 30,
    interpret: Optional[bool] = None,
    window_bf16: bool = False,
) -> PallasBandedAdj:
    """Pack via the BandedAdj builder, evaluate via the Pallas kernel."""
    from ssrg_tpu.ops.sparse import build_banded

    banded = build_banded(
        adj, row_block=row_block, lane_pad=lane_pad, dtype=dtype,
        mem_budget_bytes=mem_budget_bytes,
    )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return PallasBandedAdj(
        banded.blocks, banded.los, banded.n_rows, banded.n_cols,
        banded.row_block, pad_to=banded.pad_to, interpret=interpret,
        window_bf16=window_bf16,
    )
