"""Pallas TPU SpMM kernel tier.

The reference's hot loop is a CPU CSR SpMM kernel
(``SSRG/operators/csrc/matmul.c:23-40`` — OMP over rows, AVX over features);
this module is its TPU counterpart as an explicit Mosaic/Pallas kernel: the
OMP row loop becomes the Pallas grid over row blocks, the AVX lanes become
VPU lanes, and the cuSPARSE stream overlap (``cudamatmul.c:50-74``) becomes
double-buffered async DMA of neighbor feature rows from HBM into VMEM.

Design (ELL layout, one grid step per row block):

  grid i over row blocks of 8 rows;   X stays in HBM (ANY)
  cols/vals blocks  [8, width]  -> VMEM via BlockSpec
  scratch           [2, width, F] VMEM  (double buffer)
  for each row r in the block:
      prefetch row r+1's neighbor rows (width DMAs) into buffer (r+1)%2
      wait row r's DMAs; out[r] = Σ_w vals[r, w] * buf[r%2, w]

Honest roofline note (measured on the target chip, see SNIPPETS/BENCH): each
neighbor row is a 512-byte DMA; at ~1 DMA/µs issue rate the kernel is
DMA-issue-bound near ~1 M edges/s·width — far below XLA's hardware-gather
lowering used by the ELL/hybrid engines (~10⁸ edges/s). The kernel is
therefore shipped as a capability tier (and the scaffold for locality-aware
variants where a reordered graph lets one DMA fetch many neighbors), while
``hybrid`` remains the default engine. Correctness is tested in interpret
mode on CPU and compiled on TPU.
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

from ssrg_tpu.ops.sparse import COOAdj, build_coo, _round_up

ROW_BLOCK = 8  # rows per grid step (f32 sublane tile)


def _spmm_kernel(cols_ref, vals_ref, x_hbm, out_ref, scratch, sems):
    """One row-block: double-buffered gather of neighbor rows + VPU reduce."""
    block, width = cols_ref.shape

    def issue(row_in_block, slot):
        for w in range(width):
            pltpu.make_async_copy(
                x_hbm.at[cols_ref[row_in_block, w]],
                scratch.at[slot, w],
                sems.at[slot, w],
            ).start()

    def wait(slot):
        for w in range(width):
            pltpu.make_async_copy(
                x_hbm.at[0], scratch.at[slot, w], sems.at[slot, w]
            ).wait()

    issue(0, 0)

    def body(r, _):
        slot = jax.lax.rem(r, 2)
        nxt = jax.lax.rem(r + 1, 2)

        @pl.when(r + 1 < block)
        def _():
            issue(r + 1, nxt)

        wait(slot)
        acc = jnp.zeros((1, scratch.shape[2]), jnp.float32)
        for w in range(width):
            acc = acc + vals_ref[r, w] * scratch[slot, w][None, :]
        out_ref[pl.ds(r, 1), :] = acc
        return 0

    jax.lax.fori_loop(0, block, body, 0)


@jax.tree_util.register_pytree_node_class
@dataclass
class PallasELLAdj:
    """ELL adjacency evaluated by the Pallas gather kernel; overflow edges
    (rows longer than ``width``) live in a COO tail evaluated by the
    segment-sum engine.

    Note: ``spmm`` is forward-only (no VJP is defined for the hand-written
    kernel) — use it for the precompute propagation path, which needs no
    gradients. Differentiable paths (naive GCN / GAT / wavelet layers) use
    the XLA engines, whose autodiff transpose is the same-format SpMM."""

    cols: jnp.ndarray      # int32 [n_pad, width]
    vals: jnp.ndarray      # f32   [n_pad, width]
    tail: COOAdj
    n_rows: int
    n_cols: int
    interpret: bool = False

    @property
    def shape(self) -> Tuple[int, int]:
        return (self.n_rows, self.n_cols)

    @property
    def width(self) -> int:
        return int(self.cols.shape[1])

    def spmm(self, x: jnp.ndarray) -> jnp.ndarray:
        n_pad, width = self.cols.shape
        f = x.shape[1]
        x32 = x.astype(jnp.float32)
        out = pl.pallas_call(
            _spmm_kernel,
            grid=(n_pad // ROW_BLOCK,),
            in_specs=[
                pl.BlockSpec(
                    (ROW_BLOCK, width), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (ROW_BLOCK, width), lambda i: (i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (ROW_BLOCK, f), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
            out_shape=jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((2, width, f), jnp.float32),
                pltpu.SemaphoreType.DMA((2, width)),
            ],
            interpret=self.interpret,
        )(self.cols, self.vals, x32)
        result = out[: self.n_rows]
        return result + self.tail.spmm(x32)

    def tree_flatten(self):
        return (self.cols, self.vals, self.tail), (
            self.n_rows, self.n_cols, self.interpret,
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


def build_pallas_csr(
    adj: sp.spmatrix,
    width: Optional[int] = None,
    width_percentile: float = 90.0,
    interpret: Optional[bool] = None,
    chunk: int = 1 << 19,
) -> PallasELLAdj:
    """Pack a scipy adjacency for the Pallas kernel (ELL + COO tail)."""
    from ssrg_tpu import native

    csr = adj.tocsr()
    n, m = csr.shape
    deg = np.diff(csr.indptr)
    if width is None:
        width = int(np.percentile(deg, width_percentile)) if n else 1
        width = max(int(width), 1)
    n_pad = _round_up(max(n, 1), ROW_BLOCK)
    cols, vals, tr, tc, tv = native.ell_hybrid_pack(
        csr.indptr, csr.indices, csr.data, width, n_pad
    )
    tail = sp.coo_matrix((tv, (tr, tc)), shape=(n, m))
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    return PallasELLAdj(
        jnp.asarray(cols), jnp.asarray(vals), build_coo(tail, chunk=chunk),
        n_rows=n, n_cols=m, interpret=interpret,
    )
