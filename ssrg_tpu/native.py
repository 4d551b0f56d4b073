"""ctypes bindings for the native graph-builder runtime (native/graphbuild.cpp).

Loads ``libgraphbuild.so`` (auto-building it with ``make`` on first use when a
toolchain is present) and exposes numpy-friendly wrappers with pure-numpy
fallbacks, so the framework works identically without the native library —
just slower on ogbn-scale host-side preprocessing.

The reference's native tier accelerates the training SpMM on CPU
(``SSRG/operators/csrc/matmul.c`` via ``numpy.ctypeslib.load_library``,
``operators/utils.py:17-47``); on TPU that role belongs to device code, so
this library instead owns the host-side O(E) builder work: symmetrize +
coalesce, CSR build, normalization weights, ELL/hybrid packing.
"""

from __future__ import annotations

import ctypes
import os
import os.path as osp
import subprocess
from typing import Optional, Tuple

import numpy as np
import numpy.ctypeslib as ctl

_NATIVE_DIR = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "native")
_SO_PATH = osp.join(_NATIVE_DIR, "libgraphbuild.so")

_i64 = ctl.ndpointer(dtype=np.int64, ndim=1, flags="C_CONTIGUOUS")
_i32 = ctl.ndpointer(dtype=np.int32, ndim=1, flags="C_CONTIGUOUS")
_f32 = ctl.ndpointer(dtype=np.float32, ndim=1, flags="C_CONTIGUOUS")
_f64 = ctl.ndpointer(dtype=np.float64, ndim=1, flags="C_CONTIGUOUS")

_lib = None
_load_attempted = False


def _try_build() -> None:
    # always invoke make: it is a no-op when the .so is newer than the
    # source, and it rebuilds a STALE .so (one missing newly-added symbols,
    # which would otherwise raise AttributeError during binding below)
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        pass


def load_library() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None when unavailable."""
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    _try_build()
    if not osp.exists(_SO_PATH):
        return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.coalesce_edges.argtypes = [
            _i64, _i64, _f32, ctypes.c_int64, ctypes.c_int64, _i64, _i64, _f32,
        ]
        lib.coalesce_edges.restype = ctypes.c_int64
        lib.symmetrize_edges.argtypes = [
            _i64, _i64, _f32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int,
            _i64, _i64, _f32,
        ]
        lib.symmetrize_edges.restype = ctypes.c_int64
        lib.build_csr.argtypes = [
            _i64, _i64, _f32, ctypes.c_int64, ctypes.c_int64, _i32, _i32, _f32,
        ]
        lib.build_csr.restype = None
        lib.csr_degrees.argtypes = [_i32, _f32, ctypes.c_int64, _f64]
        lib.csr_degrees.restype = None
        lib.sym_norm_weights.argtypes = [
            _i32, _i32, _f32, _f64, ctypes.c_int64, ctypes.c_double,
        ]
        lib.sym_norm_weights.restype = None
        lib.ell_hybrid_pack.argtypes = [
            _i32, _i32, _f32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            _i32, _f32, _i32, _i32, _f32,
        ]
        lib.ell_hybrid_pack.restype = ctypes.c_int64
        lib.edge_degree_accumulate.argtypes = [
            _i64, _i64, ctypes.c_int64, _i64,
        ]
        lib.edge_degree_accumulate.restype = None
        lib.lpa_cluster.argtypes = [
            _i32, _i32, ctypes.c_int64, ctypes.c_int32, _i32,
        ]
        lib.lpa_cluster.restype = ctypes.c_int64
        lib.omp_max_threads.restype = ctypes.c_int
        _lib = lib
    except (OSError, AttributeError):
        # AttributeError = stale .so missing a newly-added symbol and the
        # rebuild failed (no toolchain): fall back to numpy paths
        _lib = None
    return _lib


def available() -> bool:
    return load_library() is not None


def symmetrize_edges(
    rows: np.ndarray, cols: np.ndarray, weights: Optional[np.ndarray],
    num_nodes: int, clamp_unit: bool = True,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Symmetric, coalesced, self-loop-free edge list (row-sorted)."""
    rows = np.ascontiguousarray(rows, np.int64)
    cols = np.ascontiguousarray(cols, np.int64)
    w = np.ascontiguousarray(
        weights if weights is not None else np.ones(rows.shape[0]), np.float32
    )
    lib = load_library()
    if lib is not None and rows.size:
        out_r = np.empty(2 * rows.size, np.int64)
        out_c = np.empty(2 * rows.size, np.int64)
        out_w = np.empty(2 * rows.size, np.float32)
        m = lib.symmetrize_edges(
            rows, cols, w, rows.size, num_nodes, int(clamp_unit),
            out_r, out_c, out_w,
        )
        return out_r[:m].copy(), out_c[:m].copy(), out_w[:m].copy()
    # numpy fallback
    import scipy.sparse as sp

    adj = sp.coo_matrix(
        (np.concatenate([w, w]),
         (np.concatenate([rows, cols]), np.concatenate([cols, rows]))),
        shape=(num_nodes, num_nodes),
    ).tocsr()
    if clamp_unit:
        adj.data[:] = np.minimum(adj.data, 1.0)
    adj.setdiag(0)
    adj.eliminate_zeros()
    coo = adj.tocoo()
    return coo.row.astype(np.int64), coo.col.astype(np.int64), coo.data.astype(np.float32)


def edge_degree_accumulate(
    src: np.ndarray, dst: np.ndarray, deg: np.ndarray
) -> None:
    """In-place symmetric degree accumulation from a directed edge chunk:
    ``deg[src]++, deg[dst]++`` for non-self-loop edges. ``deg`` is int64
    [N]. Native OMP path with a ``np.bincount`` fallback (both ~20x faster
    than ``np.add.at`` on ogbn-scale chunks)."""
    src = np.ascontiguousarray(src, np.int64)
    dst = np.ascontiguousarray(dst, np.int64)
    assert deg.dtype == np.int64 and deg.flags["C_CONTIGUOUS"]
    lib = load_library()
    if lib is not None and src.size:
        lib.edge_degree_accumulate(src, dst, src.size, deg)
        return
    keep = src != dst
    n = deg.shape[0]
    deg += np.bincount(src[keep], minlength=n).astype(np.int64)
    deg += np.bincount(dst[keep], minlength=n).astype(np.int64)


def sym_norm_csr(indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
                 r: float) -> np.ndarray:
    """In-place generalized symmetric normalization of CSR weights; returns
    the new data array. Matches ops.normalize.sym_norm's scaling (degrees
    must already include any self-loops present in the matrix)."""
    lib = load_library()
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    if lib is not None:
        deg = np.empty(n, np.float64)
        lib.csr_degrees(indptr, data, n, deg)
        lib.sym_norm_weights(indptr, indices, data, deg, n, float(r))
        return data
    deg = np.add.reduceat(
        data.astype(np.float64), indptr[:-1]
    ) if data.size else np.zeros(n)
    deg[np.diff(indptr) == 0] = 0.0
    with np.errstate(divide="ignore"):
        left = np.power(deg, r - 1.0)
        right = np.power(deg, -r)
    left[~np.isfinite(left)] = 0.0
    right[~np.isfinite(right)] = 0.0
    rows_of = np.repeat(np.arange(n), np.diff(indptr))
    return (left[rows_of] * data * right[indices]).astype(np.float32)


def lpa_cluster(
    indptr: np.ndarray, indices: np.ndarray, max_sweeps: int = 20,
) -> np.ndarray:
    """Label-propagation community labels over an undirected CSR (int32 [N]).

    Both paths run SYNCHRONOUS sweeps with ties broken to the smallest label
    (the native C++ deliberately rejects async updates so results are
    deterministic and bit-identical to this fallback): native = OMP C++ over
    rows; fallback = vectorized numpy (mode of neighbor labels via lexsort +
    run-length encoding). Role analog of the reference's ClusterData/METIS
    partitioning (``/root/reference/main.py:29-30``)."""
    n = indptr.shape[0] - 1
    if indices.size >= 2**31:
        raise ValueError(
            f"lpa_cluster: nnz={indices.size} exceeds the int32 index limit "
            "(2^31-1) of the native/numpy paths; cluster a subsampled or "
            "partitioned graph instead (the out-of-core pipeline shards "
            "papers100M-scale edge lists before clustering)"
        )
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    lib = load_library()
    if lib is not None:
        labels = np.empty(n, np.int32)
        lib.lpa_cluster(indptr, indices, n, int(max_sweeps), labels)
        return labels
    labels = np.arange(n, dtype=np.int32)
    if indices.size == 0:
        return labels
    rows_of = np.repeat(np.arange(n), np.diff(indptr))
    for _ in range(max_sweeps):
        nl = labels[indices]
        order = np.lexsort((nl, rows_of))
        r, lab = rows_of[order], nl[order]
        grp_start = np.empty(r.size, bool)
        grp_start[0] = True
        grp_start[1:] = (r[1:] != r[:-1]) | (lab[1:] != lab[:-1])
        starts = np.flatnonzero(grp_start)
        counts = np.diff(np.append(starts, r.size))
        gr, gl = r[starts], lab[starts]
        # per row: most frequent label, ties -> smallest label
        o2 = np.lexsort((gl, -counts, gr))
        _, first = np.unique(gr[o2], return_index=True)
        new = labels.copy()
        new[gr[o2][first]] = gl[o2][first]
        changed = int(np.count_nonzero(new != labels))
        labels = new
        if changed <= n // 1000:
            break
    return labels


def ell_hybrid_pack(
    indptr: np.ndarray, indices: np.ndarray, data: np.ndarray,
    width: int, n_pad: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """CSR -> (ell_cols [n_pad, width], ell_vals, tail_rows, tail_cols,
    tail_vals)."""
    n = indptr.shape[0] - 1
    indptr = np.ascontiguousarray(indptr, np.int32)
    indices = np.ascontiguousarray(indices, np.int32)
    data = np.ascontiguousarray(data, np.float32)
    lib = load_library()
    if lib is not None:
        ell_cols = np.zeros(n_pad * width, np.int32)
        ell_vals = np.zeros(n_pad * width, np.float32)
        tr = np.empty(indices.size, np.int32)
        tc = np.empty(indices.size, np.int32)
        tv = np.empty(indices.size, np.float32)
        tlen = lib.ell_hybrid_pack(
            indptr, indices, data, n, width, n_pad,
            ell_cols, ell_vals, tr, tc, tv,
        )
        return (
            ell_cols.reshape(n_pad, width), ell_vals.reshape(n_pad, width),
            tr[:tlen].copy(), tc[:tlen].copy(), tv[:tlen].copy(),
        )
    # numpy fallback
    deg = np.diff(indptr)
    pos = np.arange(indices.size) - np.repeat(indptr[:-1], deg)
    rows_of = np.repeat(np.arange(n), deg)
    in_ell = pos < width
    ell_cols = np.zeros((n_pad, width), np.int32)
    ell_vals = np.zeros((n_pad, width), np.float32)
    ell_cols[rows_of[in_ell], pos[in_ell]] = indices[in_ell]
    ell_vals[rows_of[in_ell], pos[in_ell]] = data[in_ell]
    t = ~in_ell
    return ell_cols, ell_vals, rows_of[t].astype(np.int32), indices[t], data[t]
