"""Zero-copy Arrow → numpy helpers for the hot inner loops.

The embeddings table stores vectors as ``list<float>``; decoding them via
``to_pylist()`` round-trips every float through a Python object (measured
~60% of ann_topk wall time).  ``list_column_to_ndarray`` instead reshapes
the underlying flat values buffer — zero-copy when there are no nulls.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def list_column_to_ndarray(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) ndarray view over a ``list<T>`` / ``fixed_size_list<T>``
    column whose lists all share one length.  Zero-copy from the Arrow
    values buffer where possible (no nulls, contiguous offsets)."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(arr, pa.ChunkedArray):      # 0-chunk edge case
        arr = pa.array([], type=col.type)
    n = len(arr)
    if n == 0:
        return np.zeros((0, 0), dtype=dtype)
    flat = arr.flatten()                      # honors slice offsets
    vals = np.asarray(flat)
    if vals.size % n:
        raise ValueError("ragged list column cannot reshape to (n, dim)")
    dim = vals.size // n
    if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type):
        offs = np.asarray(arr.offsets)
        if not (np.diff(offs) == dim).all():
            raise ValueError("ragged list column cannot reshape to (n, dim)")
    return np.ascontiguousarray(vals.reshape(n, dim), dtype=dtype)


def binary_column_to_u64(col, width_u64: int) -> np.ndarray:
    """(n, width_u64) uint64 matrix from a binary column of fixed-size
    payloads (e.g. minhash signatures) without a per-row Python join."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    if n == 0:
        return np.zeros((0, width_u64), dtype=np.uint64)
    buf = b"".join(arr.to_pylist())  # binary payloads are opaque; one join
    return np.frombuffer(buf, dtype=np.uint64).reshape(n, width_u64)
