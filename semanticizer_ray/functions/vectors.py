"""Zero-copy ingest of embedding columns from Arrow batches.

One helper shared by every vector-scanning stage (``stages/similarity``,
``stages/dedup``): the per-batch constant factor of a bandwidth-bound
corpus scan at 100 TB is exactly this conversion, so it must be ONE
``flatten()`` → ``reshape`` view for the common fixed-dim case — never a
per-row ``to_pylist`` loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def vec_matrix(col: pa.ChunkedArray | pa.Array, n: int) -> np.ndarray:
    """A float64 ``(n, D)`` matrix from an embedding column, zero-copy.

    Handles the three layouts an embedding column arrives in:

    - ``list<float/double>`` / ``fixed_size_list`` (Parquet reads): ONE
      ``flatten()`` → ``reshape`` view;
    - Ray's Arrow tensor extension (``rd.from_pandas`` with ndarray
      cells): unwrap ``.storage`` (a list array) then the same view;
    - ragged rows: per-row fallback (raises inside numpy if rows can't
      form a rectangular matrix of floats — a caller bug, loud).
    """
    lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if isinstance(lst, pa.ExtensionArray):
        lst = lst.storage
    if lst.null_count:
        raise ValueError(
            f"vec_matrix: embedding column has {lst.null_count} null rows; "
            "drop or impute nulls before the vector scan (a flatten-reshape "
            "over a column with nulls would silently misalign rows)"
        )
    try:
        return np.asarray(lst.flatten(), dtype=np.float64).reshape(n, -1)
    except ValueError:  # ragged rows — fall back to the per-row path
        return np.asarray(lst.to_pylist(), dtype=np.float64)
