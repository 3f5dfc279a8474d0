"""Symmetric int8 scalar quantization for embedding columns (SURVEY.md
§2 extensions: embedding storage at corpus scale — 4× smaller vectors
ahead of ANN indexing / shipping).

Per vector: ``scale = max(|x|) / 127``; ``code_i = clamp(floor(x_i /
scale + 0.5), -127, 127)`` (round-half-up — chosen over ``round()``
because banker's-rounding behavior differs between numpy and SQL while
``floor(v + 0.5)`` does not). A zero vector gets scale 0 and all-zero
codes. One shuffle-free vectorized ``map_batches``; ingest is the
shared zero-copy ``vec_matrix`` path.

Determinism note (why this needs no boundary-margin guard, unlike the
ANN recall artifacts): every step — ``abs``, element ``max``, the two
divisions, ``+ 0.5``, ``floor`` — is a single elementwise IEEE-754
operation with no summation-order freedom, so numpy and any IEEE SQL
engine produce bit-identical codes. The matmul-based gates need margin
checks because reduction order varies; this kernel has no reductions.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd

from ..functions.vectors import vec_matrix


def quantize_embeddings(
    ds: rd.Dataset,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """(vec_id, scale, codes list<int8>, code_sum, code_min, code_max)
    per vector — the integer summary columns exist so exactness is
    checkable without hashing float lists."""

    def q(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        ids = (
            batch[id_col]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        if n == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "scale": pa.array([], pa.float64()),
                    "codes": pa.array([], pa.list_(pa.int8())),
                    "code_sum": pa.array([], pa.int64()),
                    "code_min": pa.array([], pa.int64()),
                    "code_max": pa.array([], pa.int64()),
                }
            )
        V = vec_matrix(batch[vec_col], n)
        amax = np.abs(V).max(axis=1)
        scale = amax / 127.0
        safe = np.where(scale > 0, scale, 1.0)
        codes = np.clip(np.floor(V / safe[:, None] + 0.5), -127, 127).astype(
            np.int8
        )
        codes[scale == 0] = 0
        c64 = codes.astype(np.int64)
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "scale": pa.array(scale, pa.float64()),
                "codes": pa.array(list(codes), pa.list_(pa.int8())),
                "code_sum": pa.array(c64.sum(axis=1), pa.int64()),
                "code_min": pa.array(c64.min(axis=1), pa.int64()),
                "code_max": pa.array(c64.max(axis=1), pa.int64()),
            }
        )

    return ds.map_batches(q, batch_format="pyarrow")
