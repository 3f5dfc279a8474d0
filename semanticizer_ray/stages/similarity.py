"""Similarity search over an embedding column (SURVEY.md §2 extensions).

- ``knn_brute``: exact top-k cosine — the query matrix is broadcast
  (``ray.put`` once), each batch does one numpy matmul against it, partial
  top-k per batch, global top-k via a final sort-limit. Scales linearly in
  corpus size; the only global step handles num_queries × k rows.
- ``knn_lsh``: the scale path — random-hyperplane buckets prune the corpus
  to the query's bucket (and optional Hamming-1 neighbors) before exact
  scoring. Recall < 1; documented trade-off, verified against knn_brute.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _normalize_rows(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1)
    n[n == 0] = 1.0
    return V / n[:, None]


def knn_brute(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Exact cosine top-k. Output: (query_idx, vec_id, cosine) — k rows per
    query, ties broken by vec_id asc."""
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)  # (Q, D), read once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            V = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            Vn = _normalize_rows(V)
            C = self.q @ Vn.T  # (Q, B)
            out_q, out_id, out_c = [], [], []
            kk = min(k, C.shape[1])
            for qi in range(C.shape[0]):
                # partial top-k per batch (ties → lower id): argsort on
                # (-cosine, id) via lexsort
                order = np.lexsort((ids, -C[qi]))[:kk]
                out_q.extend([qi] * len(order))
                out_id.extend(ids[order].tolist())
                out_c.extend(C[qi][order].tolist())
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    id_col: pa.array(out_id, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    partial = ds.map_batches(
        Score, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4), num_cpus=1
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        return g

    return partial.groupby("query_idx").map_groups(final_topk, batch_format="pandas")


def knn_lsh(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    seed: int = 42,
    probe_hamming1: bool = True,
) -> rd.Dataset:
    """Approximate top-k: score only vectors whose hyperplane-sign bucket
    matches the query's bucket (± Hamming-1 probes). Same output schema as
    ``knn_brute``; recall measured against it in tests."""
    Q = np.asarray(queries, dtype=np.float64)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((Q.shape[1], num_planes))
    qn = _normalize_rows(Q)

    def bucket_of(V: np.ndarray) -> np.ndarray:
        bits = (V @ planes) > 0
        return (bits * (1 << np.arange(num_planes))).sum(axis=1).astype(np.int64)

    q_buckets = bucket_of(Q)
    probe: set[int] = set()
    for b in q_buckets:
        probe.add(int(b))
        if probe_hamming1:
            for p in range(num_planes):
                probe.add(int(b) ^ (1 << p))
    state_ref = ray.put((qn, planes, probe, q_buckets))

    class Score:
        def __init__(self):
            self.q, self.planes, self.probe, _ = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = np.asarray(batch[id_col].to_pylist(), dtype=np.int64)
            V = np.asarray(batch[vec_col].to_pylist(), dtype=np.float64)
            b = (((V @ self.planes) > 0) * (1 << np.arange(self.planes.shape[1]))).sum(
                axis=1
            )
            mask = np.isin(b, list(self.probe))
            if not mask.any():
                return pa.table(
                    {
                        "query_idx": pa.array([], pa.int32()),
                        id_col: pa.array([], pa.int64()),
                        "cosine": pa.array([], pa.float64()),
                    }
                )
            ids = ids[mask]
            Vn = _normalize_rows(V[mask])
            C = self.q @ Vn.T
            out_q, out_id, out_c = [], [], []
            kk = min(k, C.shape[1])
            for qi in range(C.shape[0]):
                order = np.lexsort((ids, -C[qi]))[:kk]
                out_q.extend([qi] * len(order))
                out_id.extend(ids[order].tolist())
                out_c.extend(C[qi][order].tolist())
            return pa.table(
                {
                    "query_idx": pa.array(out_q, pa.int32()),
                    id_col: pa.array(out_id, pa.int64()),
                    "cosine": pa.array(out_c, pa.float64()),
                }
            )

    partial = ds.map_batches(
        Score, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4), num_cpus=1
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)

    return partial.groupby("query_idx").map_groups(final_topk, batch_format="pandas")
