"""Similarity search over an embedding column (SURVEY.md §2 extensions).

- ``knn_brute``: exact top-k cosine — the query matrix is broadcast
  (``ray.put`` once), each batch does one numpy matmul against it, partial
  top-k per batch, global top-k via a final sort-limit. Scales linearly in
  corpus size; the only global step handles num_queries × k rows.
- ``knn_lsh``: a scale path — random-hyperplane buckets prune the corpus
  to the query's bucket (and optional Hamming-1 neighbors) before exact
  scoring. Recall < 1; documented trade-off, verified against knn_brute.
- ``knn_ivf``: the other scale path — IVF (inverted-file) pruning:
  deterministic spherical k-means centroids trained on a bounded sample,
  broadcast once; each batch assigns rows to their nearest centroid and
  scores only rows in the queries' ``nprobe`` closest cells. No shuffle
  at all; recall measured against knn_brute (``knn_ivf_recall`` gate).

Batch ingest is zero-copy: fixed-dim embedding columns are read as ONE
``flatten()`` → ``reshape`` view (same fast path as
``embedding_dedup.bucketize``), never ``to_pylist`` per row — the per-batch
constant factor of the bandwidth-bound corpus scan at 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.vectors import vec_matrix


def _normalize_rows(V: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(V, axis=1)
    n[n == 0] = 1.0
    return V / n[:, None]


def _ids_and_vecs(
    batch: pa.Table, id_col: str, vec_col: str
) -> tuple[np.ndarray, np.ndarray]:
    """(int64 ids, float64 (n, D) vectors) from an Arrow batch, zero-copy.

    Fixed-dim list columns take the single flatten→reshape view; ragged
    rows fall back to the per-row path (same contract as
    ``embedding_dedup.bucketize``, stages/dedup.py).
    """
    n = batch.num_rows
    ids = (
        batch[id_col]
        .combine_chunks()
        .to_numpy(zero_copy_only=False)
        .astype(np.int64, copy=False)
    )
    if n == 0:
        return ids, np.empty((0, 1), dtype=np.float64)
    return ids, vec_matrix(batch[vec_col], n)


def _topk_table(
    C: np.ndarray, ids: np.ndarray, k: int, id_col: str
) -> pa.Table:
    """Per-batch partial top-k over a (Q, B) cosine matrix, vectorized
    emit (one gather per output column; ties → lower id via lexsort)."""
    kk = min(k, C.shape[1])
    if kk == 0:
        return pa.table(
            {
                "query_idx": pa.array([], pa.int32()),
                id_col: pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    orders = np.stack(
        [np.lexsort((ids, -C[qi]))[:kk] for qi in range(C.shape[0])]
    )  # (Q, kk) argsort on (-cosine, id)
    out_q = np.repeat(np.arange(C.shape[0], dtype=np.int32), kk)
    return pa.table(
        {
            "query_idx": pa.array(out_q, pa.int32()),
            id_col: pa.array(ids[orders.ravel()], pa.int64()),
            "cosine": pa.array(
                np.take_along_axis(C, orders, axis=1).ravel(), pa.float64()
            ),
        }
    )


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
            ids, V = _ids_and_vecs(batch, id_col, vec_col)
            if len(ids) == 0:
                return _topk_table(np.empty((0, 0)), ids, k, id_col)
            Vn = _normalize_rows(V)
            C = self.q @ Vn.T  # (Q, B)
            return _topk_table(C, ids, k, id_col)

    partial = ds.map_batches(
        Score, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4), num_cpus=1
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        g = group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        return g

    return partial.groupby("query_idx").map_groups(final_topk, batch_format="pandas")


def kmeans_centroids(
    V: np.ndarray, nlist: int, iters: int = 10, seed: int = 42
) -> np.ndarray:
    """Deterministic spherical k-means: unit-norm centroids, cosine
    assignment (argmax dot product). Fixed rng seed + fixed input → the
    same centroids on every run/platform (the IVF recall artifact depends
    on this). An empty cell is re-seeded to the vector least covered by
    the current centroids (deterministic, no rng draw)."""
    Vn = _normalize_rows(np.asarray(V, dtype=np.float64))
    n = len(Vn)
    if nlist < 1 or nlist > n:
        raise ValueError(f"nlist ({nlist}) must be in [1, n_train={n}]")
    rng = np.random.default_rng(seed)
    C = Vn[rng.choice(n, size=nlist, replace=False)]
    for _ in range(iters):
        sims = Vn @ C.T  # (n, nlist)
        assign = sims.argmax(axis=1)
        newC = np.zeros_like(C)
        np.add.at(newC, assign, Vn)
        counts = np.bincount(assign, minlength=nlist)
        empty = counts == 0
        if empty.any():
            # farthest-from-coverage rows re-seed empty cells
            worst = np.argsort(sims.max(axis=1))[: int(empty.sum())]
            newC[empty] = Vn[worst]
            counts[empty] = 1
        C = _normalize_rows(newC / counts[:, None])
    return C


def knn_ivf(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nlist: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    train_sample: int = 100_000,
) -> rd.Dataset:
    """Approximate top-k via IVF (inverted-file) pruning. Same output
    schema as ``knn_brute``; recall measured against it.

    Scale shape: centroid training reads a BOUNDED sample
    (``limit(train_sample)`` — never the full corpus) on the driver;
    the (nlist × D) centroid matrix + query state broadcast once via
    ``ray.put``; the corpus pass is one shuffle-free ``map_batches`` —
    each batch assigns its rows to their nearest centroid (one matmul)
    and scores only rows whose cell is probed by some query (union of
    per-query ``nprobe`` closest cells, the same union-candidacy contract
    as ``knn_lsh``); the only global step handles num_queries × k rows.
    """
    Q = np.asarray(queries, dtype=np.float64)
    qn = _normalize_rows(Q)
    train = ds.limit(int(train_sample)).to_pandas()
    _ids_t, Vt = _ids_and_vecs(pa.Table.from_pandas(train), id_col, vec_col)
    C = kmeans_centroids(Vt, nlist=nlist, seed=seed)
    # per-query probe cells → union, as a sorted array for np.isin
    order = np.argsort(-(qn @ C.T), axis=1)[:, :nprobe]
    probe_arr = np.unique(order.ravel()).astype(np.int64)
    state_ref = ray.put((qn, C, probe_arr))

    class Score:
        def __init__(self):
            self.q, self.C, self.probe = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, V = _ids_and_vecs(batch, id_col, vec_col)
            if len(ids) == 0:
                return _topk_table(np.empty((0, 0)), ids, k, id_col)
            Vn = _normalize_rows(V)
            cell = (Vn @ self.C.T).argmax(axis=1)
            mask = np.isin(cell, self.probe)
            if not mask.any():
                return _topk_table(np.empty((0, 0)), ids[:0], k, id_col)
            ids = ids[mask]
            C = self.q @ Vn[mask].T
            return _topk_table(C, ids, k, id_col)

    partial = ds.map_batches(
        Score, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4), num_cpus=1
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)

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
    # probe set shipped as a SORTED int64 array so the per-batch membership
    # test is one np.isin against a numpy operand (no per-batch list build)
    probe_arr = np.array(sorted(probe), dtype=np.int64)
    state_ref = ray.put((qn, planes, probe_arr, q_buckets))

    class Score:
        def __init__(self):
            self.q, self.planes, self.probe, _ = ray.get(state_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, V = _ids_and_vecs(batch, id_col, vec_col)
            if len(ids) == 0:
                return _topk_table(np.empty((0, 0)), ids, k, id_col)
            b = (((V @ self.planes) > 0) * (1 << np.arange(self.planes.shape[1]))).sum(
                axis=1
            )
            mask = np.isin(b, self.probe)
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
            return _topk_table(C, ids, k, id_col)

    partial = ds.map_batches(
        Score, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4), num_cpus=1
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)

    return partial.groupby("query_idx").map_groups(final_topk, batch_format="pandas")


def knn_quantized(
    ds: rd.Dataset,
    queries: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> rd.Dataset:
    """Exact-scan top-k over int8-QUANTIZED vectors (the storage path:
    a 4×-smaller index scanned at memory-bandwidth; recall vs the
    float path measured by the ``knn_quantized_recall`` gate). Each
    batch quantizes (``stages/quantize`` semantics: symmetric scale,
    round-half-up) and scores the RECONSTRUCTION ``codes * scale`` —
    exactly what a stored int8 index would return. Same output schema
    as ``knn_brute``."""
    qn = _normalize_rows(np.asarray(queries, dtype=np.float64))
    q_ref = ray.put(qn)

    class Score:
        def __init__(self):
            self.q = ray.get(q_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, V = _ids_and_vecs(batch, id_col, vec_col)
            if len(ids) == 0:
                return _topk_table(np.empty((0, 0)), ids, k, id_col)
            amax = np.abs(V).max(axis=1)
            scale = amax / 127.0
            safe = np.where(scale > 0, scale, 1.0)
            codes = np.clip(np.floor(V / safe[:, None] + 0.5), -127, 127)
            recon = codes * scale[:, None]
            C = self.q @ _normalize_rows(recon).T
            return _topk_table(C, ids, k, id_col)

    partial = ds.map_batches(
        Score, batch_format="pyarrow", batch_size=8192, concurrency=(1, 4), num_cpus=1
    )

    def final_topk(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values(["cosine", id_col], ascending=[False, True]).head(k)

    return partial.groupby("query_idx").map_groups(final_topk, batch_format="pandas")
