"""Keyword retrieval scoring over a document corpus (SURVEY.md §2
extensions: text analysis / training-data curation).

``bm25_score`` computes Okapi BM25 for a fixed query-term set over every
document, in two streaming passes — the shape that holds at 100 TB:

- **Pass 1 (corpus stats)**: one ``map_batches`` emits ONE tiny row per
  batch (per-term document-frequency partials + token-count partials);
  a tree-reduce ``Dataset.sum`` collapses them. No shuffle of document
  payloads, no driver-side iteration — the driver sees T+2 numbers.
- **Pass 2 (score)**: the (idf vector, avgdl) state — a few floats —
  ships in the task closure; one ``map_batches`` re-tokenizes and emits
  ``(doc_id, n_terms, score)`` for documents matching ≥1 term.

Membership in the result set is integer-determined (a query term occurs
or it doesn't), so the output SET is float-noise-proof; only the score
VALUE needs rounding for cross-engine comparison (the ``doc_bm25``
oracle re-derives the whole computation in DuckDB SQL).

Tokenization is lowercased maximal ``[a-z0-9]+`` runs — chosen because
it is exactly expressible on both sides (Python ``re.findall`` here,
``regexp_split_to_array`` in the SQL oracle). Per-document regex
tokenization follows the documented-acceptable pattern of
``stages/textstats`` (the per-token inner work is vectorized numpy).
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

_TOKEN_RE = re.compile(r"[a-z0-9]+")


def corpus_term_stats(
    ds: rd.Dataset, terms: tuple[str, ...], text_col: str = "text"
) -> tuple[np.ndarray, int, int]:
    """(per-term document frequencies, total docs, total tokens) in one
    streaming pass: one partial row per batch, tree-reduced by
    ``Dataset.sum`` — the pre-aggregate-before-shuffle plan."""
    term_ix = {t: i for i, t in enumerate(terms)}
    ncols = [f"df_{i}" for i in range(len(terms))]

    def partials(batch: pa.Table) -> pa.Table:
        dfs = np.zeros(len(terms), dtype=np.int64)
        dl_sum = 0
        for text in batch[text_col].to_pylist():
            toks = _TOKEN_RE.findall((text or "").lower())
            dl_sum += len(toks)
            seen = {term_ix[t] for t in toks if t in term_ix}
            for i in seen:
                dfs[i] += 1
        cols = {c: pa.array([int(v)], pa.int64()) for c, v in zip(ncols, dfs)}
        cols["dl_sum"] = pa.array([dl_sum], pa.int64())
        cols["n_docs"] = pa.array([batch.num_rows], pa.int64())
        return pa.table(cols)

    agg = ds.map_batches(partials, batch_format="pyarrow").sum(
        on=ncols + ["dl_sum", "n_docs"]
    )
    dfs = np.array([agg[f"sum({c})"] for c in ncols], dtype=np.int64)
    return dfs, int(agg["sum(n_docs)"]), int(agg["sum(dl_sum)"])


def bm25_score(
    ds: rd.Dataset,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> rd.Dataset:
    """Okapi BM25 (idf = ln((N - df + 0.5)/(df + 0.5) + 1), always
    positive) of ``terms`` against every document; rows with ≥1 matching
    term, schema ``(doc_id, n_terms, score)``. The dataset is consumed
    twice (stats pass + scoring pass) — both streaming."""
    if not terms or len(set(terms)) != len(terms):
        raise ValueError(f"terms must be non-empty and unique, got {terms!r}")
    dfs, n_docs, dl_total = corpus_term_stats(ds, terms, text_col)
    avgdl = (dl_total / n_docs) if n_docs and dl_total else 1.0
    idf = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)
    term_ix = {t: i for i, t in enumerate(terms)}

    def score(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        tf = np.zeros((n, len(terms)), dtype=np.float64)
        dl = np.zeros(n, dtype=np.float64)
        for r, text in enumerate(batch[text_col].to_pylist()):
            toks = _TOKEN_RE.findall((text or "").lower())
            dl[r] = len(toks)
            for t in toks:
                i = term_ix.get(t)
                if i is not None:
                    tf[r, i] += 1.0
        present = tf > 0
        keep = present.any(axis=1)
        tf, dl, present = tf[keep], dl[keep], present[keep]
        denom = tf + k1 * (1.0 - b + b * dl[:, None] / avgdl)
        s = (idf * tf * (k1 + 1.0) / denom).sum(axis=1)
        ids = (
            batch[id_col]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)[keep]
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_terms": pa.array(present.sum(axis=1).astype(np.int64), pa.int64()),
                "score": pa.array(s, pa.float64()),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def corpus_top_terms(
    ds: rd.Dataset, k: int = 20, text_col: str = "text"
) -> rd.Dataset:
    """Corpus-wide top-k terms by occurrence count — the canonical
    pre-aggregate-before-shuffle plan: each batch emits one (term, n)
    partial row per DISTINCT term it saw (a Counter, so the exchange
    carries the batch's vocabulary, not its token stream), the per-term
    combine runs through ``sorted_grouped_agg``, and only the k winners
    survive the final sort-limit. Ties break by term ascending (integer
    counts → the top-k SET is float-noise-proof)."""
    from collections import Counter

    from ..functions.groupagg import grouped_count

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def partials(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for text in batch[text_col].to_pylist():
            c.update(_TOKEN_RE.findall((text or "").lower()))
        terms = sorted(c)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "n": pa.array([c[t] for t in terms], pa.int64()),
            }
        )

    counts = grouped_count(
        ds.map_batches(partials, batch_format="pyarrow"), "term", "n"
    )
    return counts.sort(["n", "term"], descending=[True, False]).limit(k)


def contamination_check(
    ds: rd.Dataset,
    blocklist: set[str] | frozenset[str],
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Benchmark-decontamination scan: ``(doc_id, n_hits)`` for documents
    sharing ≥1 word ``n``-gram with ``blocklist`` (the benchmark/eval
    corpus's n-gram set). ``n_hits`` counts DISTINCT matching grams —
    all-integer, hash-gate-safe.

    Scale shape: the blocklist (an eval set — KBs to MBs, never corpus-
    sized) broadcasts once via ``ray.put``; the corpus pass is one
    shuffle-free ``map_batches`` doing set-membership per gram. Same
    tokenizer as ``bm25_score`` so the SQL oracle mirrors it exactly.
    """
    import ray

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    bl_ref = ray.put(frozenset(blocklist))

    class Scan:
        def __init__(self):
            self.bl = ray.get(bl_ref)  # read once per worker

        def __call__(self, batch: pa.Table) -> pa.Table:
            bl = self.bl
            ids_out: list[int] = []
            hits_out: list[int] = []
            ids = batch[id_col].to_pylist()
            for doc_id, text in zip(ids, batch[text_col].to_pylist()):
                w = _TOKEN_RE.findall((text or "").lower())
                hits = {
                    g
                    for i in range(len(w) - n + 1)
                    if (g := " ".join(w[i : i + n])) in bl
                }
                if hits:
                    ids_out.append(doc_id)
                    hits_out.append(len(hits))
            return pa.table(
                {
                    id_col: pa.array(ids_out, pa.int64()),
                    "n_hits": pa.array(hits_out, pa.int64()),
                }
            )

    return ds.map_batches(
        Scan, batch_format="pyarrow", concurrency=(1, 4), num_cpus=1
    )


def word_ngrams(text: str, n: int) -> list[str]:
    """The exact gram construction ``contamination_check`` scans for —
    exposed so callers can build a blocklist from an eval corpus."""
    w = _TOKEN_RE.findall((text or "").lower())
    return [" ".join(w[i : i + n]) for i in range(len(w) - n + 1)]
