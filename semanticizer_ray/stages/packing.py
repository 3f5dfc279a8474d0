"""Token-budget shard assignment for training-data packing (SURVEY.md §2
extensions: training-data curation).

``token_shards`` assigns every document a ``shard_id`` such that shards,
read in ``doc_id`` order, each hold ~``budget`` tokens:
``shard_id = (global exclusive running token total) // budget`` — the
deterministic, order-stable definition a resumable 100 TB packing job
needs (re-running any subset of inputs reproduces the same assignment).

The global prefix sum is the textbook two-level scan, kept Ray-Data-
shaped instead of a driver loop:

1. one ``map_batches`` computes per-doc token counts and a coarse
   ``bucket = doc_id // bucket_width``;
2. per-bucket token SUMS pre-aggregate through ``sorted_grouped_agg``
   (the exchange carries one row per bucket, never per doc); the bucket
   census — ``n_docs / bucket_width`` rows, bounded by construction and
   documented as the operator's driver-size assumption — is exclusive-
   scanned on the driver (one cumsum over a tiny frame);
3. the bucket→offset table broadcasts once (``ray.put``, all-numpy,
   searchsorted lookup) and a per-bucket ``sorted_apply_exact`` adds the
   in-bucket exclusive cumsum — groups are bucket-sized, so no skew.

Token counts are whitespace tokens (``str.split``), matching
``stages/textstats.token_stats``'s ``n_tokens_ws`` and its proven SQL
mirror (trim + regexp split).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..functions.groupagg import sorted_apply_exact, sorted_grouped_agg


def token_shards(
    ds: rd.Dataset,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> rd.Dataset:
    """(doc_id, n_tokens, shard_id): shard_id = exclusive running token
    total in doc_id order, floor-divided by ``budget``. A document larger
    than ``budget`` keeps its shard alone (the formula skips shard ids,
    exactly like the SQL window mirror)."""
    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if bucket_width < 1:
        raise ValueError(f"bucket_width must be >= 1, got {bucket_width}")

    def counts(batch: pa.Table) -> pa.Table:
        ids = (
            batch[id_col]
            .combine_chunks()
            .to_numpy(zero_copy_only=False)
            .astype(np.int64, copy=False)
        )
        n_tok = np.fromiter(
            (len((t or "").split()) for t in batch[text_col].to_pylist()),
            dtype=np.int64,
            count=batch.num_rows,
        )
        return pa.table(
            {
                id_col: pa.array(ids, pa.int64()),
                "n_tokens": pa.array(n_tok, pa.int64()),
                "bucket": pa.array(ids // bucket_width, pa.int64()),
            }
        )

    per_doc = ds.map_batches(counts, batch_format="pyarrow").materialize()

    def bucket_sum(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "bucket": pd.Series(dtype="int64"),
                    "bucket_tokens": pd.Series(dtype="int64"),
                }
            )
        col = "bucket_tokens" if "bucket_tokens" in df.columns else "n_tokens"
        return (
            df.groupby("bucket", sort=False)[col]
            .sum()
            .reset_index(name="bucket_tokens")
        )

    census = (
        sorted_grouped_agg(
            per_doc.select_columns(["bucket", "n_tokens"]), "bucket", bucket_sum
        )
        .to_pandas()
        .sort_values("bucket")
        .reset_index(drop=True)
    )
    buckets = census["bucket"].to_numpy(dtype=np.int64)
    # exclusive scan over the tiny census: offset of bucket b = total
    # tokens in all buckets before it
    offsets = np.concatenate(
        ([0], np.cumsum(census["bucket_tokens"].to_numpy(dtype=np.int64))[:-1])
    )
    table_ref = ray.put((buckets, offsets))

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    id_col: pd.Series(dtype="int64"),
                    "n_tokens": pd.Series(dtype="int64"),
                    "shard_id": pd.Series(dtype="int64"),
                }
            )
        bks, offs = ray.get(table_ref)
        df = df.sort_values(["bucket", id_col], kind="stable")
        tok = df["n_tokens"].to_numpy(dtype=np.int64)
        grp = df["bucket"].to_numpy(dtype=np.int64)
        # in-bucket exclusive cumsum: global cumsum minus each group's
        # first-row global cumsum baseline
        csum = np.cumsum(tok)
        first = np.zeros(len(df), dtype=bool)
        first[0] = True
        first[1:] = grp[1:] != grp[:-1]
        base = (csum - tok)[first]
        before = (csum - tok) - np.repeat(base, np.diff(np.append(np.flatnonzero(first), len(df))))
        before += offs[np.searchsorted(bks, grp)]
        return pd.DataFrame(
            {
                id_col: df[id_col].to_numpy(dtype=np.int64),
                "n_tokens": tok,
                "shard_id": before // budget,
            }
        )

    return sorted_apply_exact(per_doc, "bucket", per_bucket)
