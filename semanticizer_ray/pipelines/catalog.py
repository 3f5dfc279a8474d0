"""Query catalog: every public operator as a (ray_fn, oracle_sql) pair.

This is the engine's general query layer (SURVEY.md T11) plus the
training-data operators, wired for the driver contract in
``__ray_entry__.py``: each entry's callable takes ``sf_dir`` and returns a
Dataset / DataFrame / Table; ``sql`` is the DuckDB oracle over the same
parquet tables (None → rows-only check for non-SQL-expressible ops).

Column-name parity rule: every computed column is named identically in the
Ray code and the SQL (the driver hashes values after sorting columns by
name). Float aggregates are rounded to 2 decimals on BOTH sides to absorb
summation-order differences.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd
from ray.data.aggregate import Count, Max, Mean, Min, Sum

from ..config import EngineConfig
from ..sources.parquet import read_table, read_transcripts


def _p(sf_dir: str, table: str) -> str:
    return os.path.join(sf_dir, f"{table}.parquet")


# Per-user scratch root for generated fixtures and oracle artifacts: a
# world-shared predictable /tmp path would let another local user pre-plant
# data (and mtime heuristics can't catch it) — scope by uid instead.
_FIXTURE_BASE = f"/tmp/semanticizer_ray_fixtures_u{os.getuid()}"


def _round_cols(df: pd.DataFrame, cols: list[str], nd: int = 2) -> pd.DataFrame:
    for c in cols:
        df[c] = df[c].astype(float).round(nd)
    return df


def _column_max_from_stats(meta, column: str):
    """Column max from Parquet row-group statistics — no data read (the
    driver must never scan a full fact-table column just for a bound).
    Returns None when any row group lacks stats for ``column``."""
    idx = {meta.schema.column(i).name: i for i in range(len(meta.schema))}
    ci = idx.get(column)
    if ci is None:
        return None
    mx = None
    for rg in range(meta.num_row_groups):
        st = meta.row_group(rg).column(ci).statistics
        if st is None or not st.has_min_max:
            return None
        mx = st.max if mx is None else max(mx, st.max)
    return mx


# ---------------------------------------------------------------- relational

def q1_pricing_summary(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q1-style pricing summary (filter → grouped agg, pre-aggregated
    per batch by Ray's hash aggregate)."""
    ds = read_table(
        _p(sf_dir, "lineitem"),
        columns=[
            "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
            "l_discount", "l_shipdate",
        ],
    )

    def prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-02"))))
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "l_quantity": t["l_quantity"],
                "l_extendedprice": t["l_extendedprice"],
                "disc_price": disc,
                "l_discount": t["l_discount"],
            }
        )

    out = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("l_quantity", alias_name="sum_qty"),
            Sum("l_extendedprice", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Mean("l_quantity", alias_name="avg_qty"),
            Mean("l_discount", alias_name="avg_disc"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
        .sort_values(["l_returnflag", "l_linestatus"])
        .reset_index(drop=True)
    )
    return _round_cols(out, ["sum_qty", "sum_base_price", "sum_disc_price", "avg_qty", "avg_disc"])


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                              AS sum_qty,
       round(sum(l_extendedprice), 2)                         AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)      AS sum_disc_price,
       round(avg(l_quantity), 2)                              AS avg_qty,
       round(avg(l_discount), 2)                              AS avg_disc,
       count(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q6_revenue(sf_dir: str) -> pd.DataFrame:
    ds = read_table(
        _p(sf_dir, "lineitem"),
        columns=["l_extendedprice", "l_discount", "l_quantity", "l_shipdate"],
    )

    def prep(t: pa.Table) -> pa.Table:
        m = pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-01-01"))),
            ),
            pc.and_(
                pc.and_(
                    pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                    pc.less_equal(t["l_discount"], pa.scalar(0.07)),
                ),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        t = t.filter(m)
        return pa.table({"rev": pc.multiply(t["l_extendedprice"], t["l_discount"])})

    total = ds.map_batches(prep, batch_format="pyarrow").sum("rev")
    return pd.DataFrame({"revenue": [round(float(total or 0.0), 2)]})


Q6_SQL = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
"""


def top_revenue_orders(sf_dir: str) -> pd.DataFrame:
    """Grouped agg → global top-k (sort-limit)."""
    ds = read_table(_p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev": pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])),
            }
        )

    # Ray's hash aggregate over Arrow blocks is efficient here (measured
    # 6.9 s vs 8-9 s for a sorted_grouped_agg + per-block-top-k rewrite at
    # sf0.1: the rewrite pays its own sort + boundary pass, while the
    # 150k-row aggregate sorts cheaply)
    agg = (
        ds.map_batches(prep, batch_format="pyarrow")
        .groupby("l_orderkey")
        .aggregate(Sum("rev", alias_name="revenue"))
    )
    top = agg.sort("revenue", descending=True).limit(10).to_pandas()
    top = top.sort_values(["revenue", "l_orderkey"], ascending=[False, True]).reset_index(drop=True)
    return _round_cols(top, ["revenue"])


TOP_REVENUE_SQL = """
SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem GROUP BY l_orderkey ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, l_orderkey LIMIT 10
"""


def orders_by_nation(sf_dir: str) -> pd.DataFrame:
    """orders ⋈ customer ⋈ nation → count per nation, every hop through the
    gated ``join`` operator (same pattern as ``revenue_by_nation``): nation
    is a true dimension (broadcast plan), but customer is fact-proportional
    in TPC-H, so the orders ⋈ customer hop flips to the distributed
    sort-merge plan automatically past the row gate — no driver collect of
    customer at any scale (r2 verdict fix)."""
    from ..functions.groupagg import grouped_count
    from ..functions.joins import join

    nation = read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust = read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).rename_columns({"c_nationkey": "n_nationkey", "c_custkey": "o_custkey"})
    cust_n = join(cust, nation, on="n_nationkey").select_columns(["o_custkey", "n_name"])

    orders = read_table(_p(sf_dir, "orders"), columns=["o_custkey"])
    joined = join(orders, cust_n, on="o_custkey").select_columns(["n_name"])
    out = (
        grouped_count(joined, "n_name", out_col="n_orders", driver_gate=100_000)
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return out


ORDERS_BY_NATION_SQL = """
SELECT n_name, count(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def revenue_by_nation(sf_dir: str) -> pd.DataFrame:
    """TPC-H Q5-flavored: lineitem ⋈ orders ⋈ customer ⋈ nation revenue.

    Every hop routes through the general ``join`` operator
    (``functions/joins.py``): the dimension hops (nation, customer) take its
    broadcast plan, and the fact hop (lineitem ⋈ orders) flips to the
    distributed sort-merge plan automatically once orders exceeds the row
    gate — no driver-collected fact table at any scale."""
    from ..functions.joins import join

    nation = read_table(_p(sf_dir, "nation"), columns=["n_nationkey", "n_name"])
    cust = read_table(
        _p(sf_dir, "customer"), columns=["c_custkey", "c_nationkey"]
    ).rename_columns({"c_nationkey": "n_nationkey", "c_custkey": "o_custkey"})
    cust_n = join(cust, nation, on="n_nationkey").select_columns(["o_custkey", "n_name"])

    orders = read_table(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"]
    ).rename_columns({"o_orderkey": "l_orderkey"})
    orders_n = join(orders, cust_n, on="o_custkey").select_columns(
        ["l_orderkey", "n_name"]
    )

    li = read_table(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
                ),
            }
        ),
        batch_format="pyarrow",
    )
    # NOT groupby().aggregate(): over the join's pandas blocks Ray's hash
    # aggregate was measured at ~15 s for 600k rows; one vectorized
    # per-batch partial + count-gated combine is ~5× faster (25 groups)
    from ..functions.groupagg import sorted_grouped_agg

    def rev_combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {"n_name": pd.Series(dtype="str"), "revenue": pd.Series(dtype="float64")}
            )
        col = "revenue" if "revenue" in df.columns else "rev"
        g = df.groupby("n_name", sort=False)[col].sum().reset_index()
        return g.rename(columns={col: "revenue"})

    out = (
        sorted_grouped_agg(
            join(li, orders_n, on="l_orderkey"), "n_name", rev_combine,
            driver_gate=100_000,
        )
        .to_pandas()
        .sort_values("n_name")
        .reset_index(drop=True)
    )
    return _round_cols(out, ["revenue"])


REVENUE_BY_NATION_SQL = """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
"""


def order_priority_revenue(sf_dir: str) -> pd.DataFrame:
    """Large × large fact join on the distributed SORT-MERGE plan, forced
    (``broadcast_gate=0``) so the driver gate verifies the scale plan
    against the SQL oracle — no broadcast, no driver materialization of
    either side."""
    from ..functions.joins import join

    orders = read_table(
        _p(sf_dir, "orders"), columns=["o_orderkey", "o_orderpriority"]
    ).rename_columns({"o_orderkey": "l_orderkey"})
    li = read_table(
        _p(sf_dir, "lineitem"), columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda t: pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "rev": pc.multiply(
                    t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"])
                ),
            }
        ),
        batch_format="pyarrow",
    )
    from ..functions.groupagg import sorted_grouped_agg

    def pri_combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "o_orderpriority": pd.Series(dtype="str"),
                    "revenue": pd.Series(dtype="float64"),
                    "n_items": pd.Series(dtype="int64"),
                }
            )
        if "revenue" in df.columns:  # partial rows: re-sum
            return (
                df.groupby("o_orderpriority", sort=False)
                .agg(revenue=("revenue", "sum"), n_items=("n_items", "sum"))
                .reset_index()
            )
        return (
            df.groupby("o_orderpriority", sort=False)
            .agg(revenue=("rev", "sum"), n_items=("rev", "size"))
            .reset_index()
        )

    out = (
        sorted_grouped_agg(
            join(li, orders, on="l_orderkey", broadcast_gate=0),
            "o_orderpriority",
            pri_combine,
            driver_gate=100_000,
        )
        .to_pandas()
        .sort_values("o_orderpriority")
        .reset_index(drop=True)
    )
    return _round_cols(out, ["revenue"])


ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def events_sample(sf_dir: str) -> pd.DataFrame:
    """O3 sampling: deterministic ~5% systematic sample via a multiplicative
    hash of the row key — reproducible across runs/engines (unlike
    ``random_sample``) so it carries a full SQL oracle."""
    ds = read_table(_p(sf_dir, "events"), columns=["event_id", "user_id", "value"])

    def pick(t: pa.Table) -> pa.Table:
        h = pc.bit_wise_and(pc.multiply_checked(
            pc.cast(t["event_id"], pa.int64()), pa.scalar(2654435761, pa.int64())
        ), pa.scalar((1 << 32) - 1, pa.int64()))
        # h % 100 (pyarrow 16 has no mod kernel; h is non-negative)
        m = pc.subtract(h, pc.multiply(pc.divide(h, pa.scalar(100, pa.int64())),
                                       pa.scalar(100, pa.int64())))
        return t.filter(pc.less(m, pa.scalar(5, pa.int64())))

    out = ds.map_batches(pick, batch_format="pyarrow").to_pandas()
    return _round_cols(
        out.sort_values("event_id").reset_index(drop=True), ["value"]
    )


EVENTS_SAMPLE_SQL = """
SELECT event_id, user_id, round(value, 2) AS value
FROM events
WHERE ((event_id * 2654435761) & 4294967295) % 100 < 5
ORDER BY event_id
"""


def events_per_type(sf_dir: str) -> pd.DataFrame:
    ds = read_table(_p(sf_dir, "events"), columns=["event_type", "value"])
    out = (
        ds.groupby("event_type")
        .aggregate(
            Count(alias_name="n"),
            Sum("value", alias_name="sum_value"),
            Min("value", alias_name="min_value"),
            Max("value", alias_name="max_value"),
        )
        .to_pandas()
        .sort_values("event_type")
        .reset_index(drop=True)
    )
    return _round_cols(out, ["sum_value", "min_value", "max_value"])


EVENTS_PER_TYPE_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value,
       round(min(value), 2) AS min_value, round(max(value), 2) AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def events_hourly(sf_dir: str) -> pd.DataFrame:
    """Event-time tumbling window as GROUP BY hour bucket (streaming-shaped
    workload per ray_guide: ordered log → keyed window aggregation)."""
    ds = read_table(_p(sf_dir, "events"), columns=["ts", "event_type"])

    def bucket(t: pa.Table) -> pa.Table:
        # cast to us precision: floor_temporal keeps the source unit (s)
        # while DuckDB's date_trunc returns timestamp[us]
        hour = pc.floor_temporal(t["ts"], unit="hour").cast(pa.timestamp("us"))
        return pa.table({"hour": hour, "event_type": t["event_type"]})

    out = (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby(["hour", "event_type"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["hour", "event_type"])
        .reset_index(drop=True)
    )
    # us precision to match DuckDB's date_trunc (the groupby's pandas
    # round-trip lands on the source's s-precision otherwise)
    out["hour"] = out["hour"].astype("datetime64[us]")
    return out


EVENTS_HOURLY_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n
FROM events GROUP BY 1, 2 ORDER BY 1, 2
"""


def distinct_event_users(sf_dir: str) -> pd.DataFrame:
    ds = read_table(_p(sf_dir, "events"), columns=["user_id"])
    n = ds.unique("user_id")
    return pd.DataFrame({"n_users": [len(n)]})


DISTINCT_USERS_SQL = "SELECT count(DISTINCT user_id) AS n_users FROM events"


def filter_high_quantity(sf_dir: str) -> pd.DataFrame:
    """Spec-driven filter (reference FilterProcessor semantics, M6): the
    spec string compiles once to a pyarrow.compute expression."""
    from ..stages.filters import filter_dataset

    ds = read_table(
        _p(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_shipdate"],
    )
    out = filter_dataset(ds, "l_quantity > 49").to_pandas()
    return out.sort_values(["l_orderkey", "l_linenumber"]).reset_index(drop=True)


FILTER_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate
FROM lineitem WHERE l_quantity > 49 ORDER BY l_orderkey, l_linenumber
"""


# ------------------------------------------------------------ text / dedup

def docs_by_lang(sf_dir: str) -> pd.DataFrame:
    ds = read_table(_p(sf_dir, "documents"), columns=["lang", "n_chars"])
    out = (
        ds.groupby("lang")
        .aggregate(Count(alias_name="n_docs"), Sum("n_chars", alias_name="sum_chars"),
                   Mean("n_chars", alias_name="avg_chars"))
        .to_pandas()
        .sort_values("lang")
        .reset_index(drop=True)
    )
    return _round_cols(out, ["avg_chars"])


DOCS_BY_LANG_SQL = """
SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       round(avg(n_chars), 2) AS avg_chars
FROM documents GROUP BY lang ORDER BY lang
"""


def doc_token_counts(sf_dir: str) -> pd.DataFrame:
    """Whitespace token counting (T-text analysis) with SQL parity."""
    from ..stages.textstats import token_stats

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = token_stats(ds).to_pandas()[["doc_id", "n_tokens_ws"]]
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_TOKENS_SQL = """
SELECT doc_id,
       CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens_ws
FROM documents ORDER BY doc_id
"""


_BM25_TERMS = ("vector", "join", "stream", "spark")


def doc_bm25(sf_dir: str) -> pd.DataFrame:
    """Okapi BM25 keyword scoring of a fixed query-term set over the
    documents table (two streaming passes: tree-reduced corpus stats,
    then broadcast-state scoring; stages/retrieval.py). Result-set
    membership is integer-determined (term present or not); only the
    score value is rounded for the hash gate."""
    from ..stages.retrieval import bm25_score

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = bm25_score(ds, _BM25_TERMS).to_pandas()
    out["score"] = out["score"].round(6)
    return out.sort_values("doc_id").reset_index(drop=True)


_BM25_VALUES = ", ".join(f"('{t}')" for t in _BM25_TERMS)
DOC_BM25_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
  FROM documents
),
toks_f AS (SELECT doc_id, tok FROM toks WHERE tok <> ''),
dl AS (
  SELECT d.doc_id, count(t.tok) AS dl
  FROM documents d LEFT JOIN toks_f t USING (doc_id) GROUP BY d.doc_id
),
stats AS (SELECT count(*) AS n_docs, sum(dl) AS dl_total FROM dl),
q(term) AS (VALUES {_BM25_VALUES}),
tf AS (
  SELECT doc_id, tok AS term, count(*) AS tf
  FROM toks_f JOIN q ON toks_f.tok = q.term GROUP BY doc_id, tok
),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)
SELECT CAST(tf.doc_id AS BIGINT) AS doc_id,
       CAST(count(*) AS BIGINT) AS n_terms,
       round(sum(
         ln((stats.n_docs - df.df + 0.5) / (df.df + 0.5) + 1)
         * tf.tf * 2.2
         / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl
                           / (CAST(stats.dl_total AS DOUBLE) / stats.n_docs)))
       ), 6) AS score
FROM tf
JOIN df USING (term)
JOIN dl ON tf.doc_id = dl.doc_id
CROSS JOIN stats
GROUP BY tf.doc_id
ORDER BY tf.doc_id
"""


def corpus_top_terms_q(sf_dir: str) -> pd.DataFrame:
    """Corpus-wide top-20 terms (pre-aggregated word count; integer
    counts + term tie-break → deterministic top-k set)."""
    from ..stages.retrieval import corpus_top_terms

    ds = read_table(_p(sf_dir, "documents"), columns=["text"])
    out = corpus_top_terms(ds, k=20).to_pandas()
    return out.sort_values(["n", "term"], ascending=[False, True]).reset_index(
        drop=True
    )


CORPUS_TOP_TERMS_SQL = """
WITH toks AS (
  SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
  FROM documents
)
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM toks WHERE term <> ''
GROUP BY term ORDER BY n DESC, term LIMIT 20
"""


_SHARD_BUDGET = 500


def doc_token_shards(sf_dir: str) -> pd.DataFrame:
    """Token-budget shard assignment (two-level distributed prefix sum;
    stages/packing.py). shard_id = exclusive running whitespace-token
    total in doc_id order // budget — all-integer, hash-gate-safe."""
    from ..stages.packing import token_shards

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = token_shards(ds, budget=_SHARD_BUDGET, bucket_width=64).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_TOKEN_SHARDS_SQL = f"""
WITH c AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens
  FROM documents
),
w AS (
  SELECT doc_id, n_tokens,
         coalesce(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM c
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(before // {_SHARD_BUDGET} AS BIGINT) AS shard_id
FROM w ORDER BY doc_id
"""


_STRAT_RATES = {"en": 0.25, "zh": 0.5, "es": 1.0, "de": 0.75}  # fr → default 0.1
_STRAT_DEFAULT = 0.1


def docs_stratified_sample(sf_dir: str) -> pd.DataFrame:
    """Per-language deterministic downsampling (training-data
    rebalancing): keep iff (doc_id * KNUTH) mod 2^32 < rate(lang) * 2^32.
    All-integer membership — hash-gate-safe by construction."""
    from ..stages.filters import stratified_sample

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "lang"])
    out = stratified_sample(
        ds, _STRAT_RATES, default_rate=_STRAT_DEFAULT
    ).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


_STRAT_VALUES = ", ".join(
    f"('{g}', {int(r * (1 << 32))})" for g, r in _STRAT_RATES.items()
)
DOCS_STRATIFIED_SQL = f"""
WITH r(lang, thr) AS (VALUES {_STRAT_VALUES})
SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang
FROM documents d LEFT JOIN r USING (lang)
WHERE (CAST(d.doc_id AS HUGEINT) * 2654435761) % 4294967296
      < coalesce(r.thr, {int(_STRAT_DEFAULT * (1 << 32))})
ORDER BY d.doc_id
"""


_CONTAM_N = 4
_CONTAM_BENCH_IDS = 5  # docs 0..4 stand in for the eval/benchmark corpus


def docs_contamination(sf_dir: str) -> pd.DataFrame:
    """Benchmark decontamination: documents sharing ≥1 word 4-gram with
    the (stand-in) benchmark corpus — docs 0..4 of the same table, so the
    check is fully deterministic with no external data. The blocklist is
    the small broadcast side; the corpus pass is shuffle-free
    (stages/retrieval.py :: contamination_check)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..stages.retrieval import contamination_check, word_ngrams

    bench = pq.read_table(
        _p(sf_dir, "documents"),
        columns=["text"],
        filters=[("doc_id", "<", _CONTAM_BENCH_IDS)],
    )
    blocklist: set[str] = set()
    for t in bench["text"].to_pylist():
        blocklist.update(word_ngrams(t, _CONTAM_N))
    ds = read_table(
        _p(sf_dir, "documents"),
        columns=["doc_id", "text"],
        filter=pc.field("doc_id") >= _CONTAM_BENCH_IDS,
    )
    out = contamination_check(ds, blocklist, n=_CONTAM_N).to_pandas()
    if len(out) == 0:  # empty Ray datasets lose their schema on to_pandas
        out = pd.DataFrame(
            {
                "doc_id": pd.Series(dtype="int64"),
                "n_hits": pd.Series(dtype="int64"),
            }
        )
    return out.sort_values("doc_id").reset_index(drop=True)


DOCS_CONTAMINATION_SQL = f"""
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w,
         unnest(range(1, greatest(len(w) - {_CONTAM_N - 2}, 1))) AS i
  FROM words
),
grams AS (
  SELECT doc_id, array_to_string(w[i : i + {_CONTAM_N - 1}], ' ') AS gram
  FROM pos
),
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < {_CONTAM_BENCH_IDS})
SELECT CAST(g.doc_id AS BIGINT) AS doc_id,
       CAST(count(DISTINCT g.gram) AS BIGINT) AS n_hits
FROM grams g JOIN bench USING (gram)
WHERE g.doc_id >= {_CONTAM_BENCH_IDS}
GROUP BY g.doc_id
ORDER BY g.doc_id
"""


def docs_length_quantiles(sf_dir: str) -> pd.DataFrame:
    """Exact per-language discrete length quantiles via the value-
    histogram plan (functions/groupagg.py :: grouped_quantiles_disc) —
    corpus length statistics, all-integer output."""
    from ..functions.groupagg import grouped_quantiles_disc

    ds = read_table(_p(sf_dir, "documents"), columns=["lang", "n_chars"])
    out = grouped_quantiles_disc(ds, "lang", "n_chars").to_pandas()
    return out.sort_values("lang").reset_index(drop=True)


DOCS_LENGTH_QUANTILES_SQL = """
SELECT lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(quantile_disc(n_chars, 0.25) AS BIGINT) AS q25,
       CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS q50,
       CAST(quantile_disc(n_chars, 0.9) AS BIGINT) AS q90
FROM documents GROUP BY lang ORDER BY lang
"""


def embedding_quantized(sf_dir: str) -> pd.DataFrame:
    """Symmetric int8 quantization summary per embedding (stages/
    quantize.py): scale + integer code stats; the codes themselves are
    covered by the integer summaries (bit-identical by construction —
    see the module's determinism note)."""
    from ..stages.quantize import quantize_embeddings

    ds = read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = quantize_embeddings(ds).to_pandas()
    out = out[["vec_id", "scale", "code_sum", "code_min", "code_max"]]
    out["scale"] = out["scale"].round(9)
    return out.sort_values("vec_id").reset_index(drop=True)


EMBEDDING_QUANTIZED_SQL = """
WITH s AS (
  -- widen float32 storage to DOUBLE first (exact), matching the
  -- engine's float64 ingest, so every elementwise op is bit-identical
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           / 127.0 AS scale
  FROM embeddings
),
c AS (
  SELECT vec_id, scale,
         list_transform(emb, x -> CAST(
           CASE WHEN scale = 0 THEN 0
                ELSE greatest(least(floor(x / scale + 0.5), 127), -127) END
           AS BIGINT)) AS codes
  FROM s
)
SELECT CAST(vec_id AS BIGINT) AS vec_id,
       round(scale, 9) AS scale,
       CAST(list_sum(codes) AS BIGINT) AS code_sum,
       CAST(list_min(codes) AS BIGINT) AS code_min,
       CAST(list_max(codes) AS BIGINT) AS code_max
FROM c ORDER BY vec_id
"""


def doc_repetition(sf_dir: str) -> pd.DataFrame:
    """Within-doc duplicate 2-gram fraction (Gopher/C4-style repetition
    quality rule; stages/textstats.py :: repetition_stats)."""
    from ..stages.textstats import repetition_stats

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = repetition_stats(ds, n=2).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


DOC_REPETITION_SQL = """
WITH words AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS w
  FROM documents
),
pos AS (
  SELECT doc_id, w, unnest(range(1, greatest(len(w), 1))) AS i FROM words
),
g AS (
  SELECT doc_id, array_to_string(w[i : i + 1], ' ') AS gram, count(*) AS c
  FROM pos GROUP BY doc_id, gram
),
a AS (
  SELECT doc_id, sum(c) AS n_grams, count(*) AS n_distinct,
         max(c) AS max_gram_count
  FROM g GROUP BY doc_id
)
SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
       CAST(coalesce(a.n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(a.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(coalesce(a.max_gram_count, 0) AS BIGINT) AS max_gram_count,
       round(CASE WHEN coalesce(a.n_grams, 0) > 0
                  THEN 1.0 - a.n_distinct / CAST(a.n_grams AS DOUBLE)
                  ELSE 0.0 END, 6) AS dup_frac
FROM documents d LEFT JOIN a USING (doc_id)
ORDER BY d.doc_id
"""


def doc_pii_stats(sf_dir: str) -> pd.DataFrame:
    """PII triage counts per document (stages/filters.py :: pii_stats) —
    email / URL / phone regex hits; patterns chosen for exact Python-re ↔
    RE2 behavioral parity."""
    from ..stages.filters import pii_stats

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = pii_stats(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def _pii_sql() -> str:
    from ..stages.filters import PII_EMAIL, PII_PHONE, PII_URL

    return f"""
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(len(regexp_extract_all(text, '{PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{PII_URL}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(text, '{PII_PHONE}')) AS BIGINT) AS n_phones
FROM documents ORDER BY doc_id
"""


DOC_PII_SQL = _pii_sql()


def exact_dedup_docs(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import exact_dedup

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = exact_dedup(ds).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


EXACT_DEDUP_SQL = """
SELECT min(doc_id) AS doc_id, text FROM documents GROUP BY text ORDER BY min(doc_id)
"""


def knn_cosine(sf_dir: str) -> pd.DataFrame:
    """Brute-force cosine top-10 for 3 fixed query vectors (vec_id 0,1,2)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_brute

    # predicate pushdown: only the 3 query rows leave storage (reading the
    # whole embeddings table on the driver for 3 vectors is wrong at scale)
    q = (
        pq.read_table(
            _p(sf_dir, "embeddings"), filters=[("vec_id", "in", [0, 1, 2])]
        )
        .to_pandas()
        .sort_values("vec_id")["embedding"]
    )
    queries = np.asarray([np.asarray(v, dtype=np.float64) for v in q])
    ds = read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_brute(ds, queries, k=10).to_pandas()
    # float32 to match the oracle: list_cosine_similarity on a FLOAT[]
    # column returns FLOAT; the 1e-4 quantization grid is exactly
    # representable well inside float32 precision
    out["cosine"] = out["cosine"].round(4).astype(np.float32)
    return out[["query_idx", "vec_id", "cosine"]].sort_values(
        ["query_idx", "cosine", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


KNN_SQL = """
WITH q AS (
  SELECT vec_id AS query_idx, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
), scored AS (
  SELECT q.query_idx, e.vec_id,
         round(list_cosine_similarity(q.qv, e.embedding), 4) AS cosine,
         row_number() OVER (
           PARTITION BY q.query_idx
           ORDER BY list_cosine_similarity(q.qv, e.embedding) DESC, e.vec_id
         ) AS rn
  FROM q CROSS JOIN embeddings e
)
SELECT CAST(query_idx AS INTEGER) AS query_idx, vec_id, cosine
FROM scored WHERE rn <= 10 ORDER BY query_idx, cosine DESC, vec_id
"""


def components_supplier_part(sf_dir: str) -> pd.DataFrame:
    """T9 on a real graph: connected components of the supplier–part
    bipartite graph from lineitem, vs a DuckDB recursive-CTE oracle."""
    from ..stages.clustering import cluster_edges

    ds = read_table(_p(sf_dir, "lineitem"), columns=["l_suppkey", "l_partkey"])

    def to_edges(t: pa.Table) -> pa.Table:
        # vectorized relabel: 's'/'p' prefix + zero-pad, no per-row Python
        def tag(prefix: str, col) -> pa.Array:
            padded = pc.utf8_lpad(pc.cast(col, pa.string()), 8, "0")
            return pc.binary_join_element_wise(prefix, padded, "")

        return pa.table(
            {
                "conv_a": tag("s", t["l_suppkey"]),
                "conv_b": tag("p", t["l_partkey"]),
            }
        )

    edges = ds.map_batches(to_edges, batch_format="pyarrow")
    out = cluster_edges(edges, None, EngineConfig()).to_pandas()
    out = out.rename(columns={"conv_id": "node", "cluster_id": "component"})
    return out.sort_values("node").reset_index(drop=True)


COMPONENTS_SQL = """
WITH RECURSIVE
edges AS (
  SELECT DISTINCT 's' || lpad(CAST(l_suppkey AS VARCHAR), 8, '0') AS a,
                  'p' || lpad(CAST(l_partkey AS VARCHAR), 8, '0') AS b
  FROM lineitem
),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
nodes AS (SELECT DISTINCT a AS node FROM sym),
walk(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT s.a, w.label FROM sym s JOIN walk w ON s.b = w.node
  WHERE w.label < s.a
)
SELECT node, min(label) AS component FROM walk GROUP BY node ORDER BY node
"""




def events_sessionized(sf_dir: str) -> pd.DataFrame:
    """Streaming-shaped: per-user sessionization with a 30-min gap
    (ordered-log window pattern; exact SQL window oracle)."""
    from .streaming import sessionize

    ds = read_table(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    out = sessionize(ds).to_pandas()
    return out[["event_id", "user_id", "session_id"]].sort_values(
        "event_id"
    ).reset_index(drop=True)


EVENTS_SESSION_SQL = """
WITH lagged AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
)
SELECT event_id, user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
                     THEN 1 ELSE 0 END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM lagged ORDER BY event_id
"""


def events_running_totals(sf_dir: str) -> pd.DataFrame:
    """Per-user running sum / row number (window aggregate)."""
    from .streaming import running_totals

    ds = read_table(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"])
    out = running_totals(ds).to_pandas()
    out = out[["event_id", "user_id", "running_value", "row_num"]]
    return _round_cols(
        out.sort_values("event_id").reset_index(drop=True), ["running_value"]
    )


EVENTS_RUNNING_SQL = """
SELECT event_id, user_id,
       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING), 2) AS running_value,
       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS row_num
FROM events ORDER BY event_id
"""


def events_asof_orders(sf_dir: str) -> pd.DataFrame:
    """Backward as-of join: each event picks the latest order (by
    o_orderdate, tie-broken by o_orderkey) of custkey == user_id at or
    before the event timestamp."""
    import pyarrow.parquet as pq

    from .streaming import asof_latest_order, asof_latest_order_distributed

    meta = pq.read_metadata(_p(sf_dir, "orders"))
    n_orders = meta.num_rows
    n_keys = _column_max_from_stats(meta, "o_custkey")
    if n_keys is None:  # stats missing: fall back to a one-column scan
        n_keys = int(
            pq.read_table(_p(sf_dir, "orders"), columns=["o_custkey"])["o_custkey"]
            .combine_chunks()
            .to_numpy()
            .max()
        )
    n_keys = int(n_keys) + 1
    ds = read_table(_p(sf_dir, "events"), columns=["event_id", "user_id", "ts"])
    # count gate: small orders side broadcasts; past the gate the bucketed
    # scatter/gather as-of runs (sf0.01 exceeds it → the driver oracle
    # verifies the DISTRIBUTED plan)
    if n_orders <= 10_000:
        orders = pq.read_table(
            _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
        ).to_pandas()
        out = asof_latest_order(ds, orders, n_keys).to_pandas()
    else:
        orders_ds = read_table(
            _p(sf_dir, "orders"), columns=["o_orderkey", "o_custkey", "o_orderdate"]
        )
        out = asof_latest_order_distributed(ds, orders_ds, n_keys).to_pandas()
    return out[["event_id", "user_id", "o_orderkey"]].sort_values(
        "event_id"
    ).reset_index(drop=True)


EVENTS_ASOF_SQL = """
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e
LEFT JOIN LATERAL (
  SELECT o_orderkey FROM orders
  WHERE o_custkey = e.user_id % ((SELECT max(o_custkey) + 1 FROM orders))
    AND o_orderdate <= e.ts
  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1
) o ON true
ORDER BY e.event_id
"""


def customers_without_orders(sf_dir: str) -> pd.DataFrame:
    """Anti join (SURVEY.md J6) through the gated ``join`` operator: the
    orders key set broadcasts below the row gate and takes the distributed
    sort-merge anti plan above it — no driver-side Python key set, no
    per-row membership loop (r2 verdict fix)."""
    from ..functions.joins import join

    orders_keys = read_table(_p(sf_dir, "orders"), columns=["o_custkey"]).rename_columns(
        {"o_custkey": "c_custkey"}
    )
    cust = read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"])
    out = join(cust, orders_keys, on="c_custkey", how="anti").to_pandas()
    if out.empty:  # empty Dataset.to_pandas loses schema
        out = pd.DataFrame(
            {"c_custkey": pd.Series(dtype="int64"), "c_name": pd.Series(dtype="str")}
        )
    return out.sort_values("c_custkey").reset_index(drop=True)


ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
ORDER BY c_custkey
"""


def orders_customer_outer(sf_dir: str) -> pd.DataFrame:
    """FULL OUTER join through the general ``join`` operator (J2): even-key
    customers FULL OUTER per-customer order counts over div-3 keys, so both
    sides contribute unmatched rows (probe-only, build-only, and matched).
    Always the sort-merge plan (unmatched-build emission needs complete key
    groups); int columns stay int64-with-nulls via the schema restore."""
    from ..functions.groupagg import grouped_count
    from ..functions.joins import join

    def _mod_eq0(col, m: int):
        # col % m == 0 (pyarrow 16 has no mod kernel; col is non-negative)
        q = pc.divide(col, pa.scalar(m, pa.int64()))
        return pc.equal(col, pc.multiply(q, pa.scalar(m, pa.int64())))

    cust = read_table(_p(sf_dir, "customer"), columns=["c_custkey", "c_name"]).map_batches(
        lambda t: t.filter(_mod_eq0(t["c_custkey"], 2)), batch_format="pyarrow"
    )
    orders = read_table(_p(sf_dir, "orders"), columns=["o_custkey"]).map_batches(
        lambda t: pa.table(
            {"c_custkey": t["o_custkey"].filter(_mod_eq0(t["o_custkey"], 3))}
        ),
        batch_format="pyarrow",
    )
    counts = grouped_count(orders, "c_custkey", out_col="n_orders", driver_gate=100_000)
    out = join(cust, counts, on="c_custkey", how="full").to_pandas()
    return out[["c_custkey", "c_name", "n_orders"]].sort_values(
        "c_custkey"
    ).reset_index(drop=True)


ORDERS_CUSTOMER_OUTER_SQL = """
SELECT c_custkey, c_name, n_orders
FROM (SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0) c
FULL JOIN (SELECT o_custkey AS c_custkey, count(*) AS n_orders
           FROM orders WHERE o_custkey % 3 = 0 GROUP BY 1) o
USING (c_custkey)
ORDER BY c_custkey
"""


def distinct_part_suppliers(sf_dir: str) -> pd.DataFrame:
    """Multi-column distinct via vectorized grouped agg (A5)."""
    from ..functions.groupagg import sorted_grouped_agg

    ds = read_table(_p(sf_dir, "lineitem"), columns=["l_partkey", "l_suppkey"])

    def dedup(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["l_partkey", "l_suppkey"])

    out = sorted_grouped_agg(ds, ["l_partkey", "l_suppkey"], dedup).to_pandas()
    return out.sort_values(["l_partkey", "l_suppkey"]).reset_index(drop=True)


DISTINCT_PS_SQL = """
SELECT DISTINCT l_partkey, l_suppkey FROM lineitem ORDER BY l_partkey, l_suppkey
"""


# ------------------------------------------------- rows-only (non-SQL ops)

def _er_fixture_dir(sf_dir: str) -> str:
    sf = os.path.basename(os.path.normpath(sf_dir))
    # bench tier is sized so per-record compute dominates Ray's fixed
    # per-execution coordination cost (scaling-efficiency criterion);
    # GRAFT_FIXTURE_NCONVS overrides for the 100k-tier scaling measurement
    n = int(os.environ.get("GRAFT_FIXTURE_NCONVS", "0")) or {
        "sf0.001": 200,
        "sf0.01": 1000,
        "sf0.1": 50000,
    }.get(sf, 200)
    out = f"{_FIXTURE_BASE}/{sf}_n{n}"
    marker = os.path.join(out, "transcripts.parquet")
    if not os.path.exists(marker):
        from ..gen import write_fixture_set

        write_fixture_set(out, n_convs=n, seed=42)
    return out


def _anchor_dict_table(fx: str, cfg: EngineConfig) -> pa.Table | None:
    """Anchor dictionary for a fixture dir — built ONCE and cached as a
    Parquet artifact (the dict build is the offline artifact job, reference
    S1/S2: Wikipedia-Miner dump → versioned store; not part of the
    per-run pipeline)."""
    corp = os.path.join(fx, "link_corpus.parquet")
    if not os.path.exists(corp):
        return None
    import pyarrow.parquet as pq

    from ..state.anchor_dict import build_anchor_dict

    cache = os.path.join(fx, f"anchor_dict_{cfg.config_hash()}.parquet")
    if os.path.exists(cache):
        return pq.read_table(cache)
    table = pa.Table.from_pandas(
        build_anchor_dict(rd.read_parquet(corp), cfg).to_pandas()
    )
    tmp = cache + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, cache)
    return table


def _relatedness_state(fx: str, cfg: EngineConfig, dict_table):
    """F3 sense co-occurrence artifact for a fixture dir — built ONCE from
    the link corpus and cached as Parquet beside the anchor dictionary
    (same offline-artifact pattern, SURVEY.md F3/A1)."""
    corp = os.path.join(fx, "link_corpus.parquet")
    if dict_table is None or not os.path.exists(corp):
        return None
    import pyarrow.parquet as pq

    from ..state.relatedness import RelatednessState, build_relatedness

    cache = os.path.join(fx, f"relatedness_{cfg.config_hash()}.parquet")
    if os.path.exists(cache):
        return RelatednessState.from_tables(dict_table, pq.read_table(cache))
    rel = build_relatedness(rd.read_parquet(corp), cfg)
    tmp = cache + ".tmp"
    pq.write_table(pa.Table.from_pandas(rel, preserve_index=False), tmp)
    os.replace(tmp, cache)
    return RelatednessState.from_tables(dict_table, rel)


def er_clusters(sf_dir: str) -> pd.DataFrame:
    """Flagship: full three-stage entity resolution on synthetic transcripts
    sized to the sf tier (rows-only check: non-SQL-expressible)."""
    from .entity_resolution import resolve_entities

    fx = _er_fixture_dir(sf_dir)
    cfg = EngineConfig()
    dict_table = _anchor_dict_table(fx, cfg)
    rel_state = _relatedness_state(fx, cfg, dict_table)
    transcripts = read_transcripts(os.path.join(fx, "transcripts.parquet"))
    res = resolve_entities(
        transcripts, cfg, anchor_dict_source=dict_table, relatedness=rel_state
    )
    return res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)


def er_clusters_scatter(sf_dir: str) -> pd.DataFrame:
    """Flagship ER with ``side_broadcast_gate=0``: the conv-keyed
    scatter/gather scoring path (the 10^12-turn plan — no whole-dataset
    broadcast) runs end-to-end. Rows-only here; byte-identical edges to the
    broadcast path are asserted by the parity test."""
    from ..config import ScoringConfig
    from .entity_resolution import resolve_entities

    fx = _er_fixture_dir(sf_dir)
    base = EngineConfig()
    dict_table = _anchor_dict_table(fx, base)  # dict build is config-independent here
    rel_state = _relatedness_state(fx, base, dict_table)
    cfg = EngineConfig(scoring=ScoringConfig(side_broadcast_gate=0))
    transcripts = read_transcripts(os.path.join(fx, "transcripts.parquet"))
    res = resolve_entities(
        transcripts, cfg, anchor_dict_source=dict_table, relatedness=rel_state
    )
    return res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)


# --- ER-quality gate (r2 verdict #5): pairwise P/R/F1 vs planted truth ---

_ERQ_NCONVS = 200  # sf0.001-scale, fixed: the oracle's recursive CTE stays cheap
_ERQ_DIR = f"{_FIXTURE_BASE}/erq_n{_ERQ_NCONVS}"
_ERQ_EDGES = os.path.join(_ERQ_DIR, "er_match_edges.parquet")
_ERQ_CLUSTERS = os.path.join(_ERQ_DIR, "er_clusters_pred.parquet")
_ERQ_MANIFEST = os.path.join(_ERQ_DIR, "ERQ_MANIFEST.json")

_PKG_FP: str | None = None


def _pkg_fingerprint() -> str:
    """Content hash of every package source file (py + c) — NOT mtimes,
    which archive extraction / mtime-preserving syncs can fake. Combined
    with the engine config hash it identifies exactly which code+config
    produced an ER-quality artifact."""
    global _PKG_FP
    if _PKG_FP is None:
        import glob as _glob
        import hashlib as _hashlib

        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        h = _hashlib.sha256()
        for pat in ("**/*.py", "**/*.c"):
            for p in sorted(_glob.glob(os.path.join(pkg_root, pat), recursive=True)):
                h.update(os.path.relpath(p, pkg_root).encode())
                with open(p, "rb") as f:
                    h.update(f.read())
        _PKG_FP = h.hexdigest()[:16]
    return _PKG_FP


_FILE_FP: dict = {}


def _file_fingerprint(path: str) -> str:
    """Content hash of an external input file (e.g. the fixed testdata
    embeddings): a regenerated input must invalidate artifacts derived
    from it even though the package fingerprint is unchanged. Memoised
    per (path, size, mtime_ns) so repeated manifest checks don't re-read."""
    import hashlib as _hashlib

    st = os.stat(path)
    key = (path, st.st_size, st.st_mtime_ns)
    fp = _FILE_FP.get(key)
    if fp is None:
        h = _hashlib.sha256()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        fp = _FILE_FP[key] = h.hexdigest()[:16]
    return fp


def _manifest_fresh(manifest_path: str, fingerprint: str, *artifacts: str) -> bool:
    """True iff every artifact file exists AND the manifest carries exactly
    ``fingerprint`` (content fingerprints, never mtimes — archive extraction
    and mtime-preserving syncs can fake those). Shared by every quality-gate
    artifact (er_quality, knn_lsh_recall, embedding_neardup_recall)."""
    import json as _json

    if not all(os.path.exists(p) for p in artifacts):
        return False
    try:
        with open(manifest_path) as f:
            return _json.load(f).get("fingerprint") == fingerprint
    except (OSError, ValueError):
        return False


def _land_parquet(path: str, df: pd.DataFrame) -> None:
    """Atomically land a small driver-side DataFrame as a Parquet artifact
    (pid-suffixed tmp + os.replace; producers are deterministic, so
    concurrent same-user replaces interleave safely)."""
    import pyarrow.parquet as pq

    tmp = f"{path}.{os.getpid()}.tmp"
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), tmp)
    os.replace(tmp, path)


def _land_manifest(path: str, fingerprint: str) -> None:
    import json as _json

    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as f:
        _json.dump({"fingerprint": fingerprint}, f)
    os.replace(tmp, path)


def _erq_fingerprint() -> str:
    return f"{_pkg_fingerprint()}:{EngineConfig().config_hash()}:n{_ERQ_NCONVS}"


def _erq_fresh() -> bool:
    return _manifest_fresh(
        _ERQ_MANIFEST, _erq_fingerprint(), _ERQ_EDGES, _ERQ_CLUSTERS
    )


def _erq_fixture_dir() -> str:
    marker = os.path.join(_ERQ_DIR, "transcripts.parquet")
    if not os.path.exists(marker):
        from ..gen import write_fixture_set

        write_fixture_set(_ERQ_DIR, n_convs=_ERQ_NCONVS, seed=42)
    return _ERQ_DIR


def _erq_run() -> pd.DataFrame:
    """Run the flagship pipeline on the fixed ER-quality fixture; lands the
    match edges + predicted clusters as Parquet artifacts beside the fixture
    (atomic replaces) with a code+config fingerprint manifest, so the DuckDB
    oracle re-clusters exactly the edges this code version produced and the
    query side can reuse the same run instead of recomputing. Returns the
    predicted clusters."""
    from .entity_resolution import resolve_entities

    fx = _erq_fixture_dir()
    cfg = EngineConfig()
    dict_table = _anchor_dict_table(fx, cfg)
    rel_state = _relatedness_state(fx, cfg, dict_table)
    transcripts = read_transcripts(os.path.join(fx, "transcripts.parquet"))
    res = resolve_entities(
        transcripts, cfg, anchor_dict_source=dict_table, relatedness=rel_state
    )
    edges = res.edges.to_pandas()
    match = (
        edges.loc[edges["is_match"], ["conv_a", "conv_b"]]
        .sort_values(["conv_a", "conv_b"])
        .reset_index(drop=True)
    )
    clusters = res.clusters.to_pandas().sort_values("conv_id").reset_index(drop=True)
    _land_parquet(_ERQ_EDGES, match)
    _land_parquet(_ERQ_CLUSTERS, clusters)
    _land_manifest(_ERQ_MANIFEST, _erq_fingerprint())
    return clusters


def _erq_clusters() -> pd.DataFrame:
    """Predicted clusters for the ER-quality gate — one pipeline run per
    code+config fingerprint, shared by the query side and the SQL oracle
    (the determinism of the pipeline makes concurrent same-user writes
    byte-identical, so atomic replaces can interleave safely)."""
    import pyarrow.parquet as pq

    if _erq_fresh():
        return pq.read_table(_ERQ_CLUSTERS).to_pandas()
    return _erq_run()


def ensure_er_quality_artifacts() -> None:
    """Idempotent: make sure the fixture + match-edges artifact exist AND
    carry the current code+config fingerprint, so the ER-quality oracle SQL
    never re-clusters match edges written by a previous code version (the
    query side reuses the same fingerprinted run; both sides see the same
    edges). Also ensures the fixture's generated side tables (translations,
    pageviews) exist — the J5/F4 oracles read them from the same dir — and
    the anchor-dict artifact the er_mentions oracle reads (idempotent; a
    fresh fingerprint implies the same code built it, but re-ensure in case
    only the dict cache was deleted)."""
    if not _erq_fresh():
        _erq_run()
    fx = _erq_fixture_dir()
    _side_table(fx, "translations")
    _side_table(fx, "pageviews")
    _anchor_dict_table(fx, EngineConfig())


def er_cluster_assignments(sf_dir: str) -> pd.DataFrame:
    """T9 cluster ASSIGNMENTS hash-gated row-by-row (er_quality gates only
    the aggregate metrics): returns every (conv_id, cluster_id) from the
    fingerprinted flagship run on the fixed ER-quality fixture; the DuckDB
    oracle re-derives each assignment INDEPENDENTLY from the engine's match
    edges via recursive-CTE min-label components (canonical cluster id =
    min conv_id in the component, matching ``_UnionFind``'s min-id-wins
    union and the distributed min-label propagation — clustering.py:68)."""
    import pyarrow.parquet as pq

    ensure_er_quality_artifacts()
    out = pq.read_table(_ERQ_CLUSTERS).to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


ER_CLUSTER_ASSIGN_SQL = f"""
WITH RECURSIVE
nodes AS (
  SELECT conv_id FROM read_parquet('{_ERQ_DIR}/clusters_truth.parquet')
),
edges AS (
  SELECT conv_a AS a, conv_b AS b FROM read_parquet('{_ERQ_EDGES}')
),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
walk(node, label) AS (
  SELECT conv_id, conv_id FROM nodes
  UNION
  SELECT s.a, w.label FROM sym s JOIN walk w ON s.b = w.node WHERE w.label < s.a
)
SELECT node AS conv_id, min(label) AS cluster_id
FROM walk GROUP BY node ORDER BY conv_id
"""


def er_quality(sf_dir: str) -> pd.DataFrame:
    """Driver-visible ER-quality gate: pairwise precision/recall/F1 of the
    flagship clusters vs the generator's PLANTED truth, on a fixed
    sf0.001-scale fixture. Pair counts come from group sizes (exact over all
    C(n,2) pairs, O(n) math). The DuckDB oracle re-derives the clusters
    INDEPENDENTLY from the engine's scored match edges (recursive-CTE
    connected components — verifying T9 + the metric math; scorer parity vs
    a brute-force driver oracle is asserted in tests/test_e2e.py) and
    recomputes identical metrics from the same planted truth.

    BASELINE.json bar: pairwise F1 ≥ 0.99; the hash gate pins the exact
    measured value."""
    import pyarrow.parquet as pq

    clusters = _erq_clusters()
    truth = pq.read_table(os.path.join(_ERQ_DIR, "clusters_truth.parquet")).to_pandas()
    df = clusters.merge(truth, on="conv_id", suffixes=("_pred", "_true"))

    def npairs(sizes: pd.Series) -> int:
        return int((sizes * (sizes - 1) // 2).sum())

    pred_pairs = npairs(df.groupby("cluster_id_pred").size())
    true_pairs = npairs(df.groupby("cluster_id_true").size())
    tp_pairs = npairs(df.groupby(["cluster_id_pred", "cluster_id_true"]).size())
    precision = 1.0 if pred_pairs == 0 else tp_pairs / pred_pairs
    recall = 1.0 if true_pairs == 0 else tp_pairs / true_pairs
    denom = pred_pairs + true_pairs
    f1 = 1.0 if denom == 0 else 2.0 * tp_pairs / denom
    return pd.DataFrame(
        {
            "n_convs": pd.Series([len(df)], dtype="int64"),
            "n_clusters": pd.Series([df["cluster_id_pred"].nunique()], dtype="int64"),
            "pred_pairs": pd.Series([pred_pairs], dtype="int64"),
            "true_pairs": pd.Series([true_pairs], dtype="int64"),
            "tp_pairs": pd.Series([tp_pairs], dtype="int64"),
            "precision_pairs": [round(precision, 6)],
            "recall_pairs": [round(recall, 6)],
            "f1_pairs": [round(f1, 6)],
        }
    )


ER_QUALITY_SQL = f"""
WITH RECURSIVE
truth AS (
  SELECT conv_id, cluster_id AS true_cluster
  FROM read_parquet('{_ERQ_DIR}/clusters_truth.parquet')
),
edges AS (
  SELECT conv_a AS a, conv_b AS b FROM read_parquet('{_ERQ_EDGES}')
),
sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
walk(node, label) AS (
  SELECT conv_id, conv_id FROM truth
  UNION
  SELECT s.a, w.label FROM sym s JOIN walk w ON s.b = w.node WHERE w.label < s.a
),
comp AS (SELECT node AS conv_id, min(label) AS pred_cluster FROM walk GROUP BY node),
j AS (
  SELECT t.conv_id, c.pred_cluster, t.true_cluster
  FROM truth t JOIN comp c USING (conv_id)
),
pred_g AS (SELECT pred_cluster, count(*) AS n FROM j GROUP BY 1),
true_g AS (SELECT true_cluster, count(*) AS n FROM j GROUP BY 1),
joint_g AS (SELECT pred_cluster, true_cluster, count(*) AS n FROM j GROUP BY 1, 2),
m AS (
  SELECT (SELECT count(*) FROM j) AS n_convs,
         (SELECT count(*) FROM pred_g) AS n_clusters,
         (SELECT coalesce(sum(n * (n - 1) // 2), 0) FROM pred_g) AS pred_pairs,
         (SELECT coalesce(sum(n * (n - 1) // 2), 0) FROM true_g) AS true_pairs,
         (SELECT coalesce(sum(n * (n - 1) // 2), 0) FROM joint_g) AS tp_pairs
)
SELECT CAST(n_convs AS BIGINT) AS n_convs,
       CAST(n_clusters AS BIGINT) AS n_clusters,
       CAST(pred_pairs AS BIGINT) AS pred_pairs,
       CAST(true_pairs AS BIGINT) AS true_pairs,
       CAST(tp_pairs AS BIGINT) AS tp_pairs,
       round(CASE WHEN pred_pairs = 0 THEN 1.0 ELSE tp_pairs / pred_pairs END, 6)
         AS precision_pairs,
       round(CASE WHEN true_pairs = 0 THEN 1.0 ELSE tp_pairs / true_pairs END, 6)
         AS recall_pairs,
       round(CASE WHEN pred_pairs + true_pairs = 0 THEN 1.0
             ELSE 2.0 * tp_pairs / (pred_pairs + true_pairs) END, 6) AS f1_pairs
FROM m
"""


def er_mentions(sf_dir: str) -> pd.DataFrame:
    """T3 anchor mention extraction, now a FULL SQL oracle: pinned to the
    fixed ER-quality fixture (the ``sense_degrees`` promotion pattern) so
    DuckDB can ``read_parquet`` the same transcripts + anchor-dict artifact.

    Why the oracle is exact on this corpus: fixture turn text is lowercase
    ASCII words joined by single spaces (gen.py templates/filler/titles), so
    the engine's ``\\w+`` tokenizer ≡ ``string_split(text, ' ')``, char spans
    are cumulative token lengths, ``" ".join(tokens)`` ≡ the original text
    slice, and ``normalize_text`` is the identity on every surface n-gram —
    which lets plain SQL re-derive every (span, label, sense, probability)
    row the actor-pool matcher emits. Unicode/punctuation tokenization and
    normalization stay pinned by golden-vector tests (tests/test_mentions.py,
    tests/test_normalize.py). Default config: thresholds 0.0, no
    unique-per-sense — the SQL mirrors those defaults."""
    from ..stages.mentions import extract_mentions
    from ..stages.normalize_turns import normalize_turns

    fx = _erq_fixture_dir()
    cfg = EngineConfig()
    dict_table = _anchor_dict_table(fx, cfg)
    ds = normalize_turns(read_transcripts(os.path.join(fx, "transcripts.parquet")), cfg)
    out = extract_mentions(ds, dict_table, cfg).to_pandas()
    return out.sort_values(
        ["conv_id", "turn_idx", "start", "end", "label", "sense_id"]
    ).reset_index(drop=True)


# anchor-dict artifact for the fixed ER-quality fixture (written by
# _anchor_dict_table; ensured alongside the er_quality artifacts)
_ERQ_DICT = os.path.join(
    _ERQ_DIR, f"anchor_dict_{EngineConfig().config_hash()}.parquet"
)

ER_MENTIONS_SQL = f"""
WITH turns AS (
  SELECT conv_id, turn_idx, text
  FROM read_parquet('{_ERQ_DIR}/transcripts.parquet')
),
toks AS (
  SELECT conv_id, turn_idx, text,
         unnest(string_split(text, ' ')) AS tok,
         unnest(range(1, array_length(string_split(text, ' ')) + 1)) AS pos
  FROM turns
),
spans AS (
  SELECT conv_id, turn_idx, text, tok, pos,
    CAST(coalesce(sum(length(tok) + 1) OVER (
      PARTITION BY conv_id, turn_idx ORDER BY pos
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INT) AS tok_start
  FROM toks
),
ngrams AS (
  -- n = 1..5 word n-grams; surfaces longer than the longest dictionary
  -- norm simply match nothing, so the unconditional n<=5 join equals the
  -- engine's min(max_ngram, dict.max_words) cap
  SELECT a.conv_id, a.turn_idx,
         a.tok_start AS start,
         CAST(b.tok_start + length(b.tok) AS INT) AS "end",
         substr(a.text, a.tok_start + 1,
                b.tok_start + length(b.tok) - a.tok_start) AS ngram
  FROM spans a
  JOIN spans b
    ON b.conv_id = a.conv_id AND b.turn_idx = a.turn_idx
   AND b.pos BETWEEN a.pos AND a.pos + 4
),
d AS (
  SELECT label, norm, link_occ, link_doc,
    CASE WHEN text_doc > 0 THEN CAST(link_doc AS DOUBLE) / text_doc
         ELSE 0.0 END AS link_probability,
    unnest(senses, recursive := true)
  FROM read_parquet('{_ERQ_DICT}')
)
SELECT g.conv_id, g.turn_idx, g.start, g."end", g.ngram,
       d.label, d.link_probability,
       d.sense_id,
       CASE WHEN d.link_occ > 0 THEN CAST(d.occ AS DOUBLE) / d.link_occ
            ELSE 0.0 END AS prior_probability,
       CASE WHEN d.link_doc > 0 THEN CAST(d.doc AS DOUBLE) / d.link_doc
            ELSE 0.0 END AS sense_probability,
       d.link_doc AS label_link_doc
FROM ngrams g
JOIN d ON d.norm = g.ngram
ORDER BY g.conv_id, g.turn_idx, g.start, g."end", d.label, d.sense_id
"""


def minhash_dedup_docs(sf_dir: str) -> pd.DataFrame:
    """MinHash/LSH dedup in exact-verify mode: LSH candidate generation +
    64-bit content-fingerprint pair verify. Identical texts share every
    band bucket, so the verified components provably equal the exact-text
    groups — which makes the full signature → banding → bucket shuffle →
    clustering path SQL-oracle-checkable (the threshold-Jaccard near-dup
    mode, which groups genuinely non-identical near-dups on this corpus,
    stays covered by pytest parity/recall tests)."""
    from ..stages.dedup import minhash_dedup

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = minhash_dedup(ds, EngineConfig(), exact_verify=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


MINHASH_DEDUP_SQL = """
SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS dup_group
FROM documents ORDER BY doc_id
"""


def ngram_jaccard_pairs_docs(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed word-trigram Jaccard similarity join over the
    documents table (the oracle-checkable baseline minhash_dedup_docs
    approximates; threshold 0.5 sits in a wide gap of the testdata's
    Jaccard distribution — nearest pairs at 0.067 and 0.9 — so set
    membership has no float-boundary hazard)."""
    from ..stages.dedup import ngram_jaccard_pairs

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = ngram_jaccard_pairs(ds, n=3, threshold=0.5).to_pandas()
    if out.empty:  # an empty Ray dataset loses its schema on to_pandas
        return pd.DataFrame(
            {
                "src": pd.Series(dtype="int64"),
                "dst": pd.Series(dtype="int64"),
                "jaccard": pd.Series(dtype="float64"),
            }
        )
    out = out.sort_values(["src", "dst"]).reset_index(drop=True)
    return _round_cols(out, ["jaccard"], nd=6)


# the same inverted-index plan the engine runs, stated in SQL: distinct
# word trigrams per doc (short docs contribute their whole text; empty
# docs nothing), gram self-join for intersection counts, |A∪B| by
# inclusion-exclusion. list_filter drops the empty tokens DuckDB's regex
# split keeps (Python str.split drops them natively).
NGRAM_JACCARD_SQL = r"""
WITH words AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '\s+'),
                     x -> x <> '') AS ws
  FROM documents
),
grams AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(ws) >= 3
              THEN ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
              ELSE array_to_string(ws, ' ') END AS g
  FROM words, UNNEST(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i)
  WHERE len(ws) >= 1
),
counts AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS src, b.doc_id AS dst, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT src, dst,
       round(i * 1.0 / (ca.n + cb.n - i), 6) AS jaccard
FROM inter
JOIN counts ca ON ca.doc_id = src
JOIN counts cb ON cb.doc_id = dst
WHERE i * 1.0 / (ca.n + cb.n - i) >= 0.5
ORDER BY src, dst
"""


def simhash_docs(sf_dir: str) -> pd.DataFrame:
    """SimHash dedup in exact-verify mode (same promotion pattern as
    ``minhash_dedup_docs``): the vectorized bit-vote simhash values drive
    the grouped shuffle, in-group connectivity is content-fingerprint
    equality, so the output provably equals the exact-text GROUP BY and
    the full simhash machinery is SQL-oracle-checked. The Hamming≤k
    banding mode stays covered by pytest (band-rotation recall tests)."""
    from ..stages.dedup import simhash_dedup

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = simhash_dedup(ds, exact_verify=True).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


# exact-verify mode output ≡ exact-text groups (see simhash_docs docstring)
SIMHASH_DEDUP_SQL = MINHASH_DEDUP_SQL


from ..stages.textstats import _STOPWORDS as _LANG_STOPWORDS

_STOPS_SQL = ", ".join(
    f"'{w}'" for w in sorted(set().union(*_LANG_STOPWORDS.values()))
)


def doc_quality(sf_dir: str) -> pd.DataFrame:
    """Quality heuristics with a full SQL oracle (DOC_QUALITY_SQL mirrors
    the ratios and the clip-blend exactly; both sides round to 6)."""
    from ..stages.textstats import quality_score

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = quality_score(ds).to_pandas()[
        ["doc_id", "punct_ratio", "stop_ratio", "mean_word_len", "quality"]
    ]
    out = out.sort_values("doc_id").reset_index(drop=True)
    return _round_cols(out, ["punct_ratio", "stop_ratio", "mean_word_len", "quality"], nd=6)


# exact SQL mirror of quality_score: punct = [^\w\s] chars / chars,
# words = \S+ tokens, stops = the union stopword list, quality = the same
# clip blend. NOTE: DuckDB's RE2 \w is ASCII while Python's re.UNICODE \w
# is not — identical on this corpus (ASCII text), asserted by the gate.
DOC_QUALITY_SQL = f"""
WITH w AS (
  SELECT doc_id, text,
    greatest(length(text), 1)::DOUBLE AS nc,
    list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS words,
    (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE AS n_punct
  FROM documents
), r AS (
  SELECT doc_id,
    n_punct / nc AS punct_ratio,
    len(list_filter(words, x -> lower(x) IN ({_STOPS_SQL})))
      / greatest(len(words), 1)::DOUBLE AS stop_ratio,
    list_sum(list_transform(words, x -> length(x)))
      / greatest(len(words), 1)::DOUBLE AS mean_word_len,
    length(text)::DOUBLE AS n_chars
  FROM w
)
SELECT doc_id,
  round(punct_ratio, 6) AS punct_ratio,
  round(stop_ratio, 6) AS stop_ratio,
  round(coalesce(mean_word_len, 0.0), 6) AS mean_word_len,
  round(
    least(greatest(n_chars / 200.0, 0), 1) * 0.4
    + least(greatest(stop_ratio / 0.3, 0), 1) * 0.4
    + least(greatest(1.0 - punct_ratio / 0.2, 0), 1) * 0.2, 6) AS quality
FROM r ORDER BY doc_id
"""


def doc_langid(sf_dir: str) -> pd.DataFrame:
    """M10 language-ID, now a FULL SQL oracle. The testdata document text is
    lowercase single-space ASCII, so the non-latin script tier never fires
    and ``\\S+``-tokenize + lowercase ≡ ``string_split`` — the stopword
    profile vote (first 200 tokens, strict-greater argmax in profile order)
    is re-derived in plain SQL from the same ``_STOPWORDS`` profiles.
    Script-tier behavior (CJK/kana/hangul/cyrillic) stays pinned by
    golden-vector tests in tests/test_dedup_textstats.py."""
    from ..stages.textstats import lang_id

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text", "lang"])
    out = lang_id(ds).to_pandas()[["doc_id", "lang", "lang_pred"]]
    return out.sort_values("doc_id").reset_index(drop=True)


def _langid_sql() -> str:
    from ..stages.textstats import _STOPWORDS

    vals = ", ".join(
        f"('{lang}', '{w}', {prio})"
        for prio, (lang, stops) in enumerate(_STOPWORDS.items())
        for w in sorted(stops)
    )
    return f"""
WITH toks AS (
  SELECT doc_id,
         unnest(list_filter(string_split(text, ' '), w -> w <> '')[1:200]) AS w
  FROM documents
),
profile(lang, w, prio) AS (VALUES {vals}),
votes AS (
  SELECT t.doc_id, p.lang, p.prio, count(*) AS k
  FROM toks t JOIN profile p ON p.w = t.w
  GROUP BY 1, 2, 3
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id ORDER BY k DESC, prio ASC) AS rn
  FROM votes
)
SELECT d.doc_id, d.lang, coalesce(b.lang, 'unknown') AS lang_pred
FROM documents d
LEFT JOIN best b ON b.doc_id = d.doc_id AND b.rn = 1
ORDER BY d.doc_id
"""


DOC_LANGID_SQL = _langid_sql()


def doc_fingerprints(sf_dir: str) -> pd.DataFrame:
    """Document fingerprinting (64-bit polynomial rolling hash + murmur
    avalanche), now a FULL SQL oracle: DuckDB re-derives every fingerprint
    with HUGEINT mod-2^64 arithmetic — a recursive CTE for the prime-power
    sequence, a per-byte (byte·prime^i) mod 2^64 sum, then the xor-shift /
    modmul avalanche with the 64×64→64 multiply split into 32-bit halves.
    ``ascii(substr(...))`` equals the UTF-8 byte only on ASCII text (true of
    the testdata corpus); non-ASCII byte-level hashing stays pinned by
    pytest (tests/test_dedup_textstats.py)."""
    from ..stages.textstats import fingerprint

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    out = fingerprint(ds).to_pandas()[["doc_id", "fp"]]
    return out.sort_values("doc_id").reset_index(drop=True)


_M64 = "18446744073709551616"  # 2^64; FNV prime / seed / murmur MIX below
DOC_FINGERPRINTS_SQL = f"""
WITH RECURSIVE
docs AS (
  SELECT doc_id, text, length(text) AS n FROM documents
),
maxn AS (SELECT max(n) AS m FROM docs),
pw(i, v) AS (
  SELECT 0, CAST(1 AS HUGEINT)
  UNION ALL
  SELECT i + 1, (v * 1099511628211) % {_M64} FROM pw, maxn WHERE i + 1 < maxn.m
),
chars AS (
  SELECT d.doc_id, p.i,
         CAST(ascii(substr(d.text, p.i + 1, 1)) AS HUGEINT) AS byte, p.v
  FROM docs d JOIN pw p ON p.i < d.n
),
sums AS (SELECT doc_id, sum((byte * v) % {_M64}) AS s FROM chars GROUP BY doc_id),
acc0 AS (
  SELECT d.doc_id,
         CAST((14695981039346656037 + coalesce(s.s, 0)) % {_M64} AS UBIGINT) AS x
  FROM docs d LEFT JOIN sums s USING (doc_id)
),
av1 AS (SELECT doc_id, xor(x, x >> 33) AS x FROM acc0),
mul AS (
  SELECT doc_id,
    CAST((
      (CAST(x & 4294967295 AS HUGEINT) * 18397679294719823053) +
      (((CAST(x >> 32 AS HUGEINT) * 18397679294719823053) % 4294967296)
        * 4294967296)
    ) % {_M64} AS UBIGINT) AS x
  FROM av1
),
av2 AS (SELECT doc_id, xor(x, x >> 33) AS x FROM mul)
SELECT doc_id,
       printf('%08x%08x', CAST(x >> 32 AS BIGINT),
              CAST(x & 4294967295 AS BIGINT)) AS fp
FROM av2 ORDER BY doc_id
"""


# ---- ANN quality gate (the er_quality pattern for similarity search) ----
_KNN_EMB = "/root/testdata/sf0.001/embeddings.parquet"  # fixed, sf-independent
_KNN_PICKS = f"{_FIXTURE_BASE}/knn_lsh_picks.parquet"
_KNN_MANIFEST = f"{_FIXTURE_BASE}/knn_lsh_picks.manifest.json"
_KNN_K = 10
_KNN_PLANES = 4  # 16 buckets over the 500-vector fixture (+H1 probes): the
# representative pruning point; 8 planes ≈ 2 vectors/bucket at this scale


def _knn_fingerprint() -> str:
    # _file_fingerprint(_KNN_EMB): the embeddings table lives OUTSIDE the
    # package, so a regenerated testdata tree must invalidate the picks
    # artifact even though the package fingerprint is unchanged
    return (
        f"{_pkg_fingerprint()}:k{_KNN_K}:p{_KNN_PLANES}"
        f":emb{_file_fingerprint(_KNN_EMB)}"
    )


def _knn_queries() -> np.ndarray:
    import pyarrow.parquet as pq

    q = (
        pq.read_table(_KNN_EMB, filters=[("vec_id", "in", [0, 1, 2])])
        .to_pandas()
        .sort_values("vec_id")["embedding"]
    )
    return np.asarray([np.asarray(v, dtype=np.float64) for v in q])


def ensure_knn_recall_artifacts() -> None:
    """Idempotent: run the hyperplane-LSH KNN over the fixed embeddings
    table and land its picks as a fingerprinted Parquet artifact the
    ``knn_lsh_recall`` oracle reads. Deterministic (fixed seed + fixed
    input), so concurrent same-user writes are byte-identical and the
    atomic replace can interleave safely.

    Also asserts the rank-k margin: the hash gate needs the engine's numpy
    brute top-k and the oracle's DuckDB ``list_cosine_similarity`` top-k to
    agree exactly, which only holds when the gap between the k-th and
    (k+1)-th cosine exceeds float summation-order noise for every query —
    raise loudly here (artifact build time) instead of failing
    nondeterministically across BLAS/DuckDB versions later."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_lsh

    if _manifest_fresh(_KNN_MANIFEST, _knn_fingerprint(), _KNN_PICKS):
        return
    os.makedirs(_FIXTURE_BASE, exist_ok=True)
    emb = pq.read_table(_KNN_EMB, columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id")
    V = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    Q = _knn_queries()
    sims = (Q / np.linalg.norm(Q, axis=1, keepdims=True)) @ V.T
    top = np.sort(sims, axis=1)[:, ::-1]
    margins = top[:, _KNN_K - 1] - top[:, _KNN_K]
    if float(margins.min()) < 1e-9:
        raise ValueError(
            f"knn_lsh_recall rank-{_KNN_K} boundary margin {margins.min():.3e} "
            f"is within float noise for query {int(margins.argmin())}: the "
            "engine (numpy) and oracle (DuckDB) brute top-k could disagree "
            "platform-dependently. Change _KNN_K or the query set."
        )
    ds = rd.read_parquet(_KNN_EMB, columns=["vec_id", "embedding"])
    picks = (
        knn_lsh(ds, Q, k=_KNN_K, num_planes=_KNN_PLANES)
        .to_pandas()[["query_idx", "vec_id"]]
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    _land_parquet(_KNN_PICKS, picks)
    _land_manifest(_KNN_MANIFEST, _knn_fingerprint())


def knn_lsh_recall(sf_dir: str) -> pd.DataFrame:
    """ANN quality gate: recall of the hyperplane-LSH KNN vs exact
    brute-force top-k on a FIXED embeddings table (er_quality pattern).
    The engine persists its LSH picks as a fingerprinted artifact and
    computes recall against its own distributed ``knn_brute``; the DuckDB
    oracle recomputes the exact top-k INDEPENDENTLY (all-pairs
    ``list_cosine_similarity`` + ``row_number``, ties by vec_id) and
    re-derives recall from the same picks — hash-gating both the
    approximate path's output provenance and the recall arithmetic. The
    two brute top-k sets provably agree (same cosine values, same id
    tie-break; set equality asserted in tests/test_dedup_textstats.py)."""
    from ..stages.similarity import knn_brute

    ensure_knn_recall_artifacts()
    import pyarrow.parquet as pq

    picks = pq.read_table(_KNN_PICKS).to_pandas()
    ds = rd.read_parquet(_KNN_EMB, columns=["vec_id", "embedding"])
    brute = knn_brute(ds, _knn_queries(), k=_KNN_K).to_pandas()
    bset = set(zip(brute["query_idx"], brute["vec_id"]))
    pset = set(zip(picks["query_idx"], picks["vec_id"]))
    hits = len(bset & pset)
    return pd.DataFrame(
        {
            "n_queries": pd.Series([brute["query_idx"].nunique()], dtype="int64"),
            "k": pd.Series([_KNN_K], dtype="int64"),
            "n_picks": pd.Series([len(pset)], dtype="int64"),
            "hits": pd.Series([hits], dtype="int64"),
            "recall": pd.Series([round(hits / len(bset), 6)], dtype="float64"),
        }
    )


# The brute-force CTE chain, shared verbatim with the pytest premise check
# (tests/test_dedup_textstats.py asserts the engine's numpy brute set equals
# THIS query's result — extracting it keeps the asserted premise and the
# shipped oracle from drifting apart)
KNN_BRUTE_CTES = f"""q AS (
  SELECT vec_id AS query_idx, embedding
  FROM read_parquet('{_KNN_EMB}') WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT q.query_idx, e.vec_id,
         list_cosine_similarity(q.embedding::DOUBLE[], e.embedding::DOUBLE[])
           AS cosine
  FROM q CROSS JOIN read_parquet('{_KNN_EMB}') e
),
brute AS (
  SELECT query_idx, vec_id FROM (
    SELECT query_idx, vec_id,
           row_number() OVER (
             PARTITION BY query_idx ORDER BY cosine DESC, vec_id) AS rn
    FROM scored) WHERE rn <= {_KNN_K}
)"""

KNN_LSH_RECALL_SQL = f"""
WITH {KNN_BRUTE_CTES},
picks AS (SELECT query_idx, vec_id FROM read_parquet('{_KNN_PICKS}')),
m AS (
  SELECT (SELECT count(DISTINCT query_idx) FROM brute) AS n_queries,
         (SELECT count(*) FROM brute) AS n_brute,
         (SELECT count(*) FROM picks) AS n_picks,
         (SELECT count(*) FROM picks p
            JOIN brute b ON p.query_idx = b.query_idx
                        AND p.vec_id = b.vec_id) AS hits
)
SELECT CAST(n_queries AS BIGINT) AS n_queries,
       CAST({_KNN_K} AS BIGINT) AS k,
       CAST(n_picks AS BIGINT) AS n_picks,
       CAST(hits AS BIGINT) AS hits,
       round(CAST(hits AS DOUBLE) / n_brute, 6) AS recall
FROM m
"""


def knn_lsh_cosine(sf_dir: str) -> pd.DataFrame:
    """Approximate KNN (rows-only: random-hyperplane pruning is not
    SQL-expressible; quality is hash-gated separately by
    ``knn_lsh_recall``)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_lsh

    # predicate pushdown: only the 3 query rows leave storage (reading the
    # whole embeddings table on the driver for 3 vectors is wrong at scale)
    q = (
        pq.read_table(
            _p(sf_dir, "embeddings"), filters=[("vec_id", "in", [0, 1, 2])]
        )
        .to_pandas()
        .sort_values("vec_id")["embedding"]
    )
    queries = np.asarray([np.asarray(v, dtype=np.float64) for v in q])
    ds = read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_lsh(ds, queries, k=10).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values(["query_idx", "cosine", "vec_id"], ascending=[True, False, True]).reset_index(drop=True)


# ---- IVF ANN variant: same recall-gate pattern as knn_lsh ----
_IVF_PICKS = f"{_FIXTURE_BASE}/knn_ivf_picks.parquet"
_IVF_MANIFEST = f"{_FIXTURE_BASE}/knn_ivf_picks.manifest.json"
_IVF_NLIST = 16
_IVF_NPROBE = 4


def _ivf_fingerprint() -> str:
    return (
        f"{_pkg_fingerprint()}:k{_KNN_K}:nl{_IVF_NLIST}:np{_IVF_NPROBE}"
        f":emb{_file_fingerprint(_KNN_EMB)}"
    )


def ensure_knn_ivf_artifacts() -> None:
    """Idempotent: run the IVF KNN (deterministic spherical-k-means cells,
    ``nprobe`` closest probed) over the fixed embeddings table and land its
    picks as a fingerprinted Parquet artifact for the ``knn_ivf_recall``
    oracle — the same provenance pattern as ``ensure_knn_recall_artifacts``,
    including the rank-k boundary-margin assertion (the hash gate needs the
    numpy and DuckDB brute top-k sets to agree exactly)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_ivf

    if _manifest_fresh(_IVF_MANIFEST, _ivf_fingerprint(), _IVF_PICKS):
        return
    os.makedirs(_FIXTURE_BASE, exist_ok=True)
    emb = pq.read_table(_KNN_EMB, columns=["vec_id", "embedding"]).to_pandas()
    emb = emb.sort_values("vec_id")
    V = np.asarray([np.asarray(v, dtype=np.float64) for v in emb["embedding"]])
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    Q = _knn_queries()
    sims = (Q / np.linalg.norm(Q, axis=1, keepdims=True)) @ V.T
    top = np.sort(sims, axis=1)[:, ::-1]
    margins = top[:, _KNN_K - 1] - top[:, _KNN_K]
    if float(margins.min()) < 1e-9:
        raise ValueError(
            f"knn_ivf_recall rank-{_KNN_K} boundary margin {margins.min():.3e} "
            f"is within float noise for query {int(margins.argmin())}: the "
            "engine (numpy) and oracle (DuckDB) brute top-k could disagree "
            "platform-dependently. Change _KNN_K or the query set."
        )
    ds = rd.read_parquet(_KNN_EMB, columns=["vec_id", "embedding"])
    picks = (
        knn_ivf(ds, Q, k=_KNN_K, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE)
        .to_pandas()[["query_idx", "vec_id"]]
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    _land_parquet(_IVF_PICKS, picks)
    _land_manifest(_IVF_MANIFEST, _ivf_fingerprint())


def knn_ivf_recall(sf_dir: str) -> pd.DataFrame:
    """ANN quality gate for the IVF path: recall of IVF-pruned KNN vs
    exact brute-force top-k on the FIXED embeddings table, with the DuckDB
    oracle independently re-deriving the exact top-k and the recall
    arithmetic from the fingerprinted picks artifact (the
    ``knn_lsh_recall`` pattern applied to the second scale path)."""
    from ..stages.similarity import knn_brute

    ensure_knn_ivf_artifacts()
    import pyarrow.parquet as pq

    picks = pq.read_table(_IVF_PICKS).to_pandas()
    ds = rd.read_parquet(_KNN_EMB, columns=["vec_id", "embedding"])
    brute = knn_brute(ds, _knn_queries(), k=_KNN_K).to_pandas()
    bset = set(zip(brute["query_idx"], brute["vec_id"]))
    pset = set(zip(picks["query_idx"], picks["vec_id"]))
    hits = len(bset & pset)
    return pd.DataFrame(
        {
            "n_queries": pd.Series([brute["query_idx"].nunique()], dtype="int64"),
            "k": pd.Series([_KNN_K], dtype="int64"),
            "n_picks": pd.Series([len(pset)], dtype="int64"),
            "hits": pd.Series([hits], dtype="int64"),
            "recall": pd.Series([round(hits / len(bset), 6)], dtype="float64"),
        }
    )


KNN_IVF_RECALL_SQL = f"""
WITH {KNN_BRUTE_CTES},
picks AS (SELECT query_idx, vec_id FROM read_parquet('{_IVF_PICKS}')),
m AS (
  SELECT (SELECT count(DISTINCT query_idx) FROM brute) AS n_queries,
         (SELECT count(*) FROM brute) AS n_brute,
         (SELECT count(*) FROM picks) AS n_picks,
         (SELECT count(*) FROM picks p
            JOIN brute b ON p.query_idx = b.query_idx
                        AND p.vec_id = b.vec_id) AS hits
)
SELECT CAST(n_queries AS BIGINT) AS n_queries,
       CAST({_KNN_K} AS BIGINT) AS k,
       CAST(n_picks AS BIGINT) AS n_picks,
       CAST(hits AS BIGINT) AS hits,
       round(CAST(hits AS DOUBLE) / n_brute, 6) AS recall
FROM m
"""


def knn_ivf_cosine(sf_dir: str) -> pd.DataFrame:
    """Approximate KNN via IVF cells (rows-only: k-means cell pruning is
    not SQL-expressible; quality is hash-gated separately by
    ``knn_ivf_recall``)."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_ivf

    q = (
        pq.read_table(
            _p(sf_dir, "embeddings"), filters=[("vec_id", "in", [0, 1, 2])]
        )
        .to_pandas()
        .sort_values("vec_id")["embedding"]
    )
    queries = np.asarray([np.asarray(v, dtype=np.float64) for v in q])
    ds = read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    out = knn_ivf(
        ds, queries, k=10, nlist=_IVF_NLIST, nprobe=_IVF_NPROBE
    ).to_pandas()
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values(
        ["query_idx", "cosine", "vec_id"], ascending=[True, False, True]
    ).reset_index(drop=True)


# ---- quantized ANN variant: same recall-gate pattern, storage path ----
_QKNN_PICKS = f"{_FIXTURE_BASE}/knn_quantized_picks.parquet"
_QKNN_MANIFEST = f"{_FIXTURE_BASE}/knn_quantized_picks.manifest.json"


def _qknn_fingerprint() -> str:
    return f"{_pkg_fingerprint()}:k{_KNN_K}:int8:emb{_file_fingerprint(_KNN_EMB)}"


def ensure_knn_quantized_artifacts() -> None:
    """Idempotent: run the int8-quantized exact scan (stages/similarity
    :: knn_quantized) over the fixed embeddings table and land its picks
    as a fingerprinted artifact for the ``knn_quantized_recall`` oracle —
    the knn_lsh/ivf provenance pattern applied to the storage path."""
    import pyarrow.parquet as pq

    from ..stages.similarity import knn_quantized

    if _manifest_fresh(_QKNN_MANIFEST, _qknn_fingerprint(), _QKNN_PICKS):
        return
    os.makedirs(_FIXTURE_BASE, exist_ok=True)
    ds = rd.read_parquet(_KNN_EMB, columns=["vec_id", "embedding"])
    picks = (
        knn_quantized(ds, _knn_queries(), k=_KNN_K)
        .to_pandas()[["query_idx", "vec_id"]]
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    _land_parquet(_QKNN_PICKS, picks)
    _land_manifest(_QKNN_MANIFEST, _qknn_fingerprint())


def knn_quantized_recall(sf_dir: str) -> pd.DataFrame:
    """Quality gate for the int8 storage path: recall of the quantized
    scan vs exact float top-k, DuckDB independently re-deriving the
    exact set and the recall arithmetic from the picks artifact."""
    from ..stages.similarity import knn_brute

    ensure_knn_quantized_artifacts()
    import pyarrow.parquet as pq

    picks = pq.read_table(_QKNN_PICKS).to_pandas()
    ds = rd.read_parquet(_KNN_EMB, columns=["vec_id", "embedding"])
    brute = knn_brute(ds, _knn_queries(), k=_KNN_K).to_pandas()
    bset = set(zip(brute["query_idx"], brute["vec_id"]))
    pset = set(zip(picks["query_idx"], picks["vec_id"]))
    hits = len(bset & pset)
    return pd.DataFrame(
        {
            "n_queries": pd.Series([brute["query_idx"].nunique()], dtype="int64"),
            "k": pd.Series([_KNN_K], dtype="int64"),
            "n_picks": pd.Series([len(pset)], dtype="int64"),
            "hits": pd.Series([hits], dtype="int64"),
            "recall": pd.Series([round(hits / len(bset), 6)], dtype="float64"),
        }
    )


KNN_QUANTIZED_RECALL_SQL = f"""
WITH {KNN_BRUTE_CTES},
picks AS (SELECT query_idx, vec_id FROM read_parquet('{_QKNN_PICKS}')),
m AS (
  SELECT (SELECT count(DISTINCT query_idx) FROM brute) AS n_queries,
         (SELECT count(*) FROM brute) AS n_brute,
         (SELECT count(*) FROM picks) AS n_picks,
         (SELECT count(*) FROM picks p
            JOIN brute b ON p.query_idx = b.query_idx
                        AND p.vec_id = b.vec_id) AS hits
)
SELECT CAST(n_queries AS BIGINT) AS n_queries,
       CAST({_KNN_K} AS BIGINT) AS k,
       CAST(n_picks AS BIGINT) AS n_picks,
       CAST(hits AS BIGINT) AS hits,
       round(CAST(hits AS DOUBLE) / n_brute, 6) AS recall
FROM m
"""


# ---- embedding near-dup quality gate (planted-dup fixture) ----
_EMBND_FIX = f"{_FIXTURE_BASE}/embnd_fixture.parquet"
_EMBND_PAIRS = f"{_FIXTURE_BASE}/embnd_lsh_pairs.parquet"
_EMBND_MANIFEST = f"{_FIXTURE_BASE}/embnd_lsh_pairs.manifest.json"
_EMBND_TAU = 0.995


def _embnd_fingerprint() -> str:
    return f"{_pkg_fingerprint()}:tau{_EMBND_TAU}"


def ensure_embedding_neardup_artifacts() -> None:
    """Idempotent: write the planted-near-dup embedding fixture
    (``gen_embeddings_with_neardups`` — the synthetic testdata embeddings
    have NO true near-dups, max pairwise cosine ≈ 0.48) and land the LSH
    near-dup pairs found on it as a fingerprinted Parquet artifact for the
    ``embedding_neardup_recall`` oracle. Deterministic throughout, so
    concurrent same-user atomic replaces interleave safely."""
    import pyarrow.parquet as pq

    from ..gen import gen_embeddings_with_neardups
    from ..stages.dedup import embedding_dedup

    if _manifest_fresh(
        _EMBND_MANIFEST, _embnd_fingerprint(), _EMBND_FIX, _EMBND_PAIRS
    ):
        return
    os.makedirs(_FIXTURE_BASE, exist_ok=True)
    # regenerate the fixture whenever the manifest is stale (not just when
    # the file is missing): the generator's parameters live in package code
    # — covered by _pkg_fingerprint() — and a cached fixture from an older
    # generator must not survive a bare os.path.exists check
    tmp = f"{_EMBND_FIX}.{os.getpid()}.tmp"
    pq.write_table(gen_embeddings_with_neardups(), tmp)
    os.replace(tmp, _EMBND_FIX)
    ds = rd.read_parquet(_EMBND_FIX)
    pairs = (
        embedding_dedup(ds, cosine_threshold=_EMBND_TAU)
        .to_pandas()[["src", "dst"]]
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    _land_parquet(_EMBND_PAIRS, pairs)
    _land_manifest(_EMBND_MANIFEST, _embnd_fingerprint())


def embedding_neardup_recall(sf_dir: str) -> pd.DataFrame:
    """Near-dup quality gate for the hyperplane-LSH embedding dedup (U3
    scale path): recall vs the EXACT all-pairs cosine ≥ τ join on a fixture
    with planted near-identical vectors (τ=0.995; tiny perturbations keep
    every hyperplane sign w.h.p., so LSH should recover every planted
    pair). The engine computes recall against its own distributed
    ``embedding_pairs_exact``; the DuckDB oracle recomputes the exact pair
    set INDEPENDENTLY (all-pairs ``list_cosine_similarity``) and re-derives
    recall from the same fingerprinted LSH-pairs artifact."""
    import pyarrow.parquet as pq

    from ..stages.dedup import embedding_pairs_exact

    ensure_embedding_neardup_artifacts()
    lsh = pq.read_table(_EMBND_PAIRS).to_pandas()
    exact = embedding_pairs_exact(
        rd.read_parquet(_EMBND_FIX), cosine_threshold=_EMBND_TAU
    ).to_pandas()
    es = set(zip(exact["src"], exact["dst"]))
    ls = set(zip(lsh["src"], lsh["dst"]))
    hits = len(es & ls)
    return pd.DataFrame(
        {
            "exact_pairs": pd.Series([len(es)], dtype="int64"),
            "lsh_pairs": pd.Series([len(ls)], dtype="int64"),
            "hits": pd.Series([hits], dtype="int64"),
            "recall": pd.Series(
                [round(hits / len(es), 6) if es else 1.0], dtype="float64"
            ),
        }
    )


EMBND_RECALL_SQL = f"""
WITH exact AS (
  SELECT a.vec_id AS src, b.vec_id AS dst
  FROM read_parquet('{_EMBND_FIX}') a
  JOIN read_parquet('{_EMBND_FIX}') b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
        >= {_EMBND_TAU}
),
lsh AS (SELECT src, dst FROM read_parquet('{_EMBND_PAIRS}')),
m AS (
  SELECT (SELECT count(*) FROM exact) AS exact_pairs,
         (SELECT count(*) FROM lsh) AS lsh_pairs,
         (SELECT count(*) FROM lsh l
            JOIN exact e ON l.src = e.src AND l.dst = e.dst) AS hits
)
SELECT CAST(exact_pairs AS BIGINT) AS exact_pairs,
       CAST(lsh_pairs AS BIGINT) AS lsh_pairs,
       CAST(hits AS BIGINT) AS hits,
       CASE WHEN exact_pairs = 0 THEN 1.0
            ELSE round(CAST(hits AS DOUBLE) / exact_pairs, 6) END AS recall
FROM m
"""


def embedding_neardup_pairs(sf_dir: str) -> pd.DataFrame:
    from ..stages.dedup import embedding_dedup

    ds = read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    # testdata embeddings have no true near-dups (max pairwise cosine
    # ~0.48) - 0.4 exercises the operator end-to-end on this corpus
    out = embedding_dedup(ds, cosine_threshold=0.4).to_pandas()
    if out.empty:  # no near-dups at this threshold → keep schema stable
        return pd.DataFrame({"src": pd.Series(dtype="int64"),
                             "dst": pd.Series(dtype="int64"),
                             "cosine": pd.Series(dtype="float64")})
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


def embedding_dup_pairs_exact(sf_dir: str) -> pd.DataFrame:
    """EXACT distributed all-pairs cosine ≥ τ join (triangle block-pair
    replication plan, stages/dedup.py::embedding_pairs_exact) with a full
    SQL oracle: DuckDB computes every pairwise cosine via
    list_cosine_similarity over the same parquet. Also the recall
    reference the LSH path (``embedding_neardup_pairs``) is tested
    against in pytest."""
    from ..stages.dedup import embedding_pairs_exact

    ds = read_table(_p(sf_dir, "embeddings"), columns=["vec_id", "embedding"])
    # threshold-margin guard (same failure mode ensure_knn_recall_artifacts
    # asserts against): the engine gates on numpy's unrounded cosine, the
    # oracle on DuckDB's list_cosine_similarity — a pair within float
    # summation-order noise of 0.4 could be included on one side only.
    # Run the exact join at (0.4 - margin) and REFUSE if any pair's cosine
    # sits inside the ±margin band, so a BLAS/platform change can never
    # flip set membership silently; then apply the real gate.
    margin = 1e-6
    out = embedding_pairs_exact(
        ds, cosine_threshold=0.4 - margin, num_blocks=8
    ).to_pandas()
    near = out[(out["cosine"] - 0.4).abs() < margin]
    if len(near):
        raise ValueError(
            "embedding_dup_pairs_exact: pair cosine within 1e-6 of the 0.4 "
            f"gate (ids {near[['src', 'dst']].values.tolist()[:3]}); the "
            "testdata no longer sits in a threshold gap — pick a new "
            "threshold for this fixture"
        )
    out = out[out["cosine"] >= 0.4].reset_index(drop=True)
    if out.empty:
        return pd.DataFrame(
            {
                "src": pd.Series(dtype="int64"),
                "dst": pd.Series(dtype="int64"),
                "cosine": pd.Series(dtype="float64"),
            }
        )
    out["cosine"] = out["cosine"].round(4)
    return out.sort_values(["src", "dst"]).reset_index(drop=True)


# float64 compute on both sides: the ::DOUBLE[] cast makes DuckDB lift the
# float32 parquet values to double BEFORE the dot/norms, matching the
# engine's float32→float64 cast; round(4) absorbs summation-order ulps
EMB_PAIRS_EXACT_SQL = """
SELECT src, dst, round(cosine, 4) AS cosine
FROM (
  SELECT a.vec_id AS src, b.vec_id AS dst,
         list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
           AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
)
WHERE cosine >= 0.4
ORDER BY src, dst
"""


def doc_stopword_removal(sf_dir: str) -> pd.DataFrame:
    """M9 stopword remover + M8-style cleaning over documents (rows-only;
    raw text column passes through untouched)."""
    from ..stages.filters import clean_tweets, remove_stopwords
    from ..stages.textstats import _STOPWORDS

    ds = read_table(_p(sf_dir, "documents"), columns=["doc_id", "text"])
    stop = set().union(*_STOPWORDS.values())
    out = remove_stopwords(clean_tweets(ds), stop).to_pandas()
    return out[["doc_id", "text", "clean_text", "content_text"]].sort_values(
        "doc_id"
    ).reset_index(drop=True)


# exact SQL mirror of clean_tweet_text (sequential regex passes, innermost
# first) + remove_stopwords (whitespace tokens, lowercase NOT IN list)
DOC_STOPWORDS_SQL = f"""
SELECT doc_id, text,
  trim(regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
    text, '(^|\\s)RT\\b', ' ', 'g'), '@\\w+', ' ', 'g'), '#(\\w+)', '\\1', 'g'),
    'https?://\\S+', ' ', 'g'), '\\s+', ' ', 'g')) AS clean_text,
  array_to_string(list_filter(string_split(text, ' '),
    w -> w <> '' AND lower(w) NOT IN ({_STOPS_SQL})), ' ') AS content_text
FROM documents ORDER BY doc_id
"""


def sense_degrees(sf_dir: str) -> pd.DataFrame:
    """F2 concept-graph degrees (INDEGREE / link_occ / generality) per
    sense, now a FULL SQL oracle: pinned to the fixed ER-quality fixture's
    link corpus so the oracle can ``read_parquet`` the same input (the
    ``er_quality`` oracle pattern); DuckDB parity over an arbitrary corpus
    is additionally asserted in tests/test_relatedness.py."""
    from ..state.relatedness import build_sense_degrees

    fx = _erq_fixture_dir()
    corp = os.path.join(fx, "link_corpus.parquet")
    out = build_sense_degrees(rd.read_parquet(corp), EngineConfig())
    out["generality"] = out["generality"].astype(float).round(6)
    return out.sort_values("sense_id").reset_index(drop=True)


SENSE_DEGREES_SQL = f"""
WITH l AS (
  SELECT sense_id, doc_id, count(*) AS occ
  FROM read_parquet('{_ERQ_DIR}/link_corpus.parquet')
  WHERE sense_id >= 0
  GROUP BY 1, 2
)
SELECT sense_id,
       CAST(count(*) AS BIGINT) AS indegree,
       CAST(sum(occ) AS BIGINT) AS link_occ,
       round(ln(count(*) + 1), 6) AS generality
FROM l GROUP BY sense_id ORDER BY sense_id
"""


def _side_table(fx: str, name: str) -> str:
    """Path to a generated side table (``translations`` / ``pageviews``),
    created on demand for fixture dirs written before these tables existed.
    Deterministic from the dir's ``entities.parquet`` + the dir's recorded
    fixture seed (``fixture_manifest.json``; pre-manifest dirs were all
    written with seed 42), so concurrent same-user writes are
    byte-identical and the atomic replace can interleave safely."""
    p = os.path.join(fx, f"{name}.parquet")
    if not os.path.exists(p):
        import json

        import pyarrow.parquet as pq

        from ..gen import gen_pageviews, gen_translations

        seed = 42
        try:
            with open(os.path.join(fx, "fixture_manifest.json")) as f:
                seed = int(json.load(f)["seed"])
        except (OSError, ValueError, KeyError):
            pass
        ents = pq.read_table(os.path.join(fx, "entities.parquet"))
        gen = gen_translations if name == "translations" else gen_pageviews
        tmp = f"{p}.tmp{os.getpid()}"
        pq.write_table(gen(ents, seed), tmp, row_group_size=32768)
        os.replace(tmp, p)
    return p


def sense_translations(sf_dir: str) -> pd.DataFrame:
    """J5 translations lookup (reference D7: ``WpmLoader.load_translations``,
    page_id → {langcode: title}; SURVEY.md §2.1 J5): enrich the sense
    registry with translated titles for a configured language set.

    Routed through the general gated join operator (J2): the lang-filtered
    translations side is small (≤ |senses| × |langs|) so the broadcast plan
    serves it; against a real dump the same call flips to the distributed
    sort-merge plan past the row gate — no driver-side lookup loop."""
    from ..functions.joins import join

    fx = _erq_fixture_dir()
    langs = pa.array(["de", "nl"])
    ents = read_table(
        os.path.join(fx, "entities.parquet"), columns=["sense_id", "title"]
    )
    trans = read_table(_side_table(fx, "translations")).map_batches(
        lambda t: t.filter(pc.is_in(t["lang"], value_set=langs)),
        batch_format="pyarrow",
    )
    out = (
        join(ents, trans, on="sense_id")
        .to_pandas()
        .sort_values(["sense_id", "lang"])
        .reset_index(drop=True)
    )
    return out[["sense_id", "title", "lang", "trans_title"]]


SENSE_TRANSLATIONS_SQL = f"""
SELECT e.sense_id, e.title, t.lang, t.trans_title
FROM read_parquet('{_ERQ_DIR}/entities.parquet') e
JOIN read_parquet('{_ERQ_DIR}/translations.parquet') t USING (sense_id)
WHERE t.lang IN ('de', 'nl')
ORDER BY e.sense_id, t.lang
"""


def sense_view_stats(sf_dir: str) -> pd.DataFrame:
    """F4 statistics features (reference ``StatisticsProcessor``: external
    per-article page-view statistics; SURVEY.md §2.1 F4) recast as a Parquet
    fact table — no external service. Per sense: total/max/mean daily views
    plus a week-over-week trend ratio.

    Scale shape: the pageviews table is |senses| × |days| (a fact table at
    dump scale), so the plan is a vectorized per-batch partial aggregate
    followed by the count-gated combine — the pre-aggregate-before-shuffle
    pattern, never a raw-row groupby exchange."""
    from ..functions.groupagg import sorted_grouped_agg

    fx = _erq_fixture_dir()
    pv = read_table(_side_table(fx, "pageviews"))

    _AGG = dict(
        views_sum=("views_sum", "sum"),
        views_max=("views_max", "max"),
        days_seen=("days_seen", "sum"),
        recent_sum=("recent_sum", "sum"),
        early_sum=("early_sum", "sum"),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.rename(columns={"views": "views_sum"})
        df["views_max"] = df["views_sum"]
        df["days_seen"] = np.int64(1)
        recent = df["day"].to_numpy() >= 7
        v = df["views_sum"].to_numpy()
        df["recent_sum"] = np.where(recent, v, 0)
        df["early_sum"] = np.where(recent, 0, v)
        return (
            df.groupby("sense_id", sort=False).agg(**_AGG).reset_index()
        )

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "sense_id": pd.Series(dtype="int64"),
                    **{k: pd.Series(dtype="int64") for k in _AGG},
                }
            )
        return df.groupby("sense_id", sort=False).agg(**_AGG).reset_index()

    out = sorted_grouped_agg(
        pv.map_batches(partial, batch_format="pandas"),
        "sense_id",
        combine,
        driver_gate=100_000,
    ).to_pandas()
    # per-key derived features on the final (small) aggregate
    out["views_avg"] = (out["views_sum"] / out["days_seen"]).round(6)
    out["trend_ratio"] = (
        out["recent_sum"] / out["early_sum"].clip(lower=1)
    ).round(6)
    return (
        out.drop(columns=["recent_sum", "early_sum"])
        .sort_values("sense_id")
        .reset_index(drop=True)
    )


SENSE_VIEW_STATS_SQL = f"""
SELECT sense_id,
       CAST(sum(views) AS BIGINT) AS views_sum,
       CAST(max(views) AS BIGINT) AS views_max,
       CAST(count(*) AS BIGINT) AS days_seen,
       round(CAST(sum(views) AS DOUBLE) / count(*), 6) AS views_avg,
       round(CAST(sum(CASE WHEN day >= 7 THEN views ELSE 0 END) AS DOUBLE)
             / greatest(sum(CASE WHEN day < 7 THEN views ELSE 0 END), 1), 6)
         AS trend_ratio
FROM read_parquet('{_ERQ_DIR}/pageviews.parquet')
GROUP BY sense_id ORDER BY sense_id
"""


def media_features(sf_dir: str) -> pd.DataFrame:
    """Multimodal plumbing: synthetic media table → decode/feature actor
    pool (deterministic fake decode; rows-only)."""
    from ..stages.multimodal import decode_features, synth_media_table

    tbl = synth_media_table(200, seed=42)
    out = decode_features(rd.from_arrow(tbl)).to_pandas()
    out["features"] = out["features"].apply(lambda v: list(np.round(v, 6)))
    return out.sort_values("media_id").reset_index(drop=True)


# ------------------------------------------------------------------ registry

CATALOG: dict[str, tuple[Callable[[str], Any], str | None]] = {
    # relational layer (T11) — full SQL oracles
    "q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "q6_revenue": (q6_revenue, Q6_SQL),
    "top_revenue_orders": (top_revenue_orders, TOP_REVENUE_SQL),
    "orders_by_nation": (orders_by_nation, ORDERS_BY_NATION_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "events_per_type": (events_per_type, EVENTS_PER_TYPE_SQL),
    "events_hourly": (events_hourly, EVENTS_HOURLY_SQL),
    "distinct_event_users": (distinct_event_users, DISTINCT_USERS_SQL),
    "filter_high_quantity": (filter_high_quantity, FILTER_SQL),
    "order_priority_revenue": (order_priority_revenue, ORDER_PRIORITY_SQL),
    "events_sample": (events_sample, EVENTS_SAMPLE_SQL),
    "events_sessionized": (events_sessionized, EVENTS_SESSION_SQL),
    "events_running_totals": (events_running_totals, EVENTS_RUNNING_SQL),
    "events_asof_orders": (events_asof_orders, EVENTS_ASOF_SQL),
    "customers_without_orders": (customers_without_orders, ANTI_JOIN_SQL),
    "orders_customer_outer": (orders_customer_outer, ORDERS_CUSTOMER_OUTER_SQL),
    "distinct_part_suppliers": (distinct_part_suppliers, DISTINCT_PS_SQL),
    # text / dedup / similarity — SQL where expressible
    "docs_by_lang": (docs_by_lang, DOCS_BY_LANG_SQL),
    "doc_token_counts": (doc_token_counts, DOC_TOKENS_SQL),
    # BM25 keyword retrieval — full SQL oracle (whole computation in SQL)
    "doc_bm25": (doc_bm25, DOC_BM25_SQL),
    # corpus word-count top-k + token-budget shard packing (full oracles)
    "corpus_top_terms": (corpus_top_terms_q, CORPUS_TOP_TERMS_SQL),
    "doc_token_shards": (doc_token_shards, DOC_TOKEN_SHARDS_SQL),
    # per-group deterministic sampling (training-data rebalancing)
    "docs_stratified_sample": (docs_stratified_sample, DOCS_STRATIFIED_SQL),
    # benchmark decontamination (word 5-gram overlap vs broadcast blocklist)
    "docs_contamination": (docs_contamination, DOCS_CONTAMINATION_SQL),
    # exact per-group discrete quantiles via the value-histogram plan
    "docs_length_quantiles": (docs_length_quantiles, DOCS_LENGTH_QUANTILES_SQL),
    # int8 embedding quantization (storage path) — integer summary oracle
    "embedding_quantized": (embedding_quantized, EMBEDDING_QUANTIZED_SQL),
    # Gopher/C4-style within-doc repetition quality signal
    "doc_repetition": (doc_repetition, DOC_REPETITION_SQL),
    # PII triage counts (email/URL/phone) — RE2-parity patterns
    "doc_pii_stats": (doc_pii_stats, DOC_PII_SQL),
    "exact_dedup_docs": (exact_dedup_docs, EXACT_DEDUP_SQL),
    "knn_cosine": (knn_cosine, KNN_SQL),
    "components_supplier_part": (components_supplier_part, COMPONENTS_SQL),
    # rows-only (non-SQL-expressible: sketches, models, actor state)
    "er_clusters": (er_clusters, None),
    "er_clusters_scatter": (er_clusters_scatter, None),
    "er_quality": (er_quality, ER_QUALITY_SQL),
    "er_cluster_assignments": (er_cluster_assignments, ER_CLUSTER_ASSIGN_SQL),
    "er_mentions": (er_mentions, ER_MENTIONS_SQL),
    # exact-verify mode: LSH candidates + content-fingerprint verify ≡ the
    # exact-text GROUP BY (see minhash_dedup_docs docstring)
    "minhash_dedup_docs": (minhash_dedup_docs, MINHASH_DEDUP_SQL),
    # exact distributed n-gram Jaccard join — full SQL oracle (self-join)
    "ngram_jaccard_pairs_docs": (ngram_jaccard_pairs_docs, NGRAM_JACCARD_SQL),
    # exact-verify mode (same promotion): simhash groups + fingerprint verify
    "simhash_docs": (simhash_docs, SIMHASH_DEDUP_SQL),
    "doc_quality": (doc_quality, DOC_QUALITY_SQL),
    "doc_langid": (doc_langid, DOC_LANGID_SQL),
    "doc_fingerprints": (doc_fingerprints, DOC_FINGERPRINTS_SQL),
    "knn_lsh_cosine": (knn_lsh_cosine, None),
    "knn_lsh_recall": (knn_lsh_recall, KNN_LSH_RECALL_SQL),
    # IVF ANN scale path — picks rows-only, recall hash-gated via SQL
    "knn_ivf_cosine": (knn_ivf_cosine, None),
    "knn_ivf_recall": (knn_ivf_recall, KNN_IVF_RECALL_SQL),
    # int8 storage-path scan — recall hash-gated via SQL
    "knn_quantized_recall": (knn_quantized_recall, KNN_QUANTIZED_RECALL_SQL),
    "embedding_neardup_pairs": (embedding_neardup_pairs, None),
    "embedding_neardup_recall": (embedding_neardup_recall, EMBND_RECALL_SQL),
    # exact all-pairs cosine join — full SQL oracle (list_cosine_similarity)
    "embedding_dup_pairs_exact": (embedding_dup_pairs_exact, EMB_PAIRS_EXACT_SQL),
    "sense_degrees": (sense_degrees, SENSE_DEGREES_SQL),
    # J5 translations lookup / F4 external statistics — full SQL oracles
    "sense_translations": (sense_translations, SENSE_TRANSLATIONS_SQL),
    "sense_view_stats": (sense_view_stats, SENSE_VIEW_STATS_SQL),
    "doc_stopword_removal": (doc_stopword_removal, DOC_STOPWORDS_SQL),
    "media_features": (media_features, None),
}
