"""Catalog queries vs their own DuckDB oracles at sf0.001 (fast gate;
the driver re-runs the same comparison at sf0.01)."""

import duckdb
import numpy as np
import pandas as pd
import pytest

from semanticizer_ray.pipelines.catalog import CATALOG

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

SQL_QUERIES = [name for name, (_f, sql) in CATALOG.items() if sql is not None]


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", SQL_QUERIES)
def test_query_matches_oracle(ray_session, con, name):
    fn, sql = CATALOG[name]
    got = fn(SF_DIR)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    want = con.sql(sql).df()
    got_c, want_c = _canon(got), _canon(want)
    assert list(got_c.columns) == list(want_c.columns), (
        f"{name}: columns {list(got_c.columns)} vs {list(want_c.columns)}"
    )
    assert len(got_c) == len(want_c), f"{name}: rows {len(got_c)} vs {len(want_c)}"
    pd.testing.assert_frame_equal(got_c, want_c, check_dtype=False, atol=1e-6)


ROWS_ONLY = [name for name, (_f, sql) in CATALOG.items() if sql is None]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(ray_session, name):
    fn, _ = CATALOG[name]
    out = fn(SF_DIR)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    assert len(out) >= 0 and len(out.columns) > 0
    # deterministic: second run identical
    out2 = fn(SF_DIR)
    if not isinstance(out2, pd.DataFrame):
        out2 = out2.to_pandas()
    pd.testing.assert_frame_equal(out, out2)
