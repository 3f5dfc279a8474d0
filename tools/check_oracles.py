"""Driver-style oracle comparison at sf0.01 for changed/new queries.

Usage: python tools/check_oracles.py [query_name ...]   (default: a spot set;
pass names from CATALOG to check specific entries, e.g. after editing one).
Mirrors the driver: sorts columns by name, compares rows/schema/values.
"""
import sys

import duckdb
import pandas as pd
import ray

ray.init(address="local", num_cpus=16, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext

DataContext.get_current().enable_progress_bars = False

sys.path.insert(0, "/root/repo")
from semanticizer_ray.pipelines.catalog import CATALOG

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

names = sys.argv[1:] or [
    "revenue_by_nation", "order_priority_revenue", "events_sample",
    "events_sessionized", "docs_by_lang", "events_asof_orders",
    "doc_stopword_removal", "events_running_totals",
]
for name in names:
    fn, sql = CATALOG[name]
    got = fn(SF)
    if not isinstance(got, pd.DataFrame):
        got = got.to_pandas()
    if sql is None:
        print(f"{name}: rows-only, {len(got)} rows")
        continue
    want = con.execute(sql).df()
    ok_rows = len(got) == len(want)
    gs = got[sorted(got.columns)].reset_index(drop=True)
    ws = want[sorted(want.columns)].reset_index(drop=True)
    ok_schema = list(gs.columns) == list(ws.columns) and all(
        str(a) == str(b) for a, b in zip(gs.dtypes, ws.dtypes)
    )
    try:
        pd.testing.assert_frame_equal(gs, ws, check_exact=True)
        ok_hash = True
    except AssertionError as e:
        ok_hash = False
        err = str(e).splitlines()[:6]
    print(f"{name}: rows={ok_rows} ({len(got)}/{len(want)}) schema={ok_schema} hash={ok_hash}")
    if not ok_schema:
        print("   got:", dict(zip(gs.columns, map(str, gs.dtypes))))
        print("  want:", dict(zip(ws.columns, map(str, ws.dtypes))))
    if not ok_hash:
        print("  ", "\n   ".join(err))
ray.shutdown()
