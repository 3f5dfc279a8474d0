"""Streaming-shaped operators over the ordered ``events`` log.

Ray Data has no event-time windows/watermarks (ray_guide §streaming): the
idiom is "ordered, partitioned log → key-sorted complete groups →
vectorized window logic per group". All three operators here run through
``sorted_apply_exact(key=user_id)`` with the per-block logic fully
vectorized (pandas shift/cumsum over group-transformed columns), and each
has an exact DuckDB window-function oracle.

- ``sessionize``     session ids per user with a gap timeout (the classic
                     lag(ts) > gap → new-session cumsum)
- ``running_totals`` per-user running sum / row number ordered by ts
- ``asof_latest_order`` as-of (backward) join: each event picks the latest
                     order of the same key at-or-before its timestamp —
                     the merge_asof-per-bucket pattern (SURVEY.md J-asof)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.groupagg import sorted_apply_exact

SESSION_GAP_MIN = 30


def sessionize(events: rd.Dataset, gap_minutes: int = SESSION_GAP_MIN) -> rd.Dataset:
    """(event_id, user_id, ts, session_id) — session_id is 1-based per user,
    ordered by (ts, event_id); a gap > ``gap_minutes`` starts a new session."""
    gap = np.timedelta64(gap_minutes * 60, "s")

    def per_user_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "session_id": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        prev_ts = df.groupby("user_id", sort=False)["ts"].shift(1)
        new_sess = (df["ts"] - prev_ts > gap) | prev_ts.isna()
        sess = new_sess.groupby(df["user_id"], sort=False).cumsum()
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "ts": df["ts"],
                "session_id": sess.astype("int64"),
            }
        )

    return sorted_apply_exact(
        events.select_columns(["event_id", "user_id", "ts"]), "user_id", per_user_block
    )


def running_totals(events: rd.Dataset) -> rd.Dataset:
    """(event_id, user_id, ts, running_value, row_num) ordered by (ts,
    event_id) within user — cumulative sum of ``value`` and 1-based rank."""

    def per_user_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "running_value": pd.Series(dtype="float64"),
                    "row_num": pd.Series(dtype="int64"),
                }
            )
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        g = df.groupby("user_id", sort=False)
        return pd.DataFrame(
            {
                "event_id": df["event_id"],
                "user_id": df["user_id"],
                "running_value": g["value"].cumsum(),
                "row_num": (g.cumcount() + 1).astype("int64"),
            }
        )

    return sorted_apply_exact(
        events.select_columns(["event_id", "user_id", "ts", "value"]),
        "user_id",
        per_user_block,
    )


def asof_latest_order(events: rd.Dataset, orders_df: pd.DataFrame, n_keys: int) -> rd.Dataset:
    """Backward as-of join: for each event, the latest order (by
    o_orderdate) of key ``user_id % n_keys == o_custkey % n_keys`` family —
    here keyed directly on ``o_custkey = user_id % max_cust`` to give the
    testdata tables a shared key domain. Orders are the small side
    (broadcast + ``pd.merge_asof`` per batch, sorted within batch)."""
    import ray

    # Sort by (o_orderdate, o_orderkey): merge_asof(direction="backward")
    # picks the LAST matching row, so equal-date ties deterministically
    # resolve to the max o_orderkey (matches the oracle's
    # ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) regardless of
    # the input file's row order.
    orders_sorted = orders_df.sort_values(["o_orderdate", "o_orderkey"])
    ref = ray.put(orders_sorted)

    def attach(batch: pd.DataFrame) -> pd.DataFrame:
        od = ray.get(ref)
        b = batch[["event_id", "user_id", "ts"]].copy()
        b["join_key"] = (b["user_id"] % n_keys).astype("int64")
        b = b.sort_values("ts")
        out = pd.merge_asof(
            b,
            od[["o_orderdate", "o_orderkey", "o_custkey"]],
            left_on="ts",
            right_on="o_orderdate",
            left_by="join_key",
            right_by="o_custkey",
            direction="backward",
        )
        return out[["event_id", "user_id", "o_orderkey", "o_orderdate"]]

    return events.map_batches(attach, batch_format="pandas", batch_size=65536)


def asof_latest_order_distributed(
    events: rd.Dataset, orders: rd.Dataset, n_keys: int
) -> rd.Dataset:
    """Same semantics as ``asof_latest_order`` with NO broadcast: both sides
    union under one schema keyed by the join key, one range-partitioned sort
    co-locates each key's events and orders, and ``pd.merge_asof`` runs per
    complete key group — the scale plan when orders is itself a fact table
    (SURVEY.md J2 bucket-join pattern applied to an as-of join)."""
    import pyarrow as pa

    def ev_rows(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        n = batch.num_rows
        jk = pc.subtract(
            pc.cast(batch["user_id"], pa.int64()),
            pc.multiply(
                pc.divide(pc.cast(batch["user_id"], pa.int64()),
                          pa.scalar(n_keys, pa.int64())),
                pa.scalar(n_keys, pa.int64()),
            ),
        )  # user_id % n_keys (non-negative ids)
        return pa.table(
            {
                "join_key": jk,
                "kind": pa.array(["e"] * n, pa.string()),
                "event_id": batch["event_id"],
                "user_id": batch["user_id"],
                "ts": batch["ts"],
                "o_orderkey": pa.nulls(n, pa.int64()),
                "o_orderdate": pa.nulls(n, batch["ts"].type),
            }
        )

    def od_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        return pa.table(
            {
                "join_key": batch["o_custkey"],
                "kind": pa.array(["o"] * n, pa.string()),
                "event_id": pa.nulls(n, pa.int64()),
                "user_id": pa.nulls(n, pa.int64()),
                "ts": pa.nulls(n, batch["o_orderdate"].type),
                "o_orderkey": batch["o_orderkey"],
                "o_orderdate": batch["o_orderdate"],
            }
        )

    combined = events.select_columns(["event_id", "user_id", "ts"]).map_batches(
        ev_rows, batch_format="pyarrow"
    ).union(
        orders.select_columns(["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
            od_rows, batch_format="pyarrow"
        )
    )

    def asof_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "o_orderkey": pd.Series(dtype="int64"),
                    "o_orderdate": pd.Series(dtype="datetime64[us]"),
                }
            )
        ev = df.loc[
            df["kind"] == "e", ["join_key", "event_id", "user_id", "ts"]
        ].sort_values("ts")
        od = df.loc[df["kind"] == "o", ["join_key", "o_orderkey", "o_orderdate"]]
        # equal-date ties resolve to max o_orderkey (same rule as the
        # broadcast path / oracle)
        od = od.sort_values(["o_orderdate", "o_orderkey"])
        out = pd.merge_asof(
            ev,
            od,
            left_on="ts",
            right_on="o_orderdate",
            by="join_key",
            direction="backward",
        )
        ok = out["o_orderkey"]
        if ok.notna().all():  # keep int64 when every event matched (the
            ok = ok.astype("int64")  # broadcast path's dtype behavior)
        return pd.DataFrame(
            {
                "event_id": out["event_id"].astype("int64"),
                "user_id": out["user_id"].astype("int64"),
                "o_orderkey": ok,
                "o_orderdate": out["o_orderdate"],
            }
        )

    return sorted_apply_exact(combined, "join_key", asof_block)
