"""General join operator (SURVEY.md J2): both physical plans vs pandas oracle."""

import numpy as np
import pandas as pd
import pytest

from semanticizer_ray.functions.joins import join


@pytest.fixture(scope="module")
def sides(ray_session):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {
            "k": rng.integers(0, 50, 300),
            "lv": rng.standard_normal(300).round(4),
        }
    )
    right = pd.DataFrame(
        {
            "k": rng.integers(20, 70, 120),  # partial overlap, dup keys
            "rv": rng.integers(0, 1000, 120),
        }
    )
    return left, right


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    return (
        df[sorted(df.columns)]
        .sort_values(sorted(df.columns), kind="stable")
        .reset_index(drop=True)
    )


@pytest.mark.parametrize("how", ["inner", "left", "semi", "anti"])
def test_join_both_plans_match_pandas(sides, how):
    import ray.data as rd

    left, right = sides
    if how in ("inner", "left"):
        want = left.merge(right, on="k", how=how)
    else:
        hit = left["k"].isin(set(right["k"]))
        want = left[hit if how == "semi" else ~hit]

    for gate in (10**6, 0):  # broadcast plan, then forced sort-merge plan
        got = join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
            broadcast_gate=gate,
        ).to_pandas()
        pd.testing.assert_frame_equal(
            _sorted(got), _sorted(want), check_dtype=False
        ), (how, gate)


def test_join_multi_key(sides, ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    left = pd.DataFrame(
        {"a": rng.integers(0, 5, 100), "b": rng.integers(0, 5, 100), "x": range(100)}
    )
    right = pd.DataFrame(
        {"a": rng.integers(0, 5, 40), "b": rng.integers(0, 5, 40), "y": range(40)}
    )
    want = left.merge(right, on=["a", "b"], how="inner")
    for gate in (10**6, 0):
        got = join(
            rd.from_pandas(left), rd.from_pandas(right), on=["a", "b"],
            broadcast_gate=gate,
        ).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), _sorted(want), check_dtype=False)


def test_join_sort_merge_hot_key(ray_session):
    """A heavily skewed key (80% of the probe side, straddling many blocks)
    still joins exactly on the forced sort-merge plan — the straddling
    group routes through the boundary remainder."""
    import numpy as np
    import ray.data as rd

    from semanticizer_ray.functions.joins import join

    rng = np.random.default_rng(3)
    n = 20_000
    keys = np.where(rng.random(n) < 0.8, 7, rng.integers(0, 50, size=n))
    left = pd.DataFrame({"k": keys, "v": np.arange(n)})
    right = pd.DataFrame({"k": np.arange(50), "name": [f"n{i}" for i in range(50)]})
    got = (
        join(
            rd.from_pandas(left).repartition(16),
            rd.from_pandas(right).repartition(4),
            on="k",
            broadcast_gate=0,
        )
        .to_pandas()
        .sort_values(["k", "v"])
        .reset_index(drop=True)
    )
    want = left.merge(right, on="k").sort_values(["k", "v"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[["k", "v", "name"]], want[["k", "v", "name"]])


@pytest.mark.parametrize("how", ["right", "full"])
def test_join_outer_plans_match_pandas(sides, how):
    """right/full keep unmatched build rows; always the sort-merge plan
    (unmatched-build emission needs complete key groups), but the public
    gate parameter must not change the answer."""
    import ray.data as rd

    left, right = sides
    want = left.merge(right, on="k", how={"right": "right", "full": "outer"}[how])
    for gate in (10**6, 0):
        got = join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", how=how,
            broadcast_gate=gate,
        ).to_pandas()
        pd.testing.assert_frame_equal(
            _sorted(got), _sorted(want), check_dtype=False
        ), (how, gate)


def test_join_left_int_dtypes_stable_across_plans(sides):
    """ADVICE r2: the broadcast plan must restore source Arrow types like
    the sort-merge plan does — int build columns stay int64 (with nulls for
    unmatched probe rows), on BOTH physical plans."""
    import pyarrow as pa
    import ray.data as rd

    left, right = sides
    for gate in (10**6, 0):
        out = join(
            rd.from_pandas(left), rd.from_pandas(right), on="k", how="left",
            broadcast_gate=gate,
        )
        schema = out.schema(fetch_if_missing=True)
        types = dict(zip(schema.names, schema.types))
        assert types["rv"] == pa.int64(), (gate, types)
        assert types["k"] == pa.int64(), (gate, types)


def test_restore_types_raises_with_column_name():
    """A column that cannot round-trip to its source Arrow type must raise
    naming the column — not silently emit a differently-typed block (the
    ray-2.49 mixed-block hazard)."""
    import pyarrow as pa

    from semanticizer_ray.functions.joins import _restore_types

    schema = pa.schema([("k", pa.int64()), ("v", pa.int64())])
    bad = pd.DataFrame({"k": [1, 2], "v": ["one", "two"]})
    with pytest.raises(ValueError, match="v .expected int64"):
        _restore_types(bad, schema)


def test_join_rejects_column_collision(sides, ray_session):
    import ray.data as rd

    left, right = sides
    bad = right.rename(columns={"rv": "lv"})
    with pytest.raises(ValueError, match="collision"):
        join(rd.from_pandas(left), rd.from_pandas(bad), on="k", broadcast_gate=0)


def test_asof_distributed_matches_broadcast(ray_session):
    import ray.data as rd

    from semanticizer_ray.pipelines.streaming import (
        asof_latest_order,
        asof_latest_order_distributed,
    )

    rng = np.random.default_rng(11)
    n_keys = 8
    base = pd.Timestamp("2024-01-01")
    events = pd.DataFrame(
        {
            "event_id": np.arange(400, dtype="int64"),
            "user_id": rng.integers(0, 40, 400),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, 400), unit="s"),
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(150, dtype="int64"),
            "o_custkey": rng.integers(0, n_keys, 150),
            "o_orderdate": base + pd.to_timedelta(rng.integers(0, 10**6, 150), unit="s"),
        }
    )
    # plant equal-date ties to exercise the max-orderkey tie-break
    orders.loc[10:20, "o_orderdate"] = base + pd.Timedelta(seconds=500)

    bcast = (
        asof_latest_order(rd.from_pandas(events), orders, n_keys)
        .to_pandas()[["event_id", "user_id", "o_orderkey"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    dist = (
        asof_latest_order_distributed(
            rd.from_pandas(events), rd.from_pandas(orders), n_keys
        )
        .to_pandas()[["event_id", "user_id", "o_orderkey"]]
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(bcast, dist, check_dtype=False)
