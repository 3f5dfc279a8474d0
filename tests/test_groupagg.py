"""Vectorized grouped-agg utilities vs pandas ground truth."""

import numpy as np
import pandas as pd
import pytest

from semanticizer_ray.functions.groupagg import (
    group_starts,
    grouped_count,
    sorted_apply_exact,
    sorted_grouped_agg,
)


def _df(n=50000, k=500, seed=0):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "k": rng.integers(0, k, n).astype(str),
            "v": rng.random(n),
        }
    )


def test_group_starts():
    s = group_starts(np.array(["a", "a", "b", "b", "b", "c"]))
    assert list(s) == [0, 2, 5]
    assert list(group_starts(np.array([]))) == []
    # multi-key
    s2 = group_starts(np.array([1, 1, 1, 2]), np.array(["x", "x", "y", "y"]))
    assert list(s2) == [0, 2, 3]


def test_grouped_count(ray_session):
    import ray.data as rd

    df = _df()
    got = grouped_count(rd.from_pandas(df).repartition(8), "k").to_pandas()
    want = df.groupby("k").size().reset_index(name="n")
    m = got.sort_values("k").reset_index(drop=True).merge(want, on="k", suffixes=("_g", "_w"))
    assert len(m) == len(want)
    assert (m["n_g"] == m["n_w"]).all()


def test_sorted_grouped_agg_sum(ray_session):
    import ray.data as rd

    df = _df()

    def combine(d: pd.DataFrame) -> pd.DataFrame:
        return d.groupby("k", sort=False)["v"].sum().reset_index()

    got = sorted_grouped_agg(rd.from_pandas(df).repartition(8), "k", combine).to_pandas()
    want = df.groupby("k")["v"].sum().reset_index()
    m = got.merge(want, on="k", suffixes=("_g", "_w"))
    assert len(m) == len(want) == len(got)
    assert np.allclose(m["v_g"], m["v_w"])


def test_sorted_apply_exact_full_groups(ray_session):
    """Every group arrives complete exactly once (pair-count check)."""
    import ray.data as rd

    df = _df(n=20000, k=100)

    def apply_block(d: pd.DataFrame) -> pd.DataFrame:
        if len(d) == 0:
            return pd.DataFrame({"k": [], "sz": []})
        g = d.groupby("k", sort=False).size().reset_index(name="sz")
        return g

    got = sorted_apply_exact(rd.from_pandas(df).repartition(16), "k", apply_block).to_pandas()
    want = df.groupby("k").size().reset_index(name="sz")
    # exactness: each key appears exactly once with the full group size
    assert got["k"].is_unique
    m = got.merge(want, on="k", suffixes=("_g", "_w"))
    assert len(m) == len(want)
    assert (m["sz_g"] == m["sz_w"]).all()


def test_grouped_quantiles_disc_matches_duckdb_and_validates(ray_session):
    """Histogram-plan quantiles == DuckDB quantile_disc on a fresh random
    frame (many ties, skewed group sizes); q validation raises."""
    import duckdb
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from semanticizer_ray.functions.groupagg import grouped_quantiles_disc

    rng = np.random.default_rng(17)
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=997, p=[0.8, 0.15, 0.05]),
            "v": rng.integers(0, 25, size=997).astype("int64"),
        }
    )
    got = (
        grouped_quantiles_disc(rd.from_pandas(df).repartition(5), "g", "v")
        .to_pandas()
        .sort_values("g")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("t", df)
    want = con.execute(
        """SELECT g, CAST(count(*) AS BIGINT) AS n,
                  CAST(quantile_disc(v, 0.25) AS BIGINT) AS q25,
                  CAST(quantile_disc(v, 0.5) AS BIGINT) AS q50,
                  CAST(quantile_disc(v, 0.9) AS BIGINT) AS q90
           FROM t GROUP BY g ORDER BY g"""
    ).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)

    with pytest.raises(ValueError, match="quantiles"):
        grouped_quantiles_disc(rd.from_pandas(df), "g", "v", qs=(0.0,))
    with pytest.raises(ValueError, match="collide"):
        grouped_quantiles_disc(rd.from_pandas(df), "g", "v", qs=(0.501, 0.504))
