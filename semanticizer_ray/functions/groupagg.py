"""Vectorized distributed grouped aggregation (the engine's shuffle core).

Why this exists: in ray 2.49, ``groupby().aggregate()`` accumulates PER ROW
in Python (~35 s for a 100k-row Sum measured in this sandbox) and
``groupby().map_groups()`` constructs a pandas DataFrame PER GROUP (~2 ms
each — 40 s for 20k groups). Both are unusable in hot paths. The pattern
here is ~100× faster, fully streaming, and preserves block parallelism:

1. (optional) ``map_batches(combine)`` — vectorized partial aggregation per
   batch, shrinking the shuffle input to ≤ one row per (key, batch);
2. ``sort(key)`` — Ray's range-partitioned distributed sort (Arrow-native);
3. per-BLOCK vectorized apply/combine with BLOCK-LOCAL edge handling:
   after the sort, a key group can only straddle block boundaries, and a
   straddling key is by construction the FIRST or LAST key of every block
   that holds it. Each block therefore routes its own first/last-key rows
   to the remainder and processes the rest as complete groups — no global
   boundary-key collection pass, no driver-broadcast edge set. A key that
   is on a block edge without actually straddling rides the remainder too
   (all its rows — it still processes as one complete group there).

Two flavors:

- ``sorted_grouped_agg`` with an ASSOCIATIVE combiner (``pre_combine=True``
  asserts associativity — the pre-pass already recombines partials): the
  per-block combine and the edge marking fuse into the SORT's own pipeline
  (one distributed execution), and the remainder is ≤ 2 combined rows per
  block — always driver-tiny.
- ``sorted_apply_exact`` (and ``sorted_grouped_agg`` with
  ``pre_combine=False``) for ORDER-SENSITIVE / apply-once group functions:
  the function is applied exactly once per complete key group (interior
  groups per block, edge-key groups in the remainder partition).

``combine`` contract (sorted_grouped_agg): pandas DataFrame (any mix of raw
and partial rows) → one combined row per key present, vectorized over the
whole frame; with ``pre_combine=True`` it must additionally be associative
+ commutative + idempotent on combined rows; must return correct-schema
output for an empty input.

``apply_block`` contract (sorted_apply_exact): receives only COMPLETE key
groups (several at once, key-sorted) and may emit any shape; must handle
empty input.
"""

from __future__ import annotations

import os
import sys
import time
from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd


def _t0() -> float:
    return time.perf_counter()


def _tlog(label: str, t0: float) -> None:
    """Driver-side step timing, printed when GRAFT_TIMING=1 (scaling work)."""
    if os.environ.get("GRAFT_TIMING") == "1":
        print(f"[groupagg-timing] {label}: {time.perf_counter() - t0:.2f}s")


# boundary-remainder rows at or below this count apply on the driver
# (one tiny pull; callers bound group size — salting / caps, SURVEY.md §4)
REMAINDER_DRIVER_GATE = 200_000

# remainder rows beyond CENSUS_FACTOR × the driver gate trigger a stderr
# key census: output stays exact, but a remainder that large means an
# unbounded straddling group is serializing through one task — a caller
# bug (missing salting / cap) that must not stay silent
REMAINDER_CENSUS_FACTOR = 10

_REM = "__rem"  # block-edge marker column (internal, stripped before output)


def _keys_list(key: str | list[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def _edge_mask(df: pd.DataFrame, keys: list[str]) -> np.ndarray:
    """Rows whose key tuple equals this block's first or last key — the
    only groups that can straddle a block boundary after a key sort."""
    n = len(df)
    if n == 0:
        return np.zeros(0, dtype=bool)
    mask = np.zeros(n, dtype=bool)
    first = np.ones(n, dtype=bool)
    last = np.ones(n, dtype=bool)
    for k in keys:
        col = df[k].to_numpy()
        first &= col == col[0]
        last &= col == col[-1]
    mask = first | last
    return mask


def _from_frame(out) -> rd.Dataset:
    import pyarrow as _pa

    return rd.from_arrow(out) if isinstance(out, _pa.Table) else rd.from_pandas(out)


def _apply_remainder(
    rem_src: rd.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
) -> rd.Dataset | None:
    """Process the (materialized) remainder rows as one complete-group
    application: on the driver below the count gate (one tiny pull + one
    local fn call — saves the ~5 s repartition+sort+map fixed cost PER
    grouped op), in one distributed task above it. Returns None when the
    remainder produced no rows. An UNBOUNDED straddling group serializes
    here; that is the caller's bug (salting / caps bound group size) — and
    a remainder beyond REMAINDER_CENSUS_FACTOR × the gate prints a key
    census to stderr naming the offenders instead of serializing silently."""
    cnt = rem_src.count()
    if cnt > REMAINDER_CENSUS_FACTOR * REMAINDER_DRIVER_GATE:
        kdf = rem_src.select_columns(keys).to_pandas()
        top = kdf.value_counts(subset=keys).head(5)
        print(
            f"[groupagg] WARNING: remainder holds {cnt} rows "
            f"(> {REMAINDER_CENSUS_FACTOR}x the {REMAINDER_DRIVER_GATE}-row "
            f"driver gate) and will serialize through one task. Largest "
            f"straddling keys: {top.to_dict()}. Output stays exact; bound "
            "the group size upstream (salt the key / cap the block).",
            file=sys.stderr,
        )
    if cnt <= REMAINDER_DRIVER_GATE:
        pdf = rem_src.to_pandas()
        out = fn(pdf.sort_values(keys, kind="stable")) if len(pdf) else fn(pdf)
        if len(out) == 0:
            return None
        return _from_frame(out)
    return (
        rem_src.repartition(1)
        .sort(keys)
        .map_batches(fn, batch_format="pandas", batch_size=None)
    )


def sorted_grouped_agg(
    ds: rd.Dataset,
    key: str | list[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    pre_combine: bool = True,
    driver_gate: int = 0,
) -> rd.Dataset:
    """Exactly one combined row per key (see module docstring).

    ``driver_gate`` > 0 enables a count-gated small-side fast path: after
    the vectorized pre-combine, if the partial row count is at or below the
    gate the final combine happens on the driver (one vectorized pandas
    call — right for metadata-sized aggregations like key censuses and
    pair dedup at test scale); above the gate the distributed path runs
    unchanged, so 100 TB inputs never touch the driver.

    ``pre_combine=False`` signals the combiner may be order-sensitive
    (e.g. ordered concat) — it is then applied exactly once per complete
    group via the group-exact path instead of the fused per-block path.
    """
    keys = _keys_list(key)
    if pre_combine:
        ds = ds.map_batches(combine, batch_format="pandas")
    if driver_gate > 0:
        ds = ds.materialize()
        if ds.count() <= driver_gate:
            import ray

            pdf = ds.to_pandas()
            if pdf.empty:
                out = combine(pdf)
            else:
                out = combine(pdf.sort_values(keys, kind="stable"))
            # split the result back into blocks: a single-block dataset
            # would serialize every downstream map stage
            n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)))
            return rd.from_pandas(out).repartition(min(n_blocks, max(1, len(out))))
    if not pre_combine:
        # order-sensitive combiner: complete groups, applied exactly once
        return sorted_apply_exact(ds, keys, combine)

    # associative combiner: per-block combine + edge-mark FUSED into the
    # sort's execution — one distributed pipeline, then a driver-tiny
    # remainder (≤ 2 combined rows per block by the one-row-per-key
    # contract)
    def combine_mark(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            out = combine(df).copy()
            out[_REM] = pd.Series(dtype=bool)
            return out
        out = combine(df).copy()
        # mark combined rows whose FULL key tuple equals this block's
        # first or last input key tuple
        first_t = np.ones(len(out), dtype=bool)
        last_t = np.ones(len(out), dtype=bool)
        for k in keys:
            col = out[k].to_numpy()
            first_t &= col == df[k].iloc[0]
            last_t &= col == df[k].iloc[-1]
        out[_REM] = first_t | last_t
        return out

    t0 = _t0()
    marked = (
        ds.sort(keys)
        .map_batches(combine_mark, batch_format="pandas", batch_size=None)
        .materialize()
    )
    _tlog(f"agg[{keys}] sort+combine_mark", t0)

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        return df[~df[_REM]].drop(columns=[_REM])

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df[df[_REM]].drop(columns=[_REM])

    out_interior = marked.map_batches(interior, batch_format="pandas", batch_size=None)
    t0 = _t0()
    rem_src = marked.map_batches(
        edge_rows, batch_format="pandas", batch_size=None
    ).materialize()
    rem = _apply_remainder(rem_src, keys, combine)
    _tlog(f"agg[{keys}] edge+remainder", t0)
    return out_interior if rem is None else out_interior.union(rem)


def sorted_apply_exact(
    ds: rd.Dataset,
    key: str | list[str],
    apply_block: Callable[[pd.DataFrame], pd.DataFrame],
    assume_sorted: bool = False,
) -> rd.Dataset:
    """Per-group apply with EXACT group boundaries, vectorized per block.

    ``assume_sorted=True``: the input is already key-sorted AND
    materialized (the caller reuses its own sorted exchange).

    Oversized single-key groups all land in the remainder partition — the
    caller bounds group size (salting; SURVEY.md §4 skew row).
    """
    keys = _keys_list(key)
    t0 = _t0()
    sorted_ds = ds if assume_sorted else ds.sort(keys).materialize()
    if not assume_sorted:
        _tlog(f"apply[{keys}] sort", t0)

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        return apply_block(df[~_edge_mask(df, keys)])

    def edge_rows(df: pd.DataFrame) -> pd.DataFrame:
        return df[_edge_mask(df, keys)]

    out_interior = sorted_ds.map_batches(
        interior, batch_format="pandas", batch_size=None
    )
    t0 = _t0()
    rem_src = sorted_ds.map_batches(
        edge_rows, batch_format="pandas", batch_size=None
    ).materialize()
    rem = _apply_remainder(rem_src, keys, apply_block)
    _tlog(f"apply[{keys}] edge+remainder", t0)
    return out_interior if rem is None else out_interior.union(rem)


def group_starts(*key_arrays: np.ndarray) -> np.ndarray:
    """Start indices of each key group in already-sorted key arrays."""
    n = len(key_arrays[0])
    if n == 0:
        return np.array([], dtype=np.int64)
    change = np.zeros(n, dtype=bool)
    change[0] = True
    for arr in key_arrays:
        a = np.asarray(arr)
        change[1:] |= a[1:] != a[:-1]
    return np.flatnonzero(change)


def grouped_count(
    ds: rd.Dataset, key: str, out_col: str = "n", driver_gate: int = 0
) -> rd.Dataset:
    """Vectorized distributed count-per-key (optionally count-gated)."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            if key in getattr(df, "columns", []):
                base = df[[key]].copy()
            else:
                base = pd.DataFrame({key: pd.Series(dtype="object")})
            base[out_col] = pd.Series(dtype="int64")
            return base
        if out_col in df.columns:
            return df.groupby(key, sort=False)[out_col].sum().reset_index()
        return df.groupby(key, sort=False).size().reset_index(name=out_col)

    return sorted_grouped_agg(ds, key, combine, driver_gate=driver_gate)


def grouped_quantiles_disc(
    ds: rd.Dataset,
    key: str,
    value_col: str,
    qs: tuple[float, ...] = (0.25, 0.5, 0.9),
) -> rd.Dataset:
    """Exact per-group DISCRETE quantiles (DuckDB ``quantile_disc``
    semantics: sorted[ceil(q*n) - 1]) for an integer-valued column —
    scale-safe via the value-histogram plan: each batch pre-aggregates
    to (key, value, cnt) rows, the sorted exchange carries only the
    HISTOGRAM (distinct values per key, not rows), and the per-group
    walk picks quantiles from cumulative counts. A skewed key (one group
    = most of the corpus) costs its distinct-value count, never its row
    count. Output: (key, n, q<pct>...) — all-integer, hash-gate-safe."""
    for q in qs:
        if not (0.0 < q <= 1.0):
            raise ValueError(f"quantiles must be in (0, 1], got {q}")
    qcols = [f"q{int(round(q * 100))}" for q in qs]
    if len(set(qcols)) != len(qcols):
        raise ValueError(f"quantiles {qs} collide after q<pct> naming")

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby([key, value_col], sort=False)
            .size()
            .reset_index(name="cnt")
        )

    def per_key(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            cols = {key: pd.Series(dtype="object"), "n": pd.Series(dtype="int64")}
            cols.update({c: pd.Series(dtype="int64") for c in qcols})
            return pd.DataFrame(cols)
        # partials for the same (key, value) may arrive from many blocks
        hist = (
            df.groupby([key, value_col], sort=False)["cnt"]
            .sum()
            .reset_index()
            .sort_values([key, value_col], kind="stable")
        )
        out_rows = []
        keys = hist[key].to_numpy()
        vals = hist[value_col].to_numpy()
        cnts = hist["cnt"].to_numpy(dtype=np.int64)
        starts = np.append(group_starts(keys), len(hist))
        for lo, hi in zip(starts[:-1], starts[1:]):
            csum = np.cumsum(cnts[lo:hi])
            n = int(csum[-1])
            row = {key: keys[lo], "n": n}
            for q, c in zip(qs, qcols):
                rank = max(int(np.ceil(q * n)), 1)  # 1-based target rank
                row[c] = int(vals[lo:hi][np.searchsorted(csum, rank)])
            out_rows.append(row)
        return pd.DataFrame(out_rows)

    pre = ds.map_batches(partials, batch_format="pandas")
    return sorted_apply_exact(pre, key, per_key)
