"""Vectorized distributed grouped aggregation (the engine's shuffle core).

Why this exists: in ray 2.49, ``groupby().aggregate()`` accumulates PER ROW
in Python (~35 s for a 100k-row Sum measured in this sandbox) and
``groupby().map_groups()`` constructs a pandas DataFrame PER GROUP (~2 ms
each — 40 s for 20k groups). Both are unusable in hot paths. The pattern
here is ~100× faster, fully streaming, and preserves block parallelism:

1. (optional) ``map_batches(combine)`` — vectorized partial aggregation per
   batch, shrinking the shuffle input to ≤ one row per (key, batch);
2. ``sort(key)`` — Ray's range-partitioned distributed sort (Arrow-native);
3. per-BLOCK vectorized apply/combine. After the sort, a key group can only
   straddle block BOUNDARIES, so each block's first/last keys (≤ 2 per
   block — a tiny driver-side list) are routed to a single remainder
   partition processed separately; interior groups are complete within
   their block. Exact for any group shape, one extra pass over ≤
   2×num_blocks combined rows, output block count ≈ input block count.

``combine`` contract (sorted_grouped_agg): pandas DataFrame (any mix of raw
and partial rows) → one combined row per key present, vectorized over the
whole frame; associative + commutative + idempotent on combined rows; must
return correct-schema output for an empty input.

``apply_block`` contract (sorted_apply_exact): receives only COMPLETE key
groups (several at once, key-sorted) and may emit any shape; must handle
empty input.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd


# boundary-remainder rows at or below this count apply on the driver
# (one tiny pull; the rows are ≤ 2 bounded groups per block by contract)
REMAINDER_DRIVER_GATE = 200_000


def _keys_list(key: str | list[str]) -> list[str]:
    return [key] if isinstance(key, str) else list(key)


def _boundary_keys(sorted_ds: rd.Dataset, keys: list[str]) -> pd.DataFrame:
    """First/last key tuple of every block (driver-side tiny frame)."""

    def block_edges(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df[keys].iloc[0:0]
        return df[keys].iloc[[0, len(df) - 1]]

    edges = sorted_ds.map_batches(
        block_edges, batch_format="pandas", batch_size=None
    ).to_pandas()
    return edges.drop_duplicates() if len(edges) else edges


def _split_apply(
    sorted_ds: rd.Dataset,
    keys: list[str],
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    edges: pd.DataFrame | None = None,
) -> rd.Dataset:
    """Apply ``fn`` to complete key groups: interior per block + boundary
    remainder in one coalesced partition. ``edges``: pass the block-edge
    frame if the caller already collected it (one less pass)."""
    import ray

    if edges is None:
        edges = _boundary_keys(sorted_ds, keys)
    if len(edges) == 0:
        return sorted_ds.map_batches(fn, batch_format="pandas", batch_size=None)
    b_ref = ray.put(set(map(tuple, edges.to_numpy())))

    single = len(keys) == 1
    if single:
        b_single = {t[0] for t in map(tuple, edges.to_numpy())}

    def _mask(df: pd.DataFrame, b: set) -> np.ndarray:
        if len(df) == 0:
            return np.zeros(0, dtype=bool)
        if single:  # C-speed membership for the common one-key case
            return df[keys[0]].isin(b_single).to_numpy()
        return np.fromiter(
            (tuple(row) in b for row in df[keys].to_numpy()),
            dtype=bool,
            count=len(df),
        )

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(b_ref)
        return fn(df[~_mask(df, b)])

    def boundary_rows(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(b_ref)
        return df[_mask(df, b)]

    out_interior = sorted_ds.map_batches(
        interior, batch_format="pandas", batch_size=None
    )
    # Boundary remainder: all straddling-key rows process together.
    # CONTRACT: callers bound group size (salting / caps — SURVEY.md §4
    # skew row), so the remainder holds ≤ 2 bounded groups per input
    # block — tiny relative to the dataset. Below the count gate it
    # applies ON THE DRIVER (one pull of the tiny frame + one local fn
    # call — saves the ~5 s repartition+sort+map fixed cost PER grouped
    # op); above the gate it coalesces into one distributed task.
    # Routing it through groupby().map_groups instead was measured at
    # +~8 s fixed per call (~107 s across the ER pipeline at sf0.1) —
    # never do that. An UNBOUNDED straddling group would serialize here;
    # that is the caller's bug, not this operator's.
    rem_src = sorted_ds.map_batches(
        boundary_rows, batch_format="pandas", batch_size=None
    ).materialize()
    if rem_src.count() <= REMAINDER_DRIVER_GATE:
        import pyarrow as _pa

        pdf = rem_src.to_pandas()
        out = fn(pdf.sort_values(keys, kind="stable")) if len(pdf) else fn(pdf)
        if len(out) == 0:
            return out_interior
        rem = (
            rd.from_arrow(out) if isinstance(out, _pa.Table) else rd.from_pandas(out)
        )
        return out_interior.union(rem)
    rem = (
        rem_src.repartition(1)
        .sort(keys)
        .map_batches(fn, batch_format="pandas", batch_size=None)
    )
    return out_interior.union(rem)


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
    pair dedup at test scale); above the gate the distributed sort path
    runs unchanged, so 100 TB inputs never touch the driver.
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
    sorted_ds = ds.sort(keys).materialize()
    return _split_apply(sorted_ds, keys, combine)


def sorted_apply_exact(
    ds: rd.Dataset,
    key: str | list[str],
    apply_block: Callable[[pd.DataFrame], pd.DataFrame],
    assume_sorted: bool = False,
    precomputed_edges: pd.DataFrame | None = None,
) -> rd.Dataset:
    """Per-group apply with EXACT group boundaries, vectorized per block.

    Oversized single-key groups all land in the remainder partition — the
    caller bounds group size (salting; SURVEY.md §4 skew row).
    """
    keys = _keys_list(key)
    sorted_ds = ds if assume_sorted else ds.sort(keys)
    sorted_ds = sorted_ds.materialize()
    return _split_apply(sorted_ds, keys, apply_block, edges=precomputed_edges)


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
