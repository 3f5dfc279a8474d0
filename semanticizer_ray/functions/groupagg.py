"""Vectorized distributed grouped aggregation (the engine's shuffle core).

Why this exists: in ray 2.49, ``groupby().aggregate()`` accumulates PER ROW
in Python (~35 s for a 100k-row Sum measured in this sandbox) and
``groupby().map_groups()`` constructs a pandas DataFrame PER GROUP (~2 ms
each — 40 s for 20k groups). Both are unusable in hot paths. The pattern
here is ~100× faster and fully streaming:

1. ``map_batches(combine)``   — vectorized partial aggregation per batch
   (pandas groupby inside the batch), shrinking the shuffle input to ≤ one
   row per (key, batch);
2. ``sort(key)``              — Ray's range-partitioned distributed sort
   (Arrow-native, vectorized);
3. ``map_batches(combine, batch_size=None)`` — per-BLOCK vectorized
   combine; after the sort a key spans at most adjacent blocks;
4. boundary fix — repeatedly coalesce adjacent sorted blocks
   (``repartition(n//FANIN)``; order-preserving, verified) and re-combine
   until one block remains or the row count stops shrinking. Combines are
   associative+commutative by contract, so this converges to exactly one
   row per key in O(log_FANIN #blocks) extra vectorized rounds.

``combine`` contract: pandas DataFrame (any mix of raw and partial rows) →
one combined row per key present, vectorized over the whole frame. It must
be idempotent on already-combined rows and closed under composition.

For per-group logic that is NOT a reduction (pair generation inside a
block, top-k per key), use ``sorted_apply``: same sort, then one Python
loop over ``np.unique`` group boundaries per BLOCK — one DataFrame per
block instead of per group.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import ray.data as rd

FANIN = 8


def sorted_grouped_agg(
    ds: rd.Dataset,
    key: str | list[str],
    combine: Callable[[pd.DataFrame], pd.DataFrame],
    pre_combine: bool = True,
) -> rd.Dataset:
    """Exactly one combined row per key (see module docstring)."""
    keys = [key] if isinstance(key, str) else list(key)
    if pre_combine:
        ds = ds.map_batches(combine, batch_format="pandas")
    ds = ds.sort(keys)
    ds = ds.map_batches(combine, batch_format="pandas", batch_size=None)
    ds = ds.materialize()
    # boundary fix: coalesce adjacent sorted blocks and re-combine
    while ds.num_blocks() > 1:
        target = max(1, ds.num_blocks() // FANIN)
        ds = (
            ds.repartition(target)
            .map_batches(combine, batch_format="pandas", batch_size=None)
            .materialize()
        )
        if target == 1:
            break
    return ds


def sorted_apply(
    ds: rd.Dataset,
    key: str | list[str],
    apply_block: Callable[[pd.DataFrame], pd.DataFrame],
    coalesce_to: int | None = None,
) -> rd.Dataset:
    """Sort by key, coalesce to whole blocks, then apply a per-block fn that
    handles its own group iteration (``group_starts`` helps). A key group
    can still span adjacent blocks — callers for whom that matters must
    either make ``apply_block`` emit combinable partials or accept
    block-local semantics (documented per call site); ``sorted_apply_exact``
    removes the caveat.
    """
    keys = [key] if isinstance(key, str) else list(key)
    ds = ds.sort(keys)
    if coalesce_to is not None:
        ds = ds.repartition(coalesce_to)
    return ds.map_batches(apply_block, batch_format="pandas", batch_size=None)


def sorted_apply_exact(
    ds: rd.Dataset,
    key: str,
    apply_block: Callable[[pd.DataFrame], pd.DataFrame],
    assume_sorted: bool = False,
) -> rd.Dataset:
    """Per-group apply with EXACT group boundaries, vectorized per block.

    ``apply_block`` receives only COMPLETE key groups (any number of them,
    concatenated, sorted by key) and may emit any shape of output.

    Mechanics: after the range-partitioned sort, a key group can only be
    split across adjacent blocks, and only the first/last group of each
    block can be affected. Pass 1 processes each block's interior groups
    and skips its boundary groups; the boundary keys (≤ 2 per block) are
    collected on the driver (tiny), broadcast, and pass 2 processes all
    their rows in one coalesced block. Oversized single-key groups are the
    caller's concern (salting — SURVEY.md §4 skew row).
    """
    import ray

    sorted_ds = ds if assume_sorted else ds.sort(key)
    sorted_ds = sorted_ds.materialize()

    def block_edge_keys(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame({key: []})
        return pd.DataFrame({key: [df[key].iloc[0], df[key].iloc[-1]]})

    edges = (
        sorted_ds.map_batches(block_edge_keys, batch_format="pandas", batch_size=None)
        .to_pandas()
    )
    boundary: set = set(edges[key]) if len(edges) else set()
    b_ref = ray.put(boundary)

    def interior(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(b_ref)
        # apply_block contract: must return correct-schema output for an
        # empty input frame
        return apply_block(df[~df[key].isin(b)])

    def boundary_rows(df: pd.DataFrame) -> pd.DataFrame:
        b = ray.get(b_ref)
        return df[df[key].isin(b)]

    out_interior = sorted_ds.map_batches(interior, batch_format="pandas", batch_size=None)
    rem = (
        sorted_ds.map_batches(boundary_rows, batch_format="pandas", batch_size=None)
        .repartition(1)
        .sort(key)
        .map_batches(apply_block, batch_format="pandas", batch_size=None)
    )
    return out_interior.union(rem)


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


def grouped_count(ds: rd.Dataset, key: str, out_col: str = "n") -> rd.Dataset:
    """Vectorized distributed count-per-key."""

    def combine(df: pd.DataFrame) -> pd.DataFrame:
        if out_col in df.columns:
            g = df.groupby(key, sort=False)[out_col].sum().reset_index()
        else:
            g = df.groupby(key, sort=False).size().reset_index(name=out_col)
        return g

    return sorted_grouped_agg(ds, key, combine)
