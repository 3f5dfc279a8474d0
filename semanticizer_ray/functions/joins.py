"""Distributed equality joins (SURVEY.md J2): one operator, two plans.

- **broadcast hash join** — build (right) side at or below ``broadcast_gate``
  rows: collected once, ``ray.put`` once, vectorized pandas merge per probe
  batch. Zero shuffle; the dimension-table plan.
- **sort-merge bucket join** — both sides above the gate: rows tagged with a
  side marker and unioned under one schema, ONE range-partitioned sort by
  the key, then a per-block pandas merge over complete key groups
  (``sorted_apply_exact``). Neither side is ever driver-materialized — the
  large × large scale plan. Skewed keys straddling block boundaries route
  through the remainder pass exactly like every other grouped op.

Deliberately NOT ``ray.data.Dataset.join``: in ray 2.49 it mishandles empty
partitions and mixed block types inside composed plans (see
``functions/groupagg.py``); this operator reuses the engine's own shuffle
core instead.

Semantics: ``how`` ∈ {inner, left, right, full, semi, anti}. ``left`` keeps
unmatched probe rows (build columns null), ``right`` keeps unmatched build
rows, ``full`` keeps both; on every plan the output is cast back to the
source Arrow types (ints stay ints with nulls — the pandas merge widens
them to float64 and the cast restores them; a cast that cannot round-trip
raises instead of silently emitting a differently-typed block, which would
recreate the ray-2.49 mixed-block hazard downstream). semi/anti emit probe
columns only, dtypes untouched. ``right``/``full`` always take the
sort-merge plan: a per-batch broadcast merge cannot know whether a build
row matched in some OTHER probe batch, so unmatched-build emission is only
well-defined over complete key groups. Key columns must share names on
both sides (rename upstream); non-key column names must not collide.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from .groupagg import sorted_apply_exact

_HOW = ("inner", "left", "right", "full", "semi", "anti")
# pandas merge spells full outer "outer"
_PD_HOW = {"inner": "inner", "left": "left", "right": "right", "full": "outer"}


def _keys(on) -> list[str]:
    return [on] if isinstance(on, str) else list(on)


def _pa_type(t) -> pa.DataType:
    # pandas-block datasets report numpy dtypes, not Arrow types
    if isinstance(t, pa.DataType):
        return t
    try:
        return pa.from_numpy_dtype(t)
    except (pa.ArrowNotImplementedError, TypeError):
        return pa.string()  # object columns: strings by convention


def _plan_schemas(
    left: rd.Dataset, right: rd.Dataset, keys: list[str], how: str
) -> tuple[dict, dict, list[str], list[str], pa.Schema]:
    """Resolve both sides' Arrow types and the joined output schema."""
    lschema = left.schema(fetch_if_missing=True)
    rschema = right.schema(fetch_if_missing=True)
    if lschema is None or rschema is None:
        raise ValueError("join: cannot resolve input schemas")
    ltypes = {n: _pa_type(t) for n, t in zip(lschema.names, lschema.types)}
    rtypes = {n: _pa_type(t) for n, t in zip(rschema.names, rschema.types)}
    for k in keys:
        if k not in ltypes or k not in rtypes:
            raise ValueError(f"join: key column {k!r} missing from an input")
    lcols = [c for c in lschema.names if c not in keys]
    rcols = [c for c in rschema.names if c not in keys]
    clash = set(lcols) & set(rcols)
    if clash:
        raise ValueError(f"join: non-key column name collision: {sorted(clash)}")
    out_cols = keys + lcols + (rcols if how in ("inner", "left", "right", "full") else [])
    out_schema = pa.schema(
        [(c, ltypes[c] if c in ltypes else rtypes[c]) for c in out_cols]
    )
    return ltypes, rtypes, lcols, rcols, out_schema


def _restore_types(out: pd.DataFrame, out_schema: pa.Schema) -> pa.Table:
    """The pandas merge widens int columns to float64 (nulls in unmatched
    slots); cast back to the source Arrow types on exit. NaN → null. A
    column that cannot round-trip raises with its name — silently emitting
    an inferred (differently-typed) block would surface later as a
    mixed-schema union error far from the cause."""
    try:
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        bad: list[str] = []
        for field in out_schema:
            try:
                pa.array(out[field.name], type=field.type, from_pandas=True)
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                bad.append(f"{field.name} (expected {field.type})")
        raise ValueError(
            "join: output columns cannot be cast back to their source Arrow "
            f"types: {bad or ['<unknown>']} — upstream schema drift?"
        )


def join(
    left: rd.Dataset,
    right: rd.Dataset,
    on: str | list[str],
    how: str = "inner",
    broadcast_gate: int = 200_000,
    right_count: int | None = None,
) -> rd.Dataset:
    """Join ``left`` (probe) with ``right`` (build) on equal key columns.

    ``right_count`` skips the count pass when the caller already knows the
    build-side size. The gate picks the physical plan; results are
    identical (asserted by tests)."""
    if how not in _HOW:
        raise ValueError(f"join: how must be one of {_HOW}")
    keys = _keys(on)
    if how in ("right", "full"):
        # unmatched-build emission needs complete key groups (see module
        # docstring) — the broadcast plan is per-probe-batch, so skip it
        return _sort_merge_join(left, right, keys, how)
    if right_count is None:
        # pin the build side before counting: a lazy right (often itself a
        # join output) would otherwise execute once for the count and again
        # for the collect/union — and chained joins recompute whole subtrees
        right = right.materialize()
        n_right = right.count()
    else:
        n_right = right_count
    if n_right <= broadcast_gate:
        return _broadcast_join(left, right, keys, how)
    return _sort_merge_join(left, right, keys, how)


def _broadcast_join(
    left: rd.Dataset, right: rd.Dataset, keys: list[str], how: str
) -> rd.Dataset:
    import ray

    out_schema = None
    if how in ("inner", "left"):
        _lt, _rt, _lc, _rc, out_schema = _plan_schemas(left, right, keys, how)
    rdf = right.to_pandas()
    if rdf.empty and not len(rdf.columns):  # empty datasets lose their schema
        names = right.schema(fetch_if_missing=True)
        rdf = pd.DataFrame({c: [] for c in (names.names if names else keys)})
    ref = ray.put(rdf)

    def probe(batch: pd.DataFrame):
        r = ray.get(ref)
        if how in ("inner", "left"):
            merged = batch.merge(r, on=keys, how=how)
            # same dtype restore as the sort-merge plan, so the physical
            # plan never changes output dtypes (ADVICE r2)
            return _restore_types(merged[out_schema.names], out_schema)
        hit = batch.merge(r[keys].drop_duplicates(), on=keys, how="left", indicator=True)
        mask = (hit["_merge"] == "both").to_numpy()
        return batch[mask if how == "semi" else ~mask]

    return left.map_batches(probe, batch_format="pandas")


def _sort_merge_join(
    left: rd.Dataset, right: rd.Dataset, keys: list[str], how: str
) -> rd.Dataset:
    ltypes, rtypes, lcols, rcols, out_schema = _plan_schemas(left, right, keys, how)
    out_cols = out_schema.names

    def tag(side: str, own: list[str], other: list[str], other_types) -> "callable":
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            cols: dict[str, pa.ChunkedArray | pa.Array] = {}
            for k in keys:
                cols[k] = batch[k]
            for c in own:
                cols[c] = batch[c]
            for c in other:
                cols[c] = pa.nulls(n, other_types[c])
            cols["__side"] = pa.array([side] * n, pa.string())
            return pa.table(cols)

        return f

    # both sides mapped into the SAME unified schema, then one sort
    lt = left.map_batches(tag("l", lcols, rcols, rtypes), batch_format="pyarrow")
    rt = right.map_batches(tag("r", rcols, lcols, ltypes), batch_format="pyarrow")

    def join_block(df: pd.DataFrame) -> pa.Table:
        if len(df) == 0:
            return out_schema.empty_table()
        lp = df.loc[df["__side"] == "l", keys + lcols]
        rp = df.loc[df["__side"] == "r", keys + rcols]
        if how in _PD_HOW:
            return _restore_types(
                lp.merge(rp, on=keys, how=_PD_HOW[how])[out_cols], out_schema
            )
        hit = lp.merge(rp[keys].drop_duplicates(), on=keys, how="left", indicator=True)
        mask = (hit["_merge"] == "both").to_numpy()
        return _restore_types(lp[mask if how == "semi" else ~mask][out_cols], out_schema)

    return sorted_apply_exact(lt.union(rt), keys, join_block)
