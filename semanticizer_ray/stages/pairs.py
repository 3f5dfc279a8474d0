"""Stage T7: blocking keys → deduplicated candidate pairs.

This is the pipeline's big all-to-all shuffle (SURVEY.md T7 / §4 skew row),
with explicit hot-key handling per north_rule. ONE range-partitioned sort
of the (block_key, conv_id) rows serves both the hot-key census and pair
generation (the old path paid a census sort, a salt-explode pass with s×
row replication, and a second sort — three distributed exchanges where one
suffices):

1. sort by block_key → every key group is contiguous; a straddling key is
   by construction the FIRST or LAST key of every block that holds it, so
   each block detects its own edge keys locally (no global boundary-key
   collection pass, no broadcast edge set);
2. census from ONE pass over the sorted blocks: per-block partial counts,
   emitting only keys over the smallest cap or on the block's own edge
   (tiny frame); the driver sums partials — exact because interior keys
   live in one block and straddling keys are emitted by every block that
   holds them;
3. per-block pair generation over complete groups (``sorted_apply_exact``
   on the same sorted exchange). A hot key with n members is "salted"
   LOCALLY: members bucket by hash(conv) % s, s = ceil(n / max_block_size)
   capped at MAX_SALT, and pairs are emitted per bucket pair (lo, hi) with
   ``max_pairs_per_block`` applied PER SALTED SUB-BLOCK and the overflow
   COUNTED on emitted rows (``block_overflow`` — no silent truncation).
   This yields the exact triangle-replication pair set of the old explode
   path (identical block_id labels, identical coverage) without replicating
   any rows through a shuffle. The trade, documented: all pairs of one hot
   key are generated in the task that owns its group (the boundary
   remainder for straddlers), bounded by MAX_SALT²/2 · max_pairs_per_block
   pairs — at most ~128k rows per degenerate key at the defaults;
4. global pair dedup: one two-key sorted exchange on (conv_a, conv_b) with
   a vectorized reduceat combine (a pair found by many bands is scored
   once; lineage keeps min block_id).

Rows entering the shuffle are (block_key, conv_id) only — profiles/features
are attached to the deduplicated pairs afterwards (stage T8), so the
quadratic step never moves text.
"""

from __future__ import annotations

import hashlib
import os
import sys
import time

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.groupagg import (
    group_starts,
    grouped_count,
    sorted_apply_exact,
    sorted_grouped_agg,
)

MAX_SALT = 8

# Key-internal delimiter: "\x1f" (ASCII unit separator). A printable
# delimiter like "#s" or "|" could collide with anchor label text / user
# conv ids and corrupt key parsing; "\x00" is ruled out because pandas'
# string hash table is NUL-terminated (groupby silently merges keys that
# share a prefix before "\x00"). Contract (documented here and in the
# pipeline docs): conv ids and anchor labels must not contain "\x1f" —
# no natural-language normalizer output does.
SALT_SEP = "\x1fs"  # block_key + SALT_SEP + "<s>:<lo>-<hi>"

# Count gate for the driver-side fast path in censuses / pair dedup: small
# (test-tier) inputs skip distributed sorts; anything bigger takes the
# scaling path. Deliberately modest so benchmark tiers exercise the
# distributed code.
DRIVER_GATE = 100_000

PAIR_SCHEMA = pa.schema(
    [
        ("conv_a", pa.string()),
        ("conv_b", pa.string()),
        ("block_id", pa.string()),
        ("block_overflow", pa.int64()),
    ]
)


def _stable_hash(s: str) -> int:
    return int.from_bytes(hashlib.md5(s.encode()).digest()[:8], "little")


def block_census(
    block_rows: rd.Dataset, cfg: EngineConfig, include_anchor_cap: bool = False
) -> dict[str, int]:
    """Hot blocking keys → member count, as a standalone distributed count
    (kept for callers that have UNSORTED key rows; the pipeline itself uses
    the fused census inside ``candidate_pairs``). Small driver-side dict
    (only keys above the smallest relevant cap)."""
    cap = cfg.blocking.max_block_size
    if include_anchor_cap:
        cap = min(cap, cfg.blocking.anchor_max_block_size)
    counts = grouped_count(block_rows, "block_key", driver_gate=DRIVER_GATE)
    hot = counts.map_batches(
        lambda df: df[df["n"] > cap], batch_format="pandas"
    ).to_pandas()
    if hot.empty or "block_key" not in hot.columns:
        return {}
    return dict(zip(hot["block_key"], hot["n"].astype(int)))


def _hot_plan(hot: dict[str, int], cfg: EngineConfig) -> dict[str, int]:
    """Hot-key census → action per key: 0 = drop (non-discriminative
    anchor), s ≥ 2 = salt into s hash buckets."""
    bcfg = cfg.blocking
    anchor_cap = bcfg.anchor_max_block_size
    dropped = [k for k, n in hot.items() if k.startswith("A:") and n > anchor_cap]
    if dropped:
        worst = max(hot[k] for k in dropped)
        # stderr: bench.py / the driver parse stdout as one JSON line
        print(
            f"[blocking] dropping {len(dropped)} anchor keys above cap "
            f"{anchor_cap} (max block {worst})",
            file=sys.stderr,
        )
    plan: dict[str, int] = {}
    for k, n in hot.items():
        if k.startswith("A:"):
            if n > anchor_cap:
                plan[k] = 0  # drop
            elif n > bcfg.max_block_size:
                plan[k] = min(MAX_SALT, -(-n // bcfg.max_block_size))
        elif n > bcfg.max_block_size:
            plan[k] = min(MAX_SALT, -(-n // bcfg.max_block_size))
    return plan


def _salted_group_pairs(
    key: str, members: list[str], s: int, max_pairs: int
) -> tuple[list[str], list[str], list[str], list[int]]:
    """All-pairs of one hot key, partitioned into the s(s+1)/2 salted
    sub-blocks of the triangle-replication scheme — identical pair set,
    block_id labels, and per-sub-block overflow accounting as the old
    explode-then-shuffle path, computed locally from the complete group."""
    out_a: list[str] = []
    out_b: list[str] = []
    out_block: list[str] = []
    out_over: list[int] = []
    buckets: list[list[str]] = [[] for _ in range(s)]
    for m in members:
        buckets[_stable_hash(m) % s].append(m)
    for lo in range(s):
        for hi in range(lo, s):
            if lo == hi:
                mem = buckets[lo]
                pairs = [
                    (a, b) for ai, a in enumerate(mem) for b in mem[ai + 1 :]
                ]
            else:
                pairs = [
                    (min(a, b), max(a, b))
                    for a in buckets[lo]
                    for b in buckets[hi]
                ]
            if not pairs:
                continue
            overflow = max(0, len(pairs) - max_pairs)
            if overflow:
                pairs = pairs[:max_pairs]
            label = f"{key}{SALT_SEP}{s}:{lo}-{hi}"
            out_a.extend(a for a, _ in pairs)
            out_b.extend(b for _, b in pairs)
            out_block.extend([label] * len(pairs))
            out_over.extend([overflow] * len(pairs))
    return out_a, out_b, out_block, out_over


def _pairs_sorted(a: np.ndarray, b: np.ndarray) -> bool:
    """True iff (a, b) rows are lexicographically non-decreasing."""
    if len(a) < 2:
        return True
    a_prev, a_next = a[:-1], a[1:]
    lt = a_prev < a_next
    eq = a_prev == a_next
    return bool(np.all(lt | (eq & (b[:-1] <= b[1:]))))


def dedup_pairs_frame(df: pd.DataFrame) -> pd.DataFrame:
    """One row per (conv_a, conv_b): min block_id, max block_overflow —
    vectorized via group-boundary reduceat instead of a pandas string
    groupby (measured ~185 core-s of hash-table build over the 100k-tier
    pair set). Sorted input (the common case — every caller in the dedup
    path hands over key-sorted frames) skips the lexsort."""
    if len(df) == 0:
        return df
    a = df["conv_a"].to_numpy()
    b = df["conv_b"].to_numpy()
    blk = df["block_id"].to_numpy()
    over = df["block_overflow"].to_numpy()
    if not _pairs_sorted(a, b):
        order = np.lexsort((b, a))
        a, b, blk, over = a[order], b[order], blk[order], over[order]
    starts = group_starts(a, b)
    # lexicographic min of block_id per group via sort-ordered factorize
    codes, uniq = pd.factorize(blk, sort=True)
    min_codes = np.minimum.reduceat(codes, starts)
    max_over = np.maximum.reduceat(over, starts)
    return pd.DataFrame(
        {
            "conv_a": a[starts],
            "conv_b": b[starts],
            "block_id": uniq[min_codes],
            "block_overflow": max_over,
        }
    )


def bucket_of_block_keys(keys: "np.ndarray", num_buckets: int) -> "np.ndarray":
    """Deterministic (process-stable) hash bucket per block key — the
    partition unit for mid-shuffle resume: a key's entire group lives in
    exactly one bucket, so per-bucket censuses/salting/pair sets are exact
    and their union is the full pre-dedup pair set."""
    return pd.util.hash_array(np.asarray(keys, dtype=object)) % num_buckets


def merge_pair_parts(parts: rd.Dataset) -> rd.Dataset:
    """Union of per-bucket candidate_pairs outputs → globally deduplicated
    pairs (a pair found via keys in two different buckets appears twice
    across parts; same min-block_id / max-overflow combine as the
    in-stage dedup)."""
    return sorted_grouped_agg(
        parts,
        ["conv_a", "conv_b"],
        dedup_pairs_frame,
        driver_gate=DRIVER_GATE,
    )


# coalesce gate for the block-key exchange: inputs estimated under this
# many rows (~8 GB of key rows) right-size to ~4 MB blocks before sorting;
# larger inputs already have adequately sized blocks
_COALESCE_MAX_EST_ROWS = 200_000_000
_KEY_ROW_BYTES = 40
_COALESCE_BLOCK_BYTES = 4 << 20


def candidate_pairs(
    block_rows: rd.Dataset, cfg: EngineConfig, est_rows: int | None = None
) -> rd.Dataset:
    """(block_key, conv_id) rows → deduplicated (conv_a, conv_b) pairs.

    One sorted exchange covers census + generation for both key families:
    LSH keys over the cap are SALTED (exact pair coverage must be
    preserved — a hot band is still a real near-dup signal); anchor "A:"
    keys over ``anchor_max_block_size`` are DROPPED with a log line (a
    non-discriminative anchor is noise — see BlockingConfig).

    ``est_rows``: caller's estimate of the input row count (the ER pipeline
    knows it exactly: profiles × keys-per-conv). Key rows are ~40 B, so a
    mid-sized input inherits hundreds of sub-MB blocks from the profile
    explode, and range-exchange overhead grows with block count at EVERY
    cpu count (sampling, partial-block fan-out — a pure fixed cost). Below
    ``_COALESCE_MAX_EST_ROWS`` the input is coalesced (shuffle=False — a
    cheap streaming merge) to ~4 MB blocks first; at 10^12-turn scale the
    estimate exceeds the gate and nothing changes.

    ``GRAFT_TIMING=1`` prints per-step driver wall times (scaling work)."""
    timing = os.environ.get("GRAFT_TIMING") == "1"
    tprev = time.perf_counter()

    def _t(label: str) -> None:
        nonlocal tprev
        if timing:
            now = time.perf_counter()
            print(f"[pairs-timing] {label}: {now - tprev:.2f}s")
            tprev = now

    bcfg = cfg.blocking
    min_cap = min(bcfg.max_block_size, bcfg.anchor_max_block_size)

    if est_rows is not None and 0 < est_rows <= _COALESCE_MAX_EST_ROWS:
        import math

        cpus = int(ray.cluster_resources().get("CPU", 8))
        target = max(cpus, math.ceil(est_rows * _KEY_ROW_BYTES / _COALESCE_BLOCK_BYTES))
        block_rows = block_rows.repartition(target)
        _t(f"coalesce_to_{target}_blocks")

    sorted_ds = block_rows.sort("block_key").materialize()
    _t("sort_block_rows")

    def census_block(df: pd.DataFrame) -> pd.DataFrame:
        """Per-block partial counts — only keys that might be hot (over the
        smallest cap) or that might straddle leave the task. A straddling
        key is by construction the first or last key of EVERY block that
        holds it, so block-LOCAL edge detection is exact: summing the
        emitted partials gives the true global count for every hot or
        straddling key (no separate boundary-key collection pass)."""
        if len(df) == 0:
            return pd.DataFrame(
                {"block_key": pd.Series(dtype="str"), "n": pd.Series(dtype="int64")}
            )
        counts = df.groupby("block_key", sort=False).size()
        k = df["block_key"].to_numpy()
        sel = counts[(counts > min_cap) | counts.index.isin((k[0], k[-1]))]
        return sel.rename("n").reset_index()

    partials = sorted_ds.map_batches(
        census_block, batch_format="pandas", batch_size=None
    ).to_pandas()
    _t("census")
    if partials.empty or "block_key" not in partials.columns:
        hot: dict[str, int] = {}
    else:
        sums = partials.groupby("block_key")["n"].sum()
        hot = {k: int(n) for k, n in sums.items() if n > min_cap}
    plan = _hot_plan(hot, cfg)
    plan_ref = ray.put(plan)

    max_pairs = bcfg.max_pairs_per_block

    def gen_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        """All complete key groups of one block → (conv_a, conv_b) pair rows
        (vectorized group iteration via boundary indices). Size-1 groups
        (the vast majority of LSH bands) are skipped wholesale; size-2
        plain groups emit their single pair vectorized — only size≥3 or
        planned (hot) groups loop. Emits endpoint COLUMNS directly: the old
        path built an f-string pair key per pair here and split it back
        after the dedup — ~1.2 M string constructions per run at the
        100k-conv tier, all pure overhead."""
        hot_map: dict[str, int] = ray.get(plan_ref)
        arrs_a: list[np.ndarray] = []
        arrs_b: list[np.ndarray] = []
        arrs_block: list[np.ndarray] = []
        arrs_over: list[np.ndarray] = []
        out_a: list[str] = []
        out_b: list[str] = []
        out_block: list[str] = []
        out_over: list[int] = []
        if len(df):
            df = df.sort_values(["block_key", "conv_id"], kind="stable")
            keys = df["block_key"].to_numpy()
            convs = df["conv_id"].to_numpy()
            starts = group_starts(keys)
            bounds = np.append(starts, len(df))
            sizes = np.diff(bounds)
            # fast path: exactly-2-member unplanned groups → one pair each
            two = np.flatnonzero(sizes == 2)
            slow_from_two: list[int] = []
            if len(two):
                lo2 = bounds[two]
                k2 = keys[lo2]
                a2 = convs[lo2]
                b2 = convs[lo2 + 1]
                if hot_map:
                    plain = np.array([k not in hot_map for k in k2], dtype=bool)
                else:
                    plain = np.ones(len(two), dtype=bool)
                keep2 = plain & (a2 != b2)
                arrs_a.append(a2[keep2])
                arrs_b.append(b2[keep2])
                arrs_block.append(k2[keep2])
                arrs_over.append(np.zeros(int(keep2.sum()), dtype=np.int64))
                slow_from_two = list(two[~plain])  # planned size-2 → loop
            slow = list(np.flatnonzero(sizes > 2)) + slow_from_two
            for gi in slow:
                lo_i, hi_i = bounds[gi], bounds[gi + 1]
                key = keys[lo_i]
                members = sorted(set(convs[lo_i:hi_i]))
                s = hot_map.get(key, 1)
                if s == 0:
                    continue  # dropped non-discriminative anchor key
                if s >= 2:
                    ga, gb, blk, over = _salted_group_pairs(
                        key, members, s, max_pairs
                    )
                    out_a.extend(ga)
                    out_b.extend(gb)
                    out_block.extend(blk)
                    out_over.extend(over)
                    continue
                pairs = [
                    (a, b) for ai, a in enumerate(members) for b in members[ai + 1 :]
                ]
                overflow = max(0, len(pairs) - max_pairs)
                if overflow:
                    pairs = pairs[:max_pairs]
                out_a.extend(a for a, _ in pairs)
                out_b.extend(b for _, b in pairs)
                out_block.extend([key] * len(pairs))
                out_over.extend([overflow] * len(pairs))
        if out_a:
            arrs_a.append(np.asarray(out_a, dtype=object))
            arrs_b.append(np.asarray(out_b, dtype=object))
            arrs_block.append(np.asarray(out_block, dtype=object))
            arrs_over.append(np.asarray(out_over, dtype=np.int64))
        cat = lambda parts: (  # noqa: E731
            np.concatenate(parts) if parts else np.empty(0, dtype=object)
        )
        return pd.DataFrame(
            {
                "conv_a": pd.Series(cat(arrs_a), dtype="str"),
                "conv_b": pd.Series(cat(arrs_b), dtype="str"),
                "block_id": pd.Series(cat(arrs_block), dtype="str"),
                "block_overflow": pd.Series(
                    np.concatenate(arrs_over)
                    if arrs_over
                    else np.empty(0, dtype=np.int64),
                    dtype="int64",
                ),
            }
        )

    all_pairs = sorted_apply_exact(
        sorted_ds, "block_key", gen_pairs_block, assume_sorted=True
    )
    _t("gen_pairs(apply_exact incl. edge pass)")

    # one two-key sorted exchange dedups; no pre-combine (measured: the
    # per-batch pre-dedup removed 2.6% of rows at the 100k tier — pure cost)
    deduped = sorted_grouped_agg(
        all_pairs,
        ["conv_a", "conv_b"],
        dedup_pairs_frame,
        pre_combine=False,
        driver_gate=DRIVER_GATE,
    )
    _t("pair_dedup(sorted_apply_exact)")
    return deduped
