"""Stage T7: blocking keys → deduplicated candidate pairs.

This is the pipeline's big all-to-all shuffle (SURVEY.md T7 / §4 skew row),
with explicit hot-key handling per north_rule:

1. census: vectorized distributed count per key (``grouped_count``) →
   keys over ``max_block_size`` collected to the driver (bounded: ≤ one
   short row per distinct hot key) and broadcast;
2. salt explode: a hot key with n members gets s = ceil(n / max_block_size)
   salts (capped at MAX_SALT). Member x lands in salt i = hash(conv)%s and
   is replicated into the s groups {key#(min(i,j),max(i,j))}: every pair of
   members still meets in EXACTLY one salted group (triangle replication —
   exact pair coverage, s× row replication of tiny rows);
3. per-block pair generation via ``sorted_apply_exact`` (complete groups,
   one vectorized pass per block — no per-group pandas), capped at
   ``max_pairs_per_block`` with the overflow COUNTED on emitted rows
   (``block_overflow`` — no silent truncation);
4. global pair dedup: one ``sorted_grouped_agg`` on the combined pair key
   (a pair found by many bands is scored once; lineage keeps min block_id).

Rows entering the shuffle are (block_key, conv_id) only — profiles/features
are attached to the deduplicated pairs afterwards (stage T8), so the
quadratic step never moves text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.groupagg import group_starts, grouped_count, sorted_apply_exact, sorted_grouped_agg

MAX_SALT = 8

# Key-internal delimiter: "\x1f" (ASCII unit separator). A printable
# delimiter like "#s" or "|" could collide with anchor label text / user
# conv ids and corrupt key parsing; "\x00" is ruled out because pandas'
# string hash table is NUL-terminated (groupby silently merges keys that
# share a prefix before "\x00"). Contract (documented here and in the
# pipeline docs): conv ids and anchor labels must not contain "\x1f" —
# no natural-language normalizer output does.
SALT_SEP = "\x1fs"  # block_key + SALT_SEP + "<s>:<lo>-<hi>"
PAIR_SEP = "\x1f"  # conv_a + PAIR_SEP + conv_b

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
    """Hot blocking keys → member count. Small driver-side dict (only keys
    above the smallest relevant cap)."""
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


def candidate_pairs(block_rows: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """(block_key, conv_id) rows → deduplicated (conv_a, conv_b) pairs.

    One census covers both key families: LSH keys over the cap are SALTED
    (exact pair coverage must be preserved — a hot band is still a real
    near-dup signal); anchor "A:" keys over ``anchor_max_block_size`` are
    DROPPED with a log line (a non-discriminative anchor is noise — see
    BlockingConfig)."""
    bcfg = cfg.blocking
    # keys are consumed twice (census + explode): pin them once
    block_rows = block_rows.materialize()
    hot = block_census(block_rows, cfg, include_anchor_cap=True)
    anchor_cap = bcfg.anchor_max_block_size
    dropped = [k for k, n in hot.items() if k.startswith("A:") and n > anchor_cap]
    if dropped:
        worst = max(hot[k] for k in dropped)
        print(
            f"[blocking] dropping {len(dropped)} anchor keys above cap "
            f"{anchor_cap} (max block {worst})"
        )
    plan = {}
    for k, n in hot.items():
        if k.startswith("A:"):
            if n > anchor_cap:
                plan[k] = 0  # drop
            elif n > bcfg.max_block_size:
                plan[k] = min(MAX_SALT, -(-n // bcfg.max_block_size))
        elif n > bcfg.max_block_size:
            plan[k] = min(MAX_SALT, -(-n // bcfg.max_block_size))
    hot_ref = ray.put(plan)

    def salt_explode(batch: pa.Table) -> pa.Table:
        """Cold rows pass through as a zero-copy Arrow filter; only rows of
        hot keys (a tiny fraction by construction) take the Python loop."""
        import pyarrow.compute as pc

        hot_map: dict[str, int] = ray.get(hot_ref)
        if not hot_map:
            return batch
        hot_keys = pa.array(list(hot_map), pa.string())
        is_hot = pc.is_in(batch["block_key"], value_set=hot_keys)
        cold = batch.filter(pc.invert(is_hot))
        hot_rows = batch.filter(is_hot)
        if hot_rows.num_rows == 0:
            return cold
        keys = hot_rows["block_key"].to_pylist()
        convs = hot_rows["conv_id"].to_pylist()
        out_key, out_conv = [], []
        for key, conv in zip(keys, convs):
            s = hot_map[key]
            if s == 1:
                out_key.append(key)
                out_conv.append(conv)
            elif s == 0:
                continue  # dropped non-discriminative anchor key
            else:
                i = _stable_hash(conv) % s
                for j in range(s):
                    lo, hi = min(i, j), max(i, j)
                    out_key.append(f"{key}{SALT_SEP}{s}:{lo}-{hi}")
                    out_conv.append(conv)
        exploded = pa.table(
            {
                "block_key": pa.array(out_key, pa.string()),
                "conv_id": pa.array(out_conv, pa.string()),
            }
        ).select(cold.column_names)  # align column order for concat
        return pa.concat_tables([cold, exploded])

    salted = block_rows.map_batches(salt_explode, batch_format="pyarrow")

    max_pairs = bcfg.max_pairs_per_block

    def gen_pairs_block(df: pd.DataFrame) -> pd.DataFrame:
        """All complete key groups of one block → pair rows (vectorized
        group iteration via boundary indices; the inner all-pairs loop is
        bounded by the salt cap). Size-1 groups (the vast majority of LSH
        bands) are skipped wholesale; size-2 unsalted groups emit their
        single pair vectorized — only size≥3 or salted groups loop."""
        out_pk: list[str] = []
        out_block: list[str] = []
        out_over: list[int] = []
        if len(df):
            df = df.sort_values(["block_key", "conv_id"], kind="stable")
            keys = df["block_key"].to_numpy()
            convs = df["conv_id"].to_numpy()
            starts = group_starts(keys)
            bounds = np.append(starts, len(df))
            sizes = np.diff(bounds)
            # fast path: exactly-2-member unsalted groups → one pair each
            two = np.flatnonzero(sizes == 2)
            slow_from_two: list[int] = []
            if len(two):
                lo2 = bounds[two]
                k2 = keys[lo2]
                a2 = convs[lo2]
                b2 = convs[lo2 + 1]
                plain = np.array([SALT_SEP not in k for k in k2], dtype=bool)
                keep2 = plain & (a2 != b2)
                out_pk.extend(
                    f"{a}{PAIR_SEP}{b}" for a, b in zip(a2[keep2], b2[keep2])
                )
                out_block.extend(k2[keep2])
                out_over.extend([0] * int(keep2.sum()))
                slow_from_two = list(two[~plain])  # salted size-2 → loop
            slow = list(np.flatnonzero(sizes > 2)) + slow_from_two
            for gi in slow:
                lo_i, hi_i = bounds[gi], bounds[gi + 1]
                key = keys[lo_i]
                members = sorted(set(convs[lo_i:hi_i]))
                if SALT_SEP in key:
                    _, salt_part = key.rsplit(SALT_SEP, 1)
                    s_str, rng = salt_part.split(":", 1)
                    s = int(s_str)
                    lo, hi = (int(x) for x in rng.split("-"))
                    if lo == hi:
                        mem = [m for m in members if _stable_hash(m) % s == lo]
                        pairs = [
                            (a, b) for ai, a in enumerate(mem) for b in mem[ai + 1 :]
                        ]
                    else:
                        left = [m for m in members if _stable_hash(m) % s == lo]
                        right = [m for m in members if _stable_hash(m) % s == hi]
                        pairs = [(min(a, b), max(a, b)) for a in left for b in right]
                else:
                    pairs = [
                        (a, b) for ai, a in enumerate(members) for b in members[ai + 1 :]
                    ]
                overflow = max(0, len(pairs) - max_pairs)
                if overflow:
                    pairs = pairs[:max_pairs]
                out_pk.extend(f"{a}{PAIR_SEP}{b}" for a, b in pairs)
                out_block.extend([key] * len(pairs))
                out_over.extend([overflow] * len(pairs))
        return pd.DataFrame(
            {
                "pair_key": pd.Series(out_pk, dtype="str"),
                "block_id": pd.Series(out_block, dtype="str"),
                "block_overflow": pd.Series(out_over, dtype="int64"),
            }
        )

    all_pairs = sorted_apply_exact(salted, "block_key", gen_pairs_block)

    def dedup_combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (
            df.groupby("pair_key", sort=False)
            .agg(block_id=("block_id", "min"), block_overflow=("block_overflow", "max"))
            .reset_index()
        )

    deduped = sorted_grouped_agg(
        all_pairs, "pair_key", dedup_combine, driver_gate=DRIVER_GATE
    )

    def split_key(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "conv_a": pd.Series(dtype="str"),
                    "conv_b": pd.Series(dtype="str"),
                    "block_id": pd.Series(dtype="str"),
                    "block_overflow": pd.Series(dtype="int64"),
                }
            )
        ab = df["pair_key"].str.split(PAIR_SEP, n=1, expand=True)
        return pd.DataFrame(
            {
                "conv_a": ab[0],
                "conv_b": ab[1],
                "block_id": df["block_id"],
                "block_overflow": df["block_overflow"],
            }
        )

    return deduped.map_batches(split_key, batch_format="pandas")
