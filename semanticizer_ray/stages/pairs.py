"""Stage T7: blocking keys → deduplicated candidate pairs.

This is the pipeline's big all-to-all shuffle (SURVEY.md T7 / §4 skew row),
with explicit hot-key handling per north_rule:

1. census: per-batch partial counts → tiny ``groupby(block_key).sum`` →
   keys over ``max_block_size`` collected to the driver (bounded: output is
   ≤ one row per distinct hot key) and broadcast;
2. salt explode: a hot key with n members gets s = ceil(n / max_block_size)
   salts (capped at MAX_SALT). Member x lands in salt i = hash(conv)%s and
   is replicated into the s groups {key#(min(i,j),max(i,j))}: every pair of
   members still meets in EXACTLY one salted group (triangle replication —
   exact pair coverage, s× row replication of tiny rows);
3. ``groupby(salted_key).map_groups``: sorted member list → within/cross
   pairs (conv_a < conv_b), capped at ``max_pairs_per_block`` (overflow is
   COUNTED on emitted rows via the ``block_overflow`` column — no silent
   truncation);
4. global pair dedup: ``groupby(conv_a, conv_b)`` keep-first (a pair found
   by many bands is scored once).

Rows entering the shuffle are (block_key, conv_id) only — profiles/features
are attached to the deduplicated pairs afterwards (stage T8) via a
conv-keyed hash join, so the quadratic step never moves text.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import EngineConfig

MAX_SALT = 8

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


def block_census(block_rows: rd.Dataset, cfg: EngineConfig) -> dict[str, int]:
    """Hot blocking keys → member count. Small driver-side dict (only keys
    above ``max_block_size``); partial-aggregated before the groupby."""
    cap = cfg.blocking.max_block_size

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("block_key", sort=False).size().reset_index(name="n")
        return g

    counts = (
        block_rows.map_batches(partial, batch_format="pandas", batch_size=65536)
        .groupby("block_key")
        .sum("n")
    )
    hot = counts.map_batches(
        lambda t: t.filter(np.asarray(t["sum(n)"]) > cap), batch_format="pyarrow"
    ).to_pandas()
    if hot.empty or "block_key" not in hot.columns:
        return {}
    return dict(zip(hot["block_key"], hot["sum(n)"].astype(int)))


def candidate_pairs(block_rows: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """(block_key, conv_id) rows → deduplicated (conv_a, conv_b) pairs."""
    bcfg = cfg.blocking
    hot = block_census(block_rows, cfg)
    hot_ref = ray.put(
        {
            k: min(MAX_SALT, -(-n // bcfg.max_block_size))
            for k, n in hot.items()
        }
    )

    class SaltExplode:
        def __init__(self):
            self.hot: dict[str, int] = ray.get(hot_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            keys = batch["block_key"].to_pylist()
            convs = batch["conv_id"].to_pylist()
            out_key, out_conv = [], []
            for key, conv in zip(keys, convs):
                s = self.hot.get(key)
                if s is None or s <= 1:
                    out_key.append(key)
                    out_conv.append(conv)
                else:
                    i = _stable_hash(conv) % s
                    for j in range(s):
                        lo, hi = min(i, j), max(i, j)
                        out_key.append(f"{key}#s{s}:{lo}-{hi}")
                        out_conv.append(conv)
            return pa.table(
                {
                    "block_key": pa.array(out_key, pa.string()),
                    "conv_id": pa.array(out_conv, pa.string()),
                }
            )

    salted = block_rows.map_batches(SaltExplode, batch_format="pyarrow",
                                    concurrency=(1, cfg.actor_concurrency))

    max_pairs = bcfg.max_pairs_per_block

    def gen_pairs(group: pd.DataFrame) -> pd.DataFrame:
        key = group["block_key"].iloc[0]
        members = sorted(set(group["conv_id"]))
        pairs: list[tuple[str, str]] = []
        if "#s" in key:
            base, salt_part = key.rsplit("#s", 1)
            s_str, rng = salt_part.split(":", 1)
            s = int(s_str)
            lo, hi = (int(x) for x in rng.split("-"))
            if lo == hi:
                members = [m for m in members if _stable_hash(m) % s == lo]
                pairs = [
                    (a, b)
                    for ai, a in enumerate(members)
                    for b in members[ai + 1 :]
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
        if not pairs:
            return pd.DataFrame(
                {"conv_a": [], "conv_b": [], "block_id": [], "block_overflow": []}
            )
        return pd.DataFrame(
            {
                "conv_a": [p[0] for p in pairs],
                "conv_b": [p[1] for p in pairs],
                "block_id": key,
                "block_overflow": overflow,
            }
        )

    all_pairs = salted.groupby("block_key").map_groups(
        gen_pairs, batch_format="pandas"
    )

    def dedup(group: pd.DataFrame) -> pd.DataFrame:
        return group.sort_values("block_id").head(1)

    return all_pairs.groupby(["conv_a", "conv_b"]).map_groups(
        dedup, batch_format="pandas"
    )
