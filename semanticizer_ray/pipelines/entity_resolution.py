"""The flagship pipeline: transcripts → clusters (north_rule three stages).

    read → normalize (T2) → ┬→ mentions (T3, actor pool) → anchor summaries ┐
                            └→ conv profiles (T5) ────────┬─────────────────┤
                                                          │   blocking keys (T6)
                                                          │        ↓
                                                side table│   candidate pairs (T7, salted shuffle)
                                                          └──→ attach + score (T8)
                                                                   ↓
                                                          cluster_edges (T9)

Per-turn ``text`` is never touched; final outputs are sorted by
(conv_id, turn_idx) where ordering matters (north_rule invariant).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import ray.data as rd

from ..config import EngineConfig
from ..stages.blocking import anchor_block_keys, anchor_summaries, lsh_block_keys
from ..stages.clustering import cluster_edges
from ..stages.mentions import extract_mentions
from ..stages.normalize_turns import normalize_turns
from ..stages.pairs import candidate_pairs
from ..stages.scoring import attach_profiles, build_side_table, score_pairs
from ..stages.signatures import conv_profiles


@dataclass
class ERResult:
    profiles: rd.Dataset
    mentions: rd.Dataset | None
    summaries: rd.Dataset | None
    pairs: rd.Dataset
    edges: rd.Dataset
    clusters: rd.Dataset


def resolve_entities(
    transcripts: rd.Dataset,
    cfg: EngineConfig,
    anchor_dict_source: Any = None,
    num_partitions: int = 16,
) -> ERResult:
    """Run the full three-stage flow. ``anchor_dict_source``: pa.Table /
    ObjectRef / parquet path for the anchor dictionary; None disables the
    anchor-feature path (LSH-only blocking, no anchor-overlap feature)."""
    normalized = normalize_turns(transcripts, cfg)
    profiles = conv_profiles(normalized, cfg).materialize()

    keys = lsh_block_keys(profiles, cfg)
    summaries = None
    if anchor_dict_source is not None:
        mentions = extract_mentions(normalized, anchor_dict_source, cfg)
        summaries = anchor_summaries(mentions, cfg).materialize()
        keys = keys.union(anchor_block_keys(summaries))
    else:
        mentions = None

    pairs = candidate_pairs(keys, cfg)

    side = build_side_table(profiles, summaries, num_partitions)
    joined = attach_profiles(pairs, side, num_partitions)
    edges = score_pairs(joined, cfg).materialize()
    clusters = cluster_edges(
        edges, profiles.select_columns(["conv_id"]), cfg, num_partitions
    )
    return ERResult(
        profiles=profiles,
        mentions=mentions,
        summaries=summaries,
        pairs=pairs,
        edges=edges,
        clusters=clusters,
    )
