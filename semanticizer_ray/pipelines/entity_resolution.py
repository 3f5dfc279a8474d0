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

import os
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
        keys = keys.union(anchor_block_keys(summaries, cfg))
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


def resolve_entities_checkpointed(
    transcripts_path: str,
    cfg: EngineConfig,
    checkpoint_dir: str,
    anchor_dict_path: str | None = None,
    num_partitions: int = 16,
) -> "rd.Dataset":
    """Checkpointed flagship run (T10): each stage lands as per-partition
    Parquet + manifest under ``checkpoint_dir``; a rerun (same config, same
    inputs) reuses every valid stage and recomputes only what changed —
    resume-equals-fresh is asserted by tests.

    Stage graph and lineage chain (fingerprints feed forward):
        transcripts ─ profiles ─ keys+pairs ─ edges ─ clusters
                    └ summaries ┘
    """
    import glob

    from ..stages.checkpoint import Checkpointer, fingerprint_paths

    ck = Checkpointer(checkpoint_dir, cfg)
    in_paths = sorted(glob.glob(os.path.join(transcripts_path, "*.parquet"))) or [
        transcripts_path
    ]
    in_fp = fingerprint_paths(in_paths)

    dict_table = None
    if anchor_dict_path is not None:
        import pyarrow.parquet as pq

        dict_table = pq.read_table(anchor_dict_path)
        in_fp = in_fp + "+" + fingerprint_paths([anchor_dict_path])

    def transcripts() -> rd.Dataset:
        return rd.read_parquet(transcripts_path)

    prof = ck.stage(
        "profiles",
        in_fp,
        lambda: conv_profiles(normalize_turns(transcripts(), cfg), cfg),
    )

    if dict_table is not None:
        summ = ck.stage(
            "summaries",
            in_fp,
            lambda: anchor_summaries(
                extract_mentions(normalize_turns(transcripts(), cfg), dict_table, cfg),
                cfg,
            ),
        )
        summaries = summ.dataset
        summ_fp = summ.fingerprint
    else:
        summaries, summ_fp = None, "none"

    def make_pairs() -> rd.Dataset:
        keys = lsh_block_keys(prof.dataset, cfg)
        if summaries is not None:
            keys = keys.union(anchor_block_keys(summaries, cfg))
        return candidate_pairs(keys, cfg)

    pairs = ck.stage("pairs", f"{prof.fingerprint}+{summ_fp}", make_pairs)

    def make_edges() -> rd.Dataset:
        side = build_side_table(prof.dataset, summaries, num_partitions)
        joined = attach_profiles(pairs.dataset, side, num_partitions)
        return score_pairs(joined, cfg)

    edges = ck.stage(
        "edges", f"{pairs.fingerprint}+{prof.fingerprint}+{summ_fp}", make_edges
    )

    clusters = ck.stage(
        "clusters",
        edges.fingerprint,
        lambda: cluster_edges(
            edges.dataset, prof.dataset.select_columns(["conv_id"]), cfg, num_partitions
        ),
    )
    return clusters.dataset
