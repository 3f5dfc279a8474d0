"""The flagship pipeline: transcripts → clusters (north_rule three stages).

    read → normalize (T2) → conv profiles (T5, one actor-pool pass that
                            also runs the anchor matcher T3 in-actor)
                               ├→ LSH band keys + anchor keys (T6)
                               │        ↓
                               │   candidate pairs (T7, salted shuffle)
                               └──→ attach + score (T8)
                                        ↓
                                   cluster_edges (T9)

One read, one actor pool, one conv-keyed shuffle feed the whole of stage 1.
Per-turn ``text`` is never touched; final outputs are sorted by
(conv_id, turn_idx) where ordering matters (north_rule invariant).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Any

import ray.data as rd

from ..config import EngineConfig
from ..stages.blocking import block_keys
from ..stages.clustering import cluster_edges
from ..stages.normalize_turns import normalize_turns
from ..stages.pairs import candidate_pairs
from ..stages.scoring import score_pairs
from ..stages.signatures import conv_profiles


def _est_key_rows(cfg: EngineConfig, n_convs: int) -> int:
    """Exact upper bound on block-key rows: bands + anchor keys per conv."""
    return n_convs * (cfg.blocking.num_bands + cfg.blocking.anchor_keys_per_conv)


@dataclass
class ERResult:
    profiles: rd.Dataset  # includes anchor summary + blocking-key columns
    pairs: rd.Dataset
    edges: rd.Dataset
    clusters: rd.Dataset


def resolve_entities(
    transcripts: rd.Dataset,
    cfg: EngineConfig,
    anchor_dict_source: Any = None,
    num_partitions: int = 16,
    relatedness: Any = None,
) -> ERResult:
    """Run the full three-stage flow. ``anchor_dict_source``: pa.Table /
    ObjectRef / parquet path for the anchor dictionary; None disables the
    anchor-feature path (LSH-only blocking, no anchor-overlap feature).
    ``relatedness``: optional ``RelatednessState`` (state/relatedness.py)
    for the F3 context feature."""
    normalized = normalize_turns(transcripts, cfg)
    profiles = conv_profiles(normalized, cfg, dict_source=anchor_dict_source).materialize()

    # launch the scoring side-state build NOW: it depends only on the
    # materialized profiles, and its pack task(s) overlap the pair stage's
    # sorted exchanges instead of sitting on the critical path
    from ..stages.scoring import prepare_side_state

    side = prepare_side_state(profiles, cfg)

    keys = block_keys(profiles, cfg, include_anchors=anchor_dict_source is not None)

    pairs = candidate_pairs(keys, cfg, est_rows=_est_key_rows(cfg, profiles.count()))

    edges = score_pairs(
        pairs, profiles, cfg, relatedness=relatedness, prepared=side
    ).materialize()
    clusters = cluster_edges(
        edges, profiles.select_columns(["conv_id"]), cfg, num_partitions
    )
    return ERResult(
        profiles=profiles,
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
    relatedness_path: str | None = None,
    pair_resume_buckets: int | None = None,
) -> "rd.Dataset":
    """Checkpointed flagship run (T10): each stage lands as per-partition
    Parquet + manifest under ``checkpoint_dir``; a rerun (same config, same
    inputs) reuses every valid stage and recomputes only what changed —
    resume-equals-fresh is asserted by tests.

    The pair shuffle — the pipeline's heaviest stage — checkpoints at
    PARTITION granularity (north_rule "resumes mid-shuffle"): blocking
    keys hash into ``pair_resume_buckets`` buckets, each bucket's
    candidate_pairs output lands as an atomically-renamed part, and a
    crashed run resumes from the finished parts (anti-join of part ids).
    A cheap merge stage dedups pairs found via keys in different buckets.

    Stage graph and lineage chain (fingerprints feed forward):
        transcripts ─ profiles ─ keys+pairs(parts) ─ pairs_merge ─ edges ─ clusters
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

    rel_state = None
    if relatedness_path is not None:
        import pyarrow.parquet as pq

        from ..state.relatedness import RelatednessState

        rel_state = RelatednessState.from_tables(
            dict_table, pq.read_table(relatedness_path)
        )
        in_fp = in_fp + "+" + fingerprint_paths([relatedness_path])

    def transcripts() -> rd.Dataset:
        from ..sources.parquet import read_transcripts

        return read_transcripts(transcripts_path)

    prof = ck.stage(
        "profiles",
        in_fp,
        lambda: conv_profiles(
            normalize_turns(transcripts(), cfg), cfg, dict_source=dict_table
        ),
    )

    def make_block_keys() -> rd.Dataset:
        return block_keys(prof.dataset, cfg, include_anchors=dict_table is not None)

    from ..stages.pairs import bucket_of_block_keys, merge_pair_parts

    # resume granularity vs fixed cost: each bucket part runs a full
    # candidate_pairs pipeline (~7 s fixed), so by default small inputs use
    # fewer buckets (1 per ~10k conversations, capped at 8). Deterministic
    # in the input; a changed bucket count on resume is caught by the
    # part_ids guard (PENDING for in-flight stages, manifest for completed
    # ones) and rebuilds the stage. Pass ``pair_resume_buckets`` to pin the
    # count explicitly.
    if pair_resume_buckets is None:
        n_buckets = max(1, min(8, prof.dataset.count() // 10_000))
    else:
        n_buckets = max(1, pair_resume_buckets)

    def make_pairs_part(pid: str) -> rd.Dataset:
        import pandas as pd

        bucket = int(pid[1:])

        def only_bucket(df: pd.DataFrame) -> pd.DataFrame:
            if len(df) == 0:
                return df
            hb = bucket_of_block_keys(df["block_key"].to_numpy(), n_buckets)
            return df[hb == bucket]

        return candidate_pairs(
            make_block_keys().map_batches(only_bucket, batch_format="pandas"),
            cfg,
            est_rows=_est_key_rows(cfg, prof.dataset.count()) // n_buckets,
        )

    part_ids = [f"b{i}" for i in range(n_buckets)]
    pair_parts = ck.partitioned_stage(
        "pairs", prof.fingerprint, part_ids, make_pairs_part
    )
    pairs = ck.stage(
        "pairs_merge",
        pair_parts.fingerprint,
        lambda: merge_pair_parts(pair_parts.dataset),
    )

    def make_edges() -> rd.Dataset:
        return score_pairs(pairs.dataset, prof.dataset, cfg, relatedness=rel_state)

    edges = ck.stage(
        "edges", f"{pairs.fingerprint}+{prof.fingerprint}", make_edges
    )

    clusters = ck.stage(
        "clusters",
        edges.fingerprint,
        lambda: cluster_edges(
            edges.dataset, prof.dataset.select_columns(["conv_id"]), cfg, num_partitions
        ),
    )
    return clusters.dataset
