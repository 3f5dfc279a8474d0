"""Pruned Parquet readers (SURVEY.md T1).

Replaces the reference's Wikipedia-Miner CSV loader + Redis bulk insert
(``semanticizer/wpm/load.py :: WpmLoader``; SURVEY.md S1/S2) with direct
columnar reads: only the requested columns leave storage (projection
pushdown), and row filters push down to Parquet row groups.
"""

from __future__ import annotations

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def read_transcripts(
    path: str, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """Read a transcripts table (FIXTURES.md F1 schema) with column pruning."""
    cols = columns if columns is not None else TRANSCRIPT_COLUMNS
    return rd.read_parquet(path, columns=cols, **kwargs)


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    return rd.read_parquet(path, columns=columns, **kwargs)
