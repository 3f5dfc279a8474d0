"""Pruned Parquet readers (SURVEY.md T1).

Replaces the reference's Wikipedia-Miner CSV loader + Redis bulk insert
(``semanticizer/wpm/load.py :: WpmLoader``; SURVEY.md S1/S2) with direct
columnar reads: only the requested columns leave storage (projection
pushdown), and row filters push down to Parquet row groups.

Block sizing: Ray's default read parallelism (~200 blocks) produces sub-MB
blocks on small-to-medium inputs, and every downstream range-partitioned
sort pays overhead roughly quadratic in its input block count (measured in
this sandbox: sorting 100 MB as 239 blocks costs ~4 s more than the same
bytes as 64 blocks, at 8 and 32 CPUs alike — pure fixed cost). ``_auto_num_blocks``
therefore clamps the block count of mid-sized reads to a few blocks per
CPU; genuinely large inputs (≥ ~16 MB per 4 blocks/CPU) keep Ray's own
sizing, so at 100 TB nothing changes.
"""

from __future__ import annotations

import glob
import os

import ray.data as rd

TRANSCRIPT_COLUMNS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

_MIN_OVERRIDE_BYTES = 32 << 20  # below this, Ray's default sizing is fine
_TARGET_BLOCK_BYTES = 16 << 20


def _auto_num_blocks(
    path: str, lo_per_cpu: int = 2, hi_per_cpu: int = 4
) -> int | None:
    """Block-count override for mid-sized inputs (module docstring)."""
    try:
        import ray

        if not ray.is_initialized():
            return None
        paths = (
            sorted(glob.glob(os.path.join(path, "*.parquet")))
            if os.path.isdir(path)
            else [path]
        )
        total = sum(os.path.getsize(p) for p in paths if os.path.exists(p))
        cpus = int(ray.cluster_resources().get("CPU", 8))
    except Exception:
        return None
    if total < _MIN_OVERRIDE_BYTES:
        return None
    by_size = total // _TARGET_BLOCK_BYTES
    if by_size >= hi_per_cpu * cpus:
        return None  # big input: Ray's own sizing already yields ≥16MB blocks
    return int(min(hi_per_cpu * cpus, max(lo_per_cpu * cpus, by_size)))


def read_transcripts(
    path: str, columns: list[str] | None = None, **kwargs
) -> rd.Dataset:
    """Read a transcripts table (FIXTURES.md F1 schema) with column pruning.

    Transcripts feed the pipeline's heaviest per-row compute (normalize +
    shingle + anchor-match, ~300 µs/turn), so block count is sized at 4–6
    blocks/CPU: with the default 2/CPU the 100k-tier partials pass ran 72
    tasks of ~4.8 s on 32 cores — 2.25 waves, a third of the last wave
    idle (measured: ~6 s of the stage's 18 s wall). Smaller blocks pack
    waves tighter; the downstream conv-keyed sort moves the same bytes
    either way."""
    cols = columns if columns is not None else TRANSCRIPT_COLUMNS
    if "override_num_blocks" not in kwargs:
        nb = _auto_num_blocks(path, lo_per_cpu=4, hi_per_cpu=6)
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    return read_table(path, columns=cols, **kwargs)


def read_table(path: str, columns: list[str] | None = None, **kwargs) -> rd.Dataset:
    if "override_num_blocks" not in kwargs:
        nb = _auto_num_blocks(path)
        if nb is not None:
            kwargs["override_num_blocks"] = nb
    return rd.read_parquet(path, columns=columns, **kwargs)
