"""Stage T2: add ``norm_text`` per turn; never mutates ``text``.

Reference semantics: ``semanticizer/wpm/utils.py :: normalize`` applied to
surface n-grams at lookup time (SURVEY.md M3). We precompute the normalized
turn text once, vectorized, in a stateless ``map_batches`` over Arrow
batches; the raw ``text`` column is untouched (north_rule per-turn
text-equality invariant).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..functions.normalize import normalize_array


def normalize_turns(
    ds: rd.Dataset, cfg: EngineConfig, batch_size: int | None = None
) -> rd.Dataset:
    ncfg = cfg.normalize

    def add_norm(batch: pa.Table) -> pa.Table:
        normed = normalize_array(batch["text"].to_numpy(zero_copy_only=False), ncfg)
        return batch.append_column("norm_text", pa.array(normed, pa.string()))

    return ds.map_batches(
        add_norm, batch_format="pyarrow", batch_size=batch_size or cfg.batch_size
    )
