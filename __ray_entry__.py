"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported; nothing
here (or in ``semanticizer_ray``) calls ``ray.init``/``ray.shutdown``.

- ``entry()``      — flagship three-stage entity-resolution pipeline on
  sf0.001-sized synthetic transcripts (BASELINE.json input_hint shape).
- ``queries()``    — every implemented operator from SURVEY.md §2
  (relational layer T11, text analysis, dedup suite, similarity search,
  ER stages), keyed by name; each callable takes ``sf_dir``.
- ``oracle_sql()`` — DuckDB equivalents for the SQL-expressible subset;
  column names match the Ray outputs exactly.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path
from typing import Any

sys.path.insert(0, str(Path(__file__).resolve().parent))

from semanticizer_ray.pipelines.catalog import CATALOG  # noqa: E402


def entry() -> Any:
    """Flagship pipeline on sf0.001-scale input; returns the clusters."""
    from semanticizer_ray.pipelines.catalog import er_clusters

    return er_clusters("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    return {name: fn for name, (fn, _sql) in CATALOG.items()}


def oracle_sql() -> dict[str, str]:
    # er_quality's oracle re-clusters the engine's scored match edges from a
    # Parquet artifact; make sure it exists even if the driver evaluates the
    # oracle before the Ray query (idempotent, sf0.001-scale)
    from semanticizer_ray.pipelines.catalog import (
        ensure_embedding_neardup_artifacts,
        ensure_er_quality_artifacts,
        ensure_knn_ivf_artifacts,
        ensure_knn_quantized_artifacts,
        ensure_knn_recall_artifacts,
    )

    ensure_er_quality_artifacts()
    # same for the ANN-quality and near-dup-recall gates' artifacts
    ensure_knn_recall_artifacts()
    ensure_knn_ivf_artifacts()
    ensure_knn_quantized_artifacts()
    ensure_embedding_neardup_artifacts()
    return {name: sql for name, (_fn, sql) in CATALOG.items() if sql is not None}
