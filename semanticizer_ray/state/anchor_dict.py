"""Anchor ("label") dictionary: build job + in-actor lookup structure.

Reference data model D3/D4 (SURVEY.md §1.1): per label —
``linkOccCount, linkDocCount, textOccCount, textDocCount`` and a sense list
``{sense_id → (occ, doc, from_title, from_redirect)}``, keyed by a
normalization index norm(label) → raw labels
(``semanticizer/wpm/load.py :: WpmLoader.load_labels``,
``semanticizer/wpm/data.py :: WpmData.get_entity_data / get_sense_data``).

Scores, with the reference's formulas (``processors/semanticize.py``):
- link_probability (keyphraseness) = link_doc / text_doc
- prior_probability (commonness)   = sense_occ / link_occ
- sense_probability                = sense_doc / link_doc

Architectural inversion vs the reference (SURVEY.md St1): instead of a
shared Redis hit per n-gram lookup, the dictionary is a Parquet artifact
built once by a Ray aggregation job and loaded into each matcher actor's
``__init__`` — zero RPC per lookup.

Build shape (scale notes): per-batch partial aggregation first collapses the
corpus to distinct ``(label, sense_id, doc_id) → occ`` rows (the shuffle
moves counts, not raw occurrences), then ONE ``groupby("label")`` computes
exact distinct-doc stats and the sense list per label inside ``map_groups``.
A label's group is bounded by its distinct (sense, doc) pairs; the dict
build is the offline-artifact job (the reference outsourced its equivalent
to Wikipedia Miner on Hadoop — SURVEY.md A1), so one label-keyed shuffle is
the right trade.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig, NormalizeConfig
from ..functions.normalize import normalize_text

SENSE_TYPE = pa.list_(
    pa.struct(
        [
            ("sense_id", pa.int64()),
            ("occ", pa.int64()),
            ("doc", pa.int64()),
            ("from_title", pa.bool_()),
            ("from_redirect", pa.bool_()),
        ]
    )
)

DICT_SCHEMA = pa.schema(
    [
        ("label", pa.string()),
        ("norm", pa.string()),
        ("link_occ", pa.int64()),
        ("link_doc", pa.int64()),
        ("text_occ", pa.int64()),
        ("text_doc", pa.int64()),
        ("senses", SENSE_TYPE),
    ]
)


def build_anchor_dict(corpus: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """T4: link corpus (FIXTURES.md F3) → anchor dict rows (F4 schema)."""
    ncfg = cfg.normalize

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # collapse within-batch to (label, sense_id, doc_id) partial counts
        g = (
            batch.groupby(["label", "sense_id", "doc_id"], sort=False)
            .agg(
                occ=("doc_id", "size"),
                from_title=("from_title", "any"),
                from_redirect=("from_redirect", "any"),
            )
            .reset_index()
        )
        return g

    partials = corpus.map_batches(partial, batch_format="pandas", batch_size=65536)

    def finalize_block(df: pd.DataFrame) -> pa.Table:
        """Complete label groups (many per block) → one dict row per label,
        vectorized with frame-level pandas aggregations — NOT the ~2 ms/group
        ``map_groups`` pattern (``functions/groupagg.py`` module docstring)."""
        if len(df) == 0:
            return DICT_SCHEMA.empty_table()
        # partial rows from different input batches may repeat a
        # (label, sense, doc) key: combine exactly once
        g = (
            df.groupby(["label", "sense_id", "doc_id"], sort=False)
            .agg(
                occ=("occ", "sum"),
                from_title=("from_title", "any"),
                from_redirect=("from_redirect", "any"),
            )
            .reset_index()
        )
        by_label = g.groupby("label", sort=True)
        stats = by_label.agg(text_occ=("occ", "sum"), text_doc=("doc_id", "nunique"))
        linked = g[g["sense_id"] >= 0]
        lstats = linked.groupby("label", sort=False).agg(
            link_occ=("occ", "sum"), link_doc=("doc_id", "nunique")
        )
        stats = stats.join(lstats, how="left").fillna(0)
        sg = (
            linked.groupby(["label", "sense_id"], sort=True)
            .agg(
                occ=("occ", "sum"),
                doc=("doc_id", "nunique"),
                from_title=("from_title", "any"),
                from_redirect=("from_redirect", "any"),
            )
            .reset_index()
        )
        senses_map: dict[str, list[dict]] = {}
        for row in sg.itertuples(index=False):
            senses_map.setdefault(row.label, []).append(
                {
                    "sense_id": int(row.sense_id),
                    "occ": int(row.occ),
                    "doc": int(row.doc),
                    "from_title": bool(row.from_title),
                    "from_redirect": bool(row.from_redirect),
                }
            )
        labels = list(stats.index)
        return pa.table(
            {
                "label": pa.array(labels, pa.string()),
                "norm": pa.array(
                    [normalize_text(lab, ncfg) for lab in labels], pa.string()
                ),
                "link_occ": pa.array(stats["link_occ"].astype("int64")),
                "link_doc": pa.array(stats["link_doc"].astype("int64")),
                "text_occ": pa.array(stats["text_occ"].astype("int64")),
                "text_doc": pa.array(stats["text_doc"].astype("int64")),
                "senses": pa.array(
                    [senses_map.get(lab, []) for lab in labels], SENSE_TYPE
                ),
            }
        )

    from ..functions.groupagg import sorted_apply_exact

    return sorted_apply_exact(partials, "label", finalize_block)


class AnchorDict:
    """In-memory lookup: norm(ngram) → candidate entries with scores.

    Loaded once per matcher/scorer actor (``__init__``), queried per n-gram
    with plain dict gets. Mirrors ``WpmData.normalized_entities_exist /
    get_all_entities / get_entity_data / get_sense_data`` without the KV hop.
    """

    def __init__(self, table: pa.Table, min_link_probability: float = 0.0):
        self.by_norm: dict[str, list[dict]] = {}
        # first tokens of MULTIWORD norms: lets matchers skip building the
        # n≥2 n-gram surface strings at positions that cannot start one
        # (the join dominated the anchor-count pass — most tokens start no
        # multiword anchor)
        self.multi_first: set[str] = set()
        self.max_words = 1
        labels = table["label"].to_pylist()
        norms = table["norm"].to_pylist()
        link_occ = table["link_occ"].to_pylist()
        link_doc = table["link_doc"].to_pylist()
        text_occ = table["text_occ"].to_pylist()
        text_doc = table["text_doc"].to_pylist()
        senses = table["senses"].to_pylist()
        for i in range(table.num_rows):
            lp = link_doc[i] / text_doc[i] if text_doc[i] else 0.0
            if lp < min_link_probability:
                continue
            entry = {
                "label": labels[i],
                "link_occ": link_occ[i],
                "link_doc": link_doc[i],
                "text_occ": text_occ[i],
                "text_doc": text_doc[i],
                "link_probability": lp,
                "senses": senses[i] or [],
            }
            self.by_norm.setdefault(norms[i], []).append(entry)
            words = norms[i].split()
            if len(words) > 1:
                self.multi_first.add(words[0])
            self.max_words = max(self.max_words, len(words))
        self._batch_index = None

    def ensure_batch_index(self):
        """Vectorized-lookup mirror of ``by_norm`` for the batch count path
        (``mentions.candidate_entries_batch``): one pandas hash probe per
        BATCH of surfaces instead of a python dict get per n-gram, plus CSR
        expansion arrays norm → its entries (order preserved). Built
        LAZILY on first use — the T3 span-accurate matcher actors only use
        the scalar path and must not pay this per-actor startup loop.
        Returns (norm_index, ent_start, ent_label, ent_lp, ent_ld)."""
        if self._batch_index is not None:
            return self._batch_index
        import numpy as np

        norm_index = pd.Index(list(self.by_norm.keys()), dtype=object)
        ent_label, ent_lp, ent_ld, counts = [], [], [], []
        for norm in norm_index:
            es = self.by_norm[norm]
            counts.append(len(es))
            for e in es:
                ent_label.append(e["label"])
                ent_lp.append(e["link_probability"])
                ent_ld.append(e["link_doc"])
        self._batch_index = (
            norm_index,
            np.concatenate(
                [[0], np.cumsum(np.asarray(counts, dtype=np.int64))]
            ).astype(np.int64),
            np.asarray(ent_label, dtype=object),
            np.asarray(ent_lp, dtype=np.float64),
            np.asarray(ent_ld, dtype=np.int64),
        )
        return self._batch_index

    @classmethod
    def from_parquet(cls, path: str, **kw) -> "AnchorDict":
        import pyarrow.parquet as pq

        return cls(pq.read_table(path), **kw)

    def lookup(self, norm_ngram: str) -> list[dict]:
        return self.by_norm.get(norm_ngram, [])

    def __len__(self) -> int:
        return len(self.by_norm)


def make_anchor_dict_table(rows: list[dict]) -> pa.Table:
    """Hand-built dict rows (tests / golden fixtures) → schema'd table."""
    cfg = NormalizeConfig()
    for r in rows:
        r.setdefault("norm", normalize_text(r["label"], cfg))
    return pa.Table.from_pylist(rows, schema=DICT_SCHEMA)
