"""F3: sense co-occurrence graph → Milne–Witten relatedness artifact.

The reference's distinguishing reranking capability (SURVEY.md F3;
``processors/context.py`` ContextFeaturesProcessor per the OAIR'13 paper)
scores a candidate sense by its graph relatedness to the senses already
seen in context. Recast for the pair-scoring pipeline: an OFFLINE artifact
job (like the anchor dictionary, SURVEY.md A1) computes, from the link
corpus, the Milne–Witten relatedness between every pair of senses that
co-occur in enough documents:

    mw(a, b) = 1 - (log max(|A|,|B|) - log |A∩B|) / (log N - log min(|A|,|B|))

with A = the set of documents linking to sense a and N = the number of
documents containing at least one link (unlinked documents carry no
co-occurrence evidence and are excluded from the universe)
(Milne & Witten, "An effective, low-cost measure of semantic relatedness
obtained from Wikipedia links", AAAI WikiAI 2008 — public formula). The
scorer turns this into the ``ctx_relatedness`` pair feature: the
anchor-weighted mean relatedness between the two conversations' top-M
anchor senses (stages/scoring.py).

Scale shape: one distinct-pass collapses the corpus to (doc, sense) rows;
per-doc sense sets are bounded (``doc_sense_cap``); the pair shuffle moves
counted (sense_lo, sense_hi) rows only; the artifact is pruned to the
strongest ``max_relations_per_sense`` relations per endpoint, bounding it
to O(V · R) rows — vocabulary-scale metadata, broadcastable like the
dictionary itself.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig

REL_SCHEMA = pa.schema(
    [
        ("sense_a", pa.int64()),
        ("sense_b", pa.int64()),
        ("cooc", pa.int64()),
        ("rel", pa.float64()),
    ]
)

# per-doc distinct-sense cap: a document linking hundreds of senses emits
# O(cap²) pair rows, not O(k²); counted nowhere because dropping the tail
# of a degenerate doc's sense list biases co-occurrence, not correctness
DOC_SENSE_CAP = 64


def build_relatedness(
    corpus: rd.Dataset,
    cfg: EngineConfig,
    min_cooc: int = 2,
    max_relations_per_sense: int = 64,
) -> pd.DataFrame:
    """Link corpus (doc_id, label, sense_id, …) → pruned MW relatedness
    rows (sense_a < sense_b, cooc, rel). Driver-side result: the artifact
    is vocabulary-sized by construction (≤ V · R rows)."""
    from ..functions.groupagg import sorted_apply_exact, sorted_grouped_agg

    import pyarrow.compute as pc

    linked = corpus.map_batches(
        lambda t: t.select(["doc_id", "sense_id"]).filter(
            pc.greater_equal(t["sense_id"], 0)
        ),
        batch_format="pyarrow",
    )

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return df.drop_duplicates(["doc_id", "sense_id"])

    def doc_pairs(df: pd.DataFrame) -> pd.DataFrame:
        """Complete doc groups → co-occurring sense pairs + per-sense doc
        marks (sense_b = -1 rows count distinct docs per sense; the
        (-2, -2) marker row counts documents, so N needs no extra pass)."""
        out_a: list[int] = []
        out_b: list[int] = []
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "sense_a": pd.Series(dtype="int64"),
                    "sense_b": pd.Series(dtype="int64"),
                    "n": pd.Series(dtype="int64"),
                }
            )
        from ..functions.groupagg import group_starts

        df = df.sort_values(["doc_id", "sense_id"], kind="stable").drop_duplicates(
            ["doc_id", "sense_id"]
        )
        docs = df["doc_id"].to_numpy()
        senses = df["sense_id"].to_numpy()
        bounds = np.append(group_starts(docs), len(df))
        for gi in range(len(bounds) - 1):
            mem = senses[bounds[gi] : bounds[gi + 1]][:DOC_SENSE_CAP]
            out_a.append(-2)
            out_b.append(-2)  # document marker: Σ = N
            for i, a in enumerate(mem):
                out_a.append(int(a))
                out_b.append(-1)  # doc-count mark for sense a
                for b in mem[i + 1 :]:
                    out_a.append(int(a))
                    out_b.append(int(b))
        out = pd.DataFrame(
            {
                "sense_a": pd.Series(out_a, dtype="int64"),
                "sense_b": pd.Series(out_b, dtype="int64"),
            }
        )
        return out.groupby(["sense_a", "sense_b"], sort=False).size().reset_index(
            name="n"
        )

    pairs = sorted_apply_exact(
        linked.map_batches(distinct_partial, batch_format="pandas"),
        "doc_id",
        doc_pairs,
    )

    def count_combine(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return df
        return (
            df.groupby(["sense_a", "sense_b"], sort=False)["n"].sum().reset_index()
        )

    counted = sorted_grouped_agg(
        pairs, ["sense_a", "sense_b"], count_combine, pre_combine=False
    ).to_pandas()

    if counted.empty or "sense_a" not in counted.columns:
        n_docs = 0
    else:
        n_docs = int(counted.loc[counted["sense_a"] == -2, "n"].sum())
    if counted.empty or n_docs <= 1:
        return pd.DataFrame(
            {
                "sense_a": pd.Series(dtype="int64"),
                "sense_b": pd.Series(dtype="int64"),
                "cooc": pd.Series(dtype="int64"),
                "rel": pd.Series(dtype="float64"),
            }
        )

    doc_counts = (
        counted[counted["sense_b"] == -1]
        .set_index("sense_a")["n"]
        .astype("int64")
    )
    co = counted[(counted["sense_b"] >= 0) & (counted["n"] >= min_cooc)].copy()
    if co.empty:
        return pd.DataFrame(
            {
                "sense_a": pd.Series(dtype="int64"),
                "sense_b": pd.Series(dtype="int64"),
                "cooc": pd.Series(dtype="int64"),
                "rel": pd.Series(dtype="float64"),
            }
        )
    da = doc_counts.reindex(co["sense_a"]).to_numpy(dtype=np.float64)
    db = doc_counts.reindex(co["sense_b"]).to_numpy(dtype=np.float64)
    inter = co["n"].to_numpy(dtype=np.float64)
    hi = np.maximum(da, db)
    lo = np.minimum(da, db)
    logN = np.log(float(n_docs))
    with np.errstate(divide="ignore", invalid="ignore"):
        rel = 1.0 - (np.log(hi) - np.log(inter)) / (logN - np.log(lo))
    rel = np.clip(np.nan_to_num(rel, nan=0.0, posinf=1.0, neginf=0.0), 0.0, 1.0)
    co["cooc"] = co["n"].astype("int64")
    co["rel"] = rel
    co = co[co["rel"] > 0.0][["sense_a", "sense_b", "cooc", "rel"]]

    # prune: keep a pair if it is among the strongest R relations of EITHER
    # endpoint (dropping by one endpoint's rank alone would sever the other
    # endpoint's best relation)
    r = max_relations_per_sense
    by_a = co.sort_values(["sense_a", "rel"], ascending=[True, False]).groupby(
        "sense_a", sort=False
    ).head(r)
    by_b = co.sort_values(["sense_b", "rel"], ascending=[True, False]).groupby(
        "sense_b", sort=False
    ).head(r)
    pruned = (
        pd.concat([by_a, by_b])
        .drop_duplicates(["sense_a", "sense_b"])
        .sort_values(["sense_a", "sense_b"])
        .reset_index(drop=True)
    )
    return pruned


def build_sense_degrees(corpus: rd.Dataset, cfg: EngineConfig) -> pd.DataFrame:
    """F2 concept-graph degree features (SURVEY.md F2 INDEGREE/OUTDEGREE):
    per sense — ``indegree`` = distinct documents linking to it (the
    incoming-link count of the concept), ``link_occ`` = total link
    occurrences, and ``generality`` = log(indegree + 1) (the reference's
    generality proxy). Distributed: per-batch distinct collapse, then one
    sense-keyed exchange; tested against a DuckDB oracle on the fixture
    corpus."""
    import pyarrow.compute as pc

    from ..functions.groupagg import sorted_apply_exact

    linked = corpus.map_batches(
        lambda t: t.select(["doc_id", "sense_id"]).filter(
            pc.greater_equal(t["sense_id"], 0)
        ),
        batch_format="pyarrow",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "sense_id": pd.Series(dtype="int64"),
                    "doc_id": pd.Series(dtype="int64"),
                    "occ": pd.Series(dtype="int64"),
                }
            )
        if "occ" in df.columns:
            return (
                df.groupby(["sense_id", "doc_id"], sort=False)["occ"]
                .sum()
                .reset_index()
            )
        return (
            df.groupby(["sense_id", "doc_id"], sort=False)
            .size()
            .reset_index(name="occ")
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(
                {
                    "sense_id": pd.Series(dtype="int64"),
                    "indegree": pd.Series(dtype="int64"),
                    "link_occ": pd.Series(dtype="int64"),
                    "generality": pd.Series(dtype="float64"),
                }
            )
        df = partial(df)  # re-collapse cross-batch (sense, doc) repeats
        g = df.groupby("sense_id", sort=True).agg(
            indegree=("doc_id", "nunique"), link_occ=("occ", "sum")
        )
        g["generality"] = np.log(g["indegree"].to_numpy(dtype=np.float64) + 1.0)
        return g.reset_index()

    # distinct-doc counts are NOT re-combinable from per-batch partials (a
    # doc's rows can span batches), so finalize runs on COMPLETE sense
    # groups; the per-batch partial still shrinks the shuffle to one row
    # per (sense, doc, batch)
    out = sorted_apply_exact(
        linked.map_batches(partial, batch_format="pandas"), "sense_id", finalize
    ).to_pandas()
    if out.empty or "sense_id" not in out.columns:
        return finalize(pd.DataFrame())
    return out.sort_values("sense_id").reset_index(drop=True)


class RelatednessState:
    """Packed lookup for the scoring kernel — all numpy, broadcastable.

    Fields:
      label_hash: sorted int64[L] — ``_label_hash64`` of every dict label
      label_sense: int64[L]       — the label's majority sense (occ-argmax)
      senses: sorted int64[V]     — compact sense vocabulary
      pair_keys: sorted int64[P]  — lo_idx · V + hi_idx for each rel pair
      pair_rel: float64[P]
    """

    __slots__ = ("label_hash", "label_sense", "senses", "pair_keys", "pair_rel")

    def __init__(self, label_hash, label_sense, senses, pair_keys, pair_rel):
        self.label_hash = label_hash
        self.label_sense = label_sense
        self.senses = senses
        self.pair_keys = pair_keys
        self.pair_rel = pair_rel

    @classmethod
    def empty(cls) -> "RelatednessState":
        z = np.empty(0, dtype=np.int64)
        return cls(z, z, z, z, np.empty(0, dtype=np.float64))

    @classmethod
    def from_tables(
        cls, dict_table: pa.Table | None, rel: pd.DataFrame | pa.Table | None
    ) -> "RelatednessState":
        from ..stages.scoring import _label_hash64

        if isinstance(rel, pa.Table):
            rel = rel.to_pandas()
        if dict_table is None or rel is None or len(rel) == 0:
            return cls.empty()
        labels = dict_table["label"].to_pylist()
        senses_col = dict_table["senses"].to_pylist()
        lh: list[int] = []
        ls: list[int] = []
        for lab, sl in zip(labels, senses_col):
            if not sl:
                continue
            top = max(sl, key=lambda s: (s["occ"], -s["sense_id"]))
            lh.append(_label_hash64(lab))
            ls.append(int(top["sense_id"]))
        label_hash = np.asarray(lh, dtype=np.int64)
        order = np.argsort(label_hash)
        label_hash = label_hash[order]
        label_sense = np.asarray(ls, dtype=np.int64)[order]

        sa = rel["sense_a"].to_numpy(dtype=np.int64)
        sb = rel["sense_b"].to_numpy(dtype=np.int64)
        senses = np.unique(np.concatenate([sa, sb, label_sense]))
        v = len(senses)
        ia = np.searchsorted(senses, sa)
        ib = np.searchsorted(senses, sb)
        lo = np.minimum(ia, ib).astype(np.int64)
        hi = np.maximum(ia, ib).astype(np.int64)
        keys = lo * v + hi
        korder = np.argsort(keys)
        return cls(
            label_hash,
            label_sense,
            senses,
            keys[korder],
            rel["rel"].to_numpy(dtype=np.float64)[korder],
        )

    def pack(self) -> tuple:
        return (
            self.label_hash,
            self.label_sense,
            self.senses,
            self.pair_keys,
            self.pair_rel,
        )

    @classmethod
    def from_pack(cls, pack: tuple | None) -> "RelatednessState":
        if pack is None:
            return cls.empty()
        return cls(*pack)

    def sense_of_hash(self, h: int) -> int:
        """Label hash → compact sense index, -1 if unknown."""
        i = int(np.searchsorted(self.label_hash, h))
        if i < len(self.label_hash) and self.label_hash[i] == h:
            return int(np.searchsorted(self.senses, self.label_sense[i]))
        return -1

    def rel_of(self, sidx_a: int, sidx_b: int) -> float:
        """Relatedness between two compact sense indices (1.0 on equality)."""
        if sidx_a < 0 or sidx_b < 0:
            return 0.0
        if sidx_a == sidx_b:
            return 1.0
        lo, hi = (sidx_a, sidx_b) if sidx_a < sidx_b else (sidx_b, sidx_a)
        key = lo * len(self.senses) + hi
        i = int(np.searchsorted(self.pair_keys, key))
        if i < len(self.pair_keys) and self.pair_keys[i] == key:
            return float(self.pair_rel[i])
        return 0.0
