"""Stage T3: mention extraction — tokenize → n-grams → anchor match → senses.

Reference semantics (``semanticizer/processors/semanticize.py ::
Semanticizer.semanticize``; SURVEY.md M1+M2+M4+M5): tokenize the ORIGINAL
text with char offsets, enumerate word n-grams up to the longest label,
normalize each n-gram for dictionary lookup, and for every (label, sense)
emit a candidate with
    link_probability  = link_doc / text_doc        (keyphraseness)
    prior_probability = sense_occ / link_occ       (commonness)
    sense_probability = sense_doc / link_doc
filtered by ``min_sense_probability`` (reference config
``sense_probability_threshold``) with an optional unique-per-sense top-1
filter (``FilterProcessor.filter_links`` "unique", M7). Overlapping n-gram
matches are all emitted, as in the reference.

Ray shape: a STATEFUL ACTOR POOL — the dictionary is loaded once per actor
in ``__init__`` (from a broadcast ``ray.put`` ref or a Parquet path), then
every batch is pure in-memory lookups. Per-batch memoization collapses
repeated surface n-grams; the dict bounds n-gram length via ``max_words``.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.normalize import (
    normalize_text,
    tokenize_with_spans,
    word_ngrams_with_spans,
)
from ..state.anchor_dict import AnchorDict

MENTION_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("ngram", pa.string()),
        ("label", pa.string()),
        ("link_probability", pa.float64()),
        ("sense_id", pa.int64()),
        ("prior_probability", pa.float64()),
        ("sense_probability", pa.float64()),
        # label-level link_doc count: global rarity signal used by
        # anchor-derived blocking keys (stages/blocking.py) — carried here so
        # blocking needs no extra census shuffle
        ("label_link_doc", pa.int64()),
    ]
)


class AnchorMatcher:
    """Callable class for ``map_batches(AnchorMatcher, concurrency=N, ...)``."""

    def __init__(self, dict_source: Any, cfg: EngineConfig):
        """``dict_source``: ray ObjectRef of a pa.Table, a pa.Table, or a
        Parquet path string. Loaded ONCE per actor."""
        if isinstance(dict_source, ray.ObjectRef):
            table = ray.get(dict_source)
        elif isinstance(dict_source, str):
            import pyarrow.parquet as pq

            table = pq.read_table(dict_source)
        else:
            table = dict_source
        self.cfg = cfg
        self.dict = AnchorDict(table, min_link_probability=cfg.anchor.min_link_probability)
        self.max_n = min(cfg.anchor.max_ngram, self.dict.max_words)
        self.ncfg = cfg.normalize

    def count_labels_normtext(self, norm_text: str) -> dict[str, tuple[int, float, int]]:
        """Fast anchor counting over ALREADY-NORMALIZED text: label →
        (count, link_probability, link_doc).

        Skips span bookkeeping and per-n-gram normalization (the text is
        normalized once upstream; n-grams of its ``\\w+`` tokens are already
        in dictionary-normal form). Used by the profile pass, where spans
        are irrelevant. Edge note: tokens that normalization SPLITS
        (underscores, ligatures) count as their split parts here, unlike
        the span-accurate path — consistent within the pipeline since both
        sides of every comparison use this path.
        """
        from ..functions.normalize import _TOKEN

        toks = _TOKEN.findall(norm_text)
        out: dict[str, tuple[int, float, int]] = {}
        lookup = self.dict.lookup
        multi_first = self.dict.multi_first
        max_n = self.max_n
        n_tok = len(toks)
        for i in range(n_tok):
            # unigram: the token IS the surface (no join)
            for e in lookup(toks[i]):
                lab = e["label"]
                if lab in out:
                    c, lp, ld = out[lab]
                    out[lab] = (c + 1, lp, ld)
                else:
                    out[lab] = (1, e["link_probability"], e["link_doc"])
            # n≥2 grams only where some multiword anchor starts with this
            # token — skips the surface-string join almost everywhere
            if toks[i] not in multi_first:
                continue
            for n in range(2, max_n + 1):
                if i + n > n_tok:
                    break
                surface = " ".join(toks[i : i + n])
                for e in lookup(surface):
                    lab = e["label"]
                    if lab in out:
                        c, lp, ld = out[lab]
                        out[lab] = (c + 1, lp, ld)
                    else:
                        out[lab] = (1, e["link_probability"], e["link_doc"])
        return out

    def candidate_entries_batch(self, norm_texts):
        """Vectorized twin of ``count_labels_normtext`` over a LIST of
        already-normalized texts: returns (slot, label, lp, ld) numpy
        arrays, one row per dictionary ENTRY hit, in exactly the scalar
        path's first-seen order (text asc, token position asc, n-gram
        length asc, entry order). The n-gram surface generation stays
        python (gated by ``multi_first``); the 20+ lookups per turn
        collapse into ONE pandas hash probe per batch plus CSR expansion —
        the scalar path's dict-get loop was ~half the profile stage's CPU.

        Parity with the scalar path is asserted in tests (same counts,
        same first-seen lp/ld, same first-seen order)."""
        from ..functions.normalize import _TOKEN

        d = self.dict
        norm_index, ent_start, ent_label, ent_lp, ent_ld = d.ensure_batch_index()
        mf = d.multi_first
        max_n = self.max_n
        surfaces: list[str] = []
        slots: list[int] = []
        for s, text in enumerate(norm_texts):
            toks = _TOKEN.findall(text or "")
            n_tok = len(toks)
            for i in range(n_tok):
                surfaces.append(toks[i])  # unigram first (scalar order)
                slots.append(s)
                if toks[i] not in mf:
                    continue
                for n in range(2, max_n + 1):
                    if i + n > n_tok:
                        break
                    surfaces.append(" ".join(toks[i : i + n]))
                    slots.append(s)
        if not surfaces:
            return (
                np.empty(0, np.int64),
                np.empty(0, object),
                np.empty(0, np.float64),
                np.empty(0, np.int64),
            )
        idx = norm_index.get_indexer(np.asarray(surfaces, dtype=object))
        hit = idx >= 0
        hidx = idx[hit]
        hslot = np.asarray(slots, dtype=np.int64)[hit]
        starts = ent_start[hidx]
        reps = ent_start[hidx + 1] - starts
        total = int(reps.sum())
        if total == 0:
            return (
                np.empty(0, np.int64),
                np.empty(0, object),
                np.empty(0, np.float64),
                np.empty(0, np.int64),
            )
        # flat entry positions: per-hit arange(start, end), concatenated
        pos = np.repeat(starts, reps) + (
            np.arange(total, dtype=np.int64)
            - np.repeat(
                np.concatenate(([0], np.cumsum(reps)[:-1])).astype(np.int64), reps
            )
        )
        slot_e = np.repeat(hslot, reps)
        return slot_e, ent_label[pos], ent_lp[pos], ent_ld[pos]

    def _candidates_for_text(self, text: str) -> list[tuple[int, int, str, dict]]:
        """(start, end, surface, dict entry) for every matching n-gram."""
        toks = tokenize_with_spans(text)
        out = []
        memo: dict[str, list[dict]] = {}
        for surface, start, end in word_ngrams_with_spans(toks, self.max_n):
            entries = memo.get(surface)
            if entries is None:
                entries = self.dict.lookup(normalize_text(surface, self.ncfg))
                memo[surface] = entries
            for e in entries:
                out.append((start, end, surface, e))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        acfg = self.cfg.anchor
        conv = batch["conv_id"].to_pylist()
        tidx = batch["turn_idx"].to_pylist()
        texts = batch["text"].to_pylist()
        cols: dict[str, list] = {name: [] for name in MENTION_SCHEMA.names}
        # memo across rows too: surface n-grams repeat heavily in transcripts
        text_memo: dict[str, list] = {}
        for r in range(batch.num_rows):
            text = texts[r] or ""
            cands = text_memo.get(text)
            if cands is None:
                cands = self._candidates_for_text(text)
                text_memo[text] = cands
            kept: list[tuple] = []
            for start, end, surface, e in cands:
                link_occ = e["link_occ"]
                link_doc = e["link_doc"]
                for s in e["senses"]:
                    prior = s["occ"] / link_occ if link_occ else 0.0
                    sense_p = s["doc"] / link_doc if link_doc else 0.0
                    if sense_p < acfg.min_sense_probability:
                        continue
                    kept.append(
                        (
                            start,
                            end,
                            surface,
                            e["label"],
                            e["link_probability"],
                            s["sense_id"],
                            prior,
                            sense_p,
                            link_doc,
                        )
                    )
            if acfg.unique_per_sense:
                best: dict[int, tuple] = {}
                for k in kept:
                    sid = k[5]
                    if sid not in best or k[7] > best[sid][7]:
                        best[sid] = k
                kept = sorted(best.values(), key=lambda k: (k[0], k[1], k[5]))
            for start, end, surface, label, lp, sid, prior, sense_p, l_doc in kept:
                cols["conv_id"].append(conv[r])
                cols["turn_idx"].append(tidx[r])
                cols["start"].append(start)
                cols["end"].append(end)
                cols["ngram"].append(surface)
                cols["label"].append(label)
                cols["link_probability"].append(lp)
                cols["sense_id"].append(sid)
                cols["prior_probability"].append(prior)
                cols["sense_probability"].append(sense_p)
                cols["label_link_doc"].append(l_doc)
        return pa.table(
            {
                "conv_id": pa.array(cols["conv_id"], pa.string()),
                "turn_idx": pa.array(np.asarray(cols["turn_idx"], dtype=np.int32)),
                "start": pa.array(np.asarray(cols["start"], dtype=np.int32)),
                "end": pa.array(np.asarray(cols["end"], dtype=np.int32)),
                "ngram": pa.array(cols["ngram"], pa.string()),
                "label": pa.array(cols["label"], pa.string()),
                "link_probability": pa.array(cols["link_probability"], pa.float64()),
                "sense_id": pa.array(np.asarray(cols["sense_id"], dtype=np.int64)),
                "prior_probability": pa.array(cols["prior_probability"], pa.float64()),
                "sense_probability": pa.array(cols["sense_probability"], pa.float64()),
                "label_link_doc": pa.array(
                    np.asarray(cols["label_link_doc"], dtype=np.int64)
                ),
            }
        )


def extract_mentions(
    ds: rd.Dataset,
    dict_source: Any,
    cfg: EngineConfig,
    concurrency: int | None = None,
    batch_size: int | None = None,
) -> rd.Dataset:
    """Run the matcher actor pool over a transcripts Dataset."""
    return ds.map_batches(
        AnchorMatcher,
        fn_constructor_args=(dict_source, cfg),
        batch_format="pyarrow",
        batch_size=batch_size or cfg.batch_size,
        # autoscaling (min=1) so the pool cannot reserve every CPU
        concurrency=(1, concurrency or cfg.actor_concurrency),
        num_cpus=1,
    )
