"""Text-analysis operators over document tables (SURVEY.md §2 extensions).

Large-scale training-data pipeline utilities, each a stateless/actor-pool
``map_batches`` over Arrow batches on a table with (id, text) columns:

- ``token_stats``     whitespace + BPE-ish regex token counting
- ``quality_score``   length / punctuation / stopword-ratio heuristics
- ``lang_id``         n-gram profile heuristic (latin-script languages) —
                      deterministic, dependency-free
- ``fingerprint``     64-bit rolling-hash document fingerprint

The reference's nearest analogs: stopword filtering and language routes on
the server (SURVEY.md M9/M10); these generalize them to columnar batch ops.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import ray.data as rd

_WS_TOKEN = re.compile(r"\S+")
# BPE-ish: letter runs, digit runs, single punctuation marks (GPT-2 style,
# simplified and dependency-free)
_BPE_TOKEN = re.compile(r"[A-Za-zÀ-ÿ]+|\d+|[^\sA-Za-zÀ-ÿ\d]")

_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "for", "it", "on", "with"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "mit", "den", "nicht"},
    "fr": {"le", "la", "les", "de", "et", "est", "un", "une", "que", "pour"},
    "es": {"el", "la", "los", "de", "y", "es", "un", "una", "que", "por"},
    "it": {"il", "la", "di", "e", "che", "un", "una", "per", "non", "sono"},
}

_PUNCT = re.compile(r"[^\w\s]", re.UNICODE)


def token_stats(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Adds n_tokens_ws (whitespace) and n_tokens_bpe (regex BPE-ish)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        ws = np.fromiter(
            (len(_WS_TOKEN.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        bpe = np.fromiter(
            (len(_BPE_TOKEN.findall(t or "")) for t in texts), dtype=np.int64, count=len(texts)
        )
        batch = batch.append_column("n_tokens_ws", pa.array(ws))
        return batch.append_column("n_tokens_bpe", pa.array(bpe))

    return ds.map_batches(f, batch_format="pyarrow")


def quality_score(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Adds punct_ratio, stop_ratio, mean_word_len, quality in [0,1].

    quality = heuristic blend: penalize extreme punctuation density, very
    short docs and stopword-free (non-prose) text.
    """

    all_stops = set().union(*_STOPWORDS.values())

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        n = len(texts)
        punct = np.empty(n)
        stop = np.empty(n)
        mwl = np.empty(n)
        for i, t in enumerate(texts):
            t = t or ""
            nc = max(1, len(t))
            punct[i] = len(_PUNCT.findall(t)) / nc
            words = [w.lower() for w in _WS_TOKEN.findall(t)]
            nw = max(1, len(words))
            stop[i] = sum(w in all_stops for w in words) / nw
            mwl[i] = sum(len(w) for w in words) / nw
        length = np.array([len(t or "") for t in texts], dtype=np.float64)
        q = (
            np.clip(length / 200.0, 0, 1) * 0.4
            + np.clip(stop / 0.3, 0, 1) * 0.4
            + np.clip(1.0 - punct / 0.2, 0, 1) * 0.2
        )
        batch = batch.append_column("punct_ratio", pa.array(punct))
        batch = batch.append_column("stop_ratio", pa.array(stop))
        batch = batch.append_column("mean_word_len", pa.array(mwl))
        return batch.append_column("quality", pa.array(q))

    return ds.map_batches(f, batch_format="pyarrow")


class LangId:
    """Language guesser (actor: profiles built once).

    Two-tier heuristic: non-latin scripts first by codepoint range (CJK
    ideographs → zh, kana → ja, hangul → ko, cyrillic → ru — a script-ratio
    check over the first 400 chars), then latin-script languages by
    stopword-profile vote. Dependency-free and deterministic."""

    _SCRIPTS = [
        # (lang, ranges) — checked in order; kana before ideographs so
        # Japanese text (which mixes kanji + kana) resolves to ja
        ("ja", ((0x3040, 0x30FF),)),
        ("ko", ((0xAC00, 0xD7AF), (0x1100, 0x11FF))),
        ("zh", ((0x4E00, 0x9FFF), (0x3400, 0x4DBF))),
        ("ru", ((0x0400, 0x04FF),)),
    ]
    _SCRIPT_RATIO = 0.15  # of the first 400 chars

    def __init__(self, text_col: str = "text"):
        self.text_col = text_col
        self.profiles = _STOPWORDS

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch[self.text_col].to_pylist()
        out = []
        for t in texts:
            head = (t or "")[:400]
            pred = None
            if head:
                cps = np.frombuffer(head.encode("utf-32-le"), dtype=np.uint32)
                denom = max(1, (cps > 0x20).sum())
                for lang, ranges in self._SCRIPTS:
                    k = 0
                    for lo, hi in ranges:
                        k += int(((cps >= lo) & (cps <= hi)).sum())
                    if k / denom >= self._SCRIPT_RATIO:
                        pred = lang
                        break
            if pred is None:
                words = [w.lower() for w in _WS_TOKEN.findall(t or "")][:200]
                best, best_n = "unknown", 0
                for lang, stops in self.profiles.items():
                    k = sum(w in stops for w in words)
                    if k > best_n:
                        best, best_n = lang, k
                pred = best
            out.append(pred)
        return batch.append_column("lang_pred", pa.array(out, pa.string()))


def lang_id(ds: rd.Dataset, text_col: str = "text", concurrency: int = 4) -> rd.Dataset:
    return ds.map_batches(
        LangId, fn_constructor_args=(text_col,), batch_format="pyarrow",
        concurrency=(1, concurrency),
    )


def fingerprint(ds: rd.Dataset, text_col: str = "text") -> rd.Dataset:
    """Adds ``fp``: 64-bit polynomial rolling hash of the text bytes (hex),
    FNV-prime base with a murmur-style final avalanche.

    Vectorized: one ``(bytes · prime^i).sum`` numpy reduction per document
    (powers precomputed once per batch to the longest doc) — replaces the
    round-1 per-byte Python FNV loop."""
    PRIME = np.uint64(1099511628211)
    SEED = np.uint64(14695981039346656037)
    MIX = np.uint64(0xFF51AFD7ED558CCD)

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        bufs = [
            np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8) for t in texts
        ]
        max_len = max((len(b) for b in bufs), default=0)
        with np.errstate(over="ignore"):
            pows = np.ones(max(max_len, 1), dtype=np.uint64)
            if max_len > 1:
                np.cumprod(
                    np.full(max_len - 1, PRIME, dtype=np.uint64), out=pows[1:]
                )
            fps = []
            for b in bufs:
                acc = SEED + (b.astype(np.uint64) * pows[: len(b)]).sum(
                    dtype=np.uint64
                )
                acc ^= acc >> np.uint64(33)
                acc *= MIX
                acc ^= acc >> np.uint64(33)
                fps.append(f"{int(acc):016x}")
        return batch.append_column("fp", pa.array(fps, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def repetition_stats(
    ds: rd.Dataset, n: int = 2, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """Within-document repetition signal (the Gopher/C4-style quality
    rule "drop documents whose duplicate n-gram fraction is high"):
    per doc, the total vs DISTINCT word ``n``-gram counts, the count of
    the most repeated gram, and the duplicate fraction
    ``1 - distinct/total`` (0 for docs with < n words). Tokens are
    lowercased ``[a-z0-9]+`` runs (the retrieval-family tokenizer, so
    the SQL oracle is shared). Integer counts + one rounded ratio;
    shuffle-free stateless pass."""
    from collections import Counter

    from .retrieval import _TOKEN_RE

    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")

    def f(batch: pa.Table) -> pa.Table:
        total_out, distinct_out, maxcnt_out = [], [], []
        for text in batch[text_col].to_pylist():
            w = _TOKEN_RE.findall((text or "").lower())
            grams = Counter(
                tuple(w[i : i + n]) for i in range(len(w) - n + 1)
            )
            total = sum(grams.values())
            total_out.append(total)
            distinct_out.append(len(grams))
            maxcnt_out.append(max(grams.values()) if grams else 0)
        total = np.asarray(total_out, dtype=np.int64)
        distinct = np.asarray(distinct_out, dtype=np.int64)
        frac = np.where(total > 0, 1.0 - distinct / np.maximum(total, 1), 0.0)
        return pa.table(
            {
                id_col: batch[id_col],
                "n_grams": pa.array(total, pa.int64()),
                "n_distinct": pa.array(distinct, pa.int64()),
                "max_gram_count": pa.array(
                    np.asarray(maxcnt_out, dtype=np.int64), pa.int64()
                ),
                "dup_frac": pa.array(np.round(frac, 6), pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
