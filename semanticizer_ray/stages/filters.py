"""Stage M6/M8/M9 analogs: spec-driven filters and text cleaners.

Reference: ``semanticizer/processors/core.py :: FilterProcessor`` parses
``filter=field>=value`` / ``prefilter=`` settings and applies them to
candidate lists per request; ``Server._cleantweet`` strips @mentions,
#hashtags, RTs and URLs; stopword routes filter tokens (SURVEY.md M6/M8/M9).

Here: a filter spec string compiles ONCE to a ``pyarrow.compute``
expression applied vectorized per batch, and the cleaners are vectorized
regex replacements that add new columns (raw ``text`` is never mutated —
north_rule invariant).
"""

from __future__ import annotations

import re
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_SPEC = re.compile(r"^\s*(\w+)\s*(<=|>=|<|>|==|=|!=)\s*(.+?)\s*$")

_OPS: dict[str, Callable] = {
    "<": pc.less,
    "<=": pc.less_equal,
    ">": pc.greater,
    ">=": pc.greater_equal,
    "=": pc.equal,
    "==": pc.equal,
    "!=": pc.not_equal,
}


def compile_filter(spec: str) -> Callable[[pa.Table], pa.Table]:
    """``"sense_probability >= 0.3"`` → vectorized batch filter fn.

    Multiple comma-separated clauses AND together (reference semantics:
    repeated filter settings all apply).
    """
    clauses = []
    for part in spec.split(","):
        m = _SPEC.match(part)
        if not m:
            raise ValueError(f"bad filter spec: {part!r}")
        field, op, raw = m.groups()
        value: object
        try:
            value = float(raw) if "." in raw or "e" in raw.lower() else int(raw)
        except ValueError:
            value = raw.strip("'\"")
        clauses.append((field, _OPS[op], value))

    def apply(batch: pa.Table) -> pa.Table:
        mask = None
        for field, op, value in clauses:
            m_ = op(batch[field], pa.scalar(value))
            mask = m_ if mask is None else pc.and_(mask, m_)
        return batch.filter(mask)

    return apply


def filter_dataset(ds: rd.Dataset, spec: str) -> rd.Dataset:
    """Apply a filter spec to any Dataset (the reference's filter/prefilter
    capability as a standalone relational operator)."""
    return ds.map_batches(compile_filter(spec), batch_format="pyarrow")


_TWEET_PATTERNS = [
    (re.compile(r"(?:^|\s)RT\b"), " "),
    (re.compile(r"@\w+"), " "),
    (re.compile(r"#(\w+)"), r"\1"),  # keep the tag word, drop the marker
    (re.compile(r"https?://\S+"), " "),
    (re.compile(r"\s+"), " "),
]


def clean_tweet_text(s: str) -> str:
    for pat, repl in _TWEET_PATTERNS:
        s = pat.sub(repl, s)
    return s.strip()


def clean_tweets(ds: rd.Dataset, text_col: str = "text", out_col: str = "clean_text") -> rd.Dataset:
    """M8: vectorized tweet cleaning into a NEW column."""

    def f(batch: pa.Table) -> pa.Table:
        cleaned = [clean_tweet_text(t or "") for t in batch[text_col].to_pylist()]
        return batch.append_column(out_col, pa.array(cleaned, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


def remove_stopwords(
    ds: rd.Dataset,
    stopwords: set[str],
    text_col: str = "text",
    out_col: str = "content_text",
) -> rd.Dataset:
    """M9: broadcast stopword set; token-filtered text into a NEW column."""
    stop = frozenset(w.lower() for w in stopwords)

    def f(batch: pa.Table) -> pa.Table:
        out = []
        for t in batch[text_col].to_pylist():
            toks = (t or "").split()
            out.append(" ".join(w for w in toks if w.lower() not in stop))
        return batch.append_column(out_col, pa.array(out, pa.string()))

    return ds.map_batches(f, batch_format="pyarrow")


_KNUTH = 2654435761  # Knuth multiplicative hash constant (public domain)


def stratified_sample(
    ds: rd.Dataset,
    rates: dict[str, float],
    group_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> rd.Dataset:
    """Deterministic per-group systematic sampling: keep a row iff
    ``(id * KNUTH) mod 2^32 < rate(group) * 2^32`` — the same
    reproducible-across-runs/engines hash family as ``events_sample``
    (O3), but with a PER-GROUP rate (the training-data rebalancing move:
    downsample over-represented languages/sources). Zero shuffle: one
    vectorized ``map_batches`` filter; the rate table ships in the task
    closure (a few entries). uint64 wrap-around multiply keeps the hash
    exact for the full int64 id range (mirrors the HUGEINT SQL oracle).
    """
    for g, r in rates.items():
        if not (0.0 <= r <= 1.0):
            raise ValueError(f"rate for group {g!r} must be in [0, 1], got {r}")
    if not (0.0 <= default_rate <= 1.0):
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    thr_map = {g: int(r * (1 << 32)) for g, r in rates.items()}
    default_thr = int(default_rate * (1 << 32))

    def pick(df):
        import numpy as np

        h = (df[id_col].to_numpy(np.uint64) * np.uint64(_KNUTH)) & np.uint64(
            0xFFFFFFFF
        )
        thr = (
            df[group_col]
            .map(thr_map)
            .fillna(default_thr)
            .to_numpy(dtype=np.uint64)
        )
        return df[h < thr]

    return ds.map_batches(pick, batch_format="pandas")


# PII-detection patterns, chosen to behave identically under Python re
# and RE2 (DuckDB's regexp engine): no alternation or backtracking
# constructs where leftmost-longest vs leftmost-greedy semantics could
# diverge; parity spot-checked in tests over edge strings.
PII_EMAIL = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PII_URL = r"https?://[^\s]+"
PII_PHONE = r"\+?[0-9][0-9()\-\s]{6,}[0-9]"


def pii_stats(
    ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id"
) -> rd.Dataset:
    """(doc_id, n_emails, n_urls, n_phones) per document — the standard
    pre-training PII triage pass (count first, route heavy redaction only
    at matching docs). One shuffle-free stateless ``map_batches`` with
    per-worker-compiled patterns; all-integer output, hash-gate-safe."""
    import numpy as np

    pats = [re.compile(p) for p in (PII_EMAIL, PII_URL, PII_PHONE)]
    names = ["n_emails", "n_urls", "n_phones"]

    def f(batch: pa.Table) -> pa.Table:
        texts = batch[text_col].to_pylist()
        cols = {id_col: batch[id_col]}
        for pat, name in zip(pats, names):
            cols[name] = pa.array(
                np.fromiter(
                    (len(pat.findall(t or "")) for t in texts),
                    dtype=np.int64,
                    count=len(texts),
                ),
                pa.int64(),
            )
        return pa.table(cols)

    return ds.map_batches(f, batch_format="pyarrow")
