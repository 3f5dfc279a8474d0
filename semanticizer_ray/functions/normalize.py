"""Text normalization with the reference's semantics.

Reference: ``semanticizer/wpm/utils.py :: normalize`` (SURVEY.md M3) — the
anchor dictionary is keyed by a normalized form of each label: dashes folded
to spaces, accents stripped via unicode NFKD (drop combining marks),
lowercased, whitespace collapsed. N-gram lookups normalize the surface text
the same way, so both sides must share one byte-exact implementation.

The per-turn ``text`` column itself is NEVER mutated (north_rule invariant:
per-turn text equality); normalization always lands in a new column.

Vectorization strategy: normalization is pure and deterministic per distinct
string, so the batch entry point memoizes over distinct values
(``np.unique`` + inverse indices). For prose columns most rows are distinct;
the win is on label/key columns. The per-string kernel is plain Python —
NFKD has no Arrow kernel — but it only runs once per distinct input.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np

from ..config import NormalizeConfig

_DASHES = re.compile(r"[-‐-―−_]+")
_WS = re.compile(r"\s+")


def normalize_text(s: str, cfg: NormalizeConfig = NormalizeConfig()) -> str:
    """Normalize one string with reference semantics (see module docstring)."""
    if cfg.dash_to_space:
        s = _DASHES.sub(" ", s)
    if cfg.strip_accents:
        s = "".join(
            c for c in unicodedata.normalize("NFKD", s) if not unicodedata.combining(c)
        )
    if cfg.lowercase:
        s = s.lower()
    if cfg.collapse_whitespace:
        s = _WS.sub(" ", s).strip()
    return s


def normalize_array(values: np.ndarray, cfg: NormalizeConfig = NormalizeConfig()) -> np.ndarray:
    """Normalize a numpy object/str array, memoized over distinct values."""
    if len(values) == 0:
        return np.asarray([], dtype=object)
    arr = np.asarray(values, dtype=object)
    # None-safe: treat missing as empty string
    arr = np.asarray([v if v is not None else "" for v in arr], dtype=object)
    uniq, inv = np.unique(arr, return_inverse=True)
    normed = np.asarray([normalize_text(u, cfg) for u in uniq], dtype=object)
    return normed[inv]


_TOKEN = re.compile(r"\w+", re.UNICODE)


def tokenize_with_spans(s: str) -> list[tuple[str, int, int]]:
    """Unicode word tokens with char offsets (reference M1 semantics).

    ``Semanticizer.semanticize`` tokenizes the request text keeping start
    offsets so emitted links carry (start, end) spans into the original text.
    """
    return [(m.group(0), m.start(), m.end()) for m in _TOKEN.finditer(s)]


def word_ngrams_with_spans(
    tokens: list[tuple[str, int, int]], max_n: int
) -> list[tuple[str, int, int]]:
    """All word n-grams (n = 1..max_n) over token spans, as surface substrings.

    Reference M2: the n-gram surface is the ORIGINAL text slice between the
    first token's start and last token's end (preserves inner punctuation /
    spacing for span fidelity); the lookup key is the normalized form of it.
    Here we reconstruct the n-gram by joining tokens with single spaces, which
    is equivalent post-normalization (whitespace collapse) — the span still
    points at the original slice.
    """
    out: list[tuple[str, int, int]] = []
    n_tok = len(tokens)
    for i in range(n_tok):
        for n in range(1, max_n + 1):
            j = i + n
            if j > n_tok:
                break
            surface = " ".join(t[0] for t in tokens[i:j])
            out.append((surface, tokens[i][1], tokens[j - 1][2]))
    return out
