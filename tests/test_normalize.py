"""Normalization golden vectors (FIXTURES.md F7; reference wpm/utils.normalize)."""

import numpy as np

from semanticizer_ray.functions.normalize import (
    normalize_array,
    normalize_text,
    tokenize_with_spans,
    word_ngrams_with_spans,
)

GOLDEN = [
    ("Hello World", "hello world"),
    ("Héllo Wörld", "hello world"),
    ("Crème brûlée", "creme brulee"),
    ("foo-bar", "foo bar"),
    ("foo–bar—baz", "foo bar baz"),  # en/em dashes
    ("foo_bar", "foo bar"),
    ("  multiple   spaces  ", "multiple spaces"),
    ("TAB\tand\nnewline", "tab and newline"),
    ("ﬁle", "file"),  # NFKD ligature expansion
    ("½", "1⁄2"),  # NFKD fraction expansion (fraction slash survives)
    ("日本語テスト", "日本語テスト"),  # CJK passthrough
    ("", ""),
    ("   ", ""),
    ("UPPER-CASE Ångström", "upper case angstrom"),
]


def test_golden_vectors():
    for raw, want in GOLDEN:
        assert normalize_text(raw) == want, raw


def test_array_matches_scalar():
    raw = np.array([r for r, _ in GOLDEN], dtype=object)
    out = normalize_array(raw)
    assert list(out) == [w for _, w in GOLDEN]


def test_array_none_safe():
    out = normalize_array(np.array(["A", None, "B"], dtype=object))
    assert list(out) == ["a", "", "b"]


def test_tokenize_spans():
    text = "Hello, wörld! x2"
    toks = tokenize_with_spans(text)
    assert [(t[0]) for t in toks] == ["Hello", "wörld", "x2"]
    for tok, s, e in toks:
        assert text[s:e] == tok


def test_ngrams():
    toks = tokenize_with_spans("a b c")
    grams = word_ngrams_with_spans(toks, max_n=2)
    surfaces = [g[0] for g in grams]
    assert surfaces == ["a", "a b", "b", "b c", "c"]
    # spans cover original text
    assert grams[1][1] == 0 and grams[1][2] == 3
