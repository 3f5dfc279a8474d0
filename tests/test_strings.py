"""Unit tests for Jaro-Winkler / Levenshtein (SURVEY.md stage-2 metrics)."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from semanticizer_ray.functions.strings import (
    batch_pair_scores,
    jaro_winkler,
    levenshtein_ratio,
)


def _lev_naive(a: bytes, b: bytes) -> int:
    n, m = len(a), len(b)
    d = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(n + 1):
        d[i][0] = i
    for j in range(m + 1):
        d[0][j] = j
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            d[i][j] = min(
                d[i - 1][j] + 1,
                d[i][j - 1] + 1,
                d[i - 1][j - 1] + (a[i - 1] != b[j - 1]),
            )
    return d[n][m]


def test_levenshtein_known():
    assert levenshtein_ratio("kitten", "sitting") == pytest.approx(1 - 3 / 7)
    assert levenshtein_ratio("abc", "abc") == 1.0
    assert levenshtein_ratio("", "abc") == 0.0
    assert levenshtein_ratio("abc", "") == 0.0
    assert levenshtein_ratio("", "") == 1.0


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=20), st.text(max_size=20))
def test_levenshtein_matches_naive(a, b):
    # the metric is DEFINED over UTF-8 bytes (strings.py module docstring);
    # identical to char-level for ASCII
    ab, bb = a.encode("utf-8"), b.encode("utf-8")
    want = 1.0 if ab == bb else (1 - _lev_naive(ab, bb) / max(len(ab), len(bb)))
    assert levenshtein_ratio(a, b) == pytest.approx(want)


def test_jaro_winkler_known():
    # classic textbook values
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-4)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133, abs=1e-3)
    assert jaro_winkler("abc", "abc") == 1.0
    assert jaro_winkler("", "") == 1.0
    assert jaro_winkler("abc", "xyz") == 0.0


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=30), st.text(max_size=30))
def test_symmetry_and_range(a, b):
    jw1, jw2 = jaro_winkler(a, b), jaro_winkler(b, a)
    assert jw1 == pytest.approx(jw2)
    assert 0.0 <= jw1 <= 1.0
    lv1, lv2 = levenshtein_ratio(a, b), levenshtein_ratio(b, a)
    assert lv1 == pytest.approx(lv2)
    assert 0.0 <= lv1 <= 1.0


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(st.text(max_size=40), st.text(max_size=40)), max_size=20)
)
def test_batch_levenshtein_matches_scalar(pairs):
    from semanticizer_ray.functions.strings import batch_levenshtein_ratio

    left = np.array([p[0] for p in pairs], dtype=object)
    right = np.array([p[1] for p in pairs], dtype=object)
    got = batch_levenshtein_ratio(left, right, cap=32)
    for i, (a, b) in enumerate(pairs):
        assert got[i] == pytest.approx(levenshtein_ratio(a, b, cap=32)), (a, b)


@settings(max_examples=50, deadline=None)
@given(
    st.lists(st.tuples(st.text(max_size=40), st.text(max_size=40)), max_size=20)
)
def test_batch_jaro_winkler_matches_scalar(pairs):
    from semanticizer_ray.functions.strings import batch_jaro_winkler

    left = np.array([p[0] for p in pairs], dtype=object)
    right = np.array([p[1] for p in pairs], dtype=object)
    got = batch_jaro_winkler(left, right, cap=32)
    for i, (a, b) in enumerate(pairs):
        assert got[i] == pytest.approx(jaro_winkler(a, b, cap=32), abs=1e-12), (a, b)


def test_batch_jaro_winkler_textbook():
    from semanticizer_ray.functions.strings import batch_jaro_winkler

    left = np.array(["MARTHA", "DIXON", "abc", "", None], dtype=object)
    right = np.array(["MARHTA", "DICKSONX", "xyz", "", "x"], dtype=object)
    got = batch_jaro_winkler(left, right)
    assert got[0] == pytest.approx(0.9611, abs=1e-4)
    assert got[1] == pytest.approx(0.8133, abs=1e-3)
    assert got[2] == 0.0
    assert got[3] == 1.0
    assert got[4] == 0.0


def test_batch_pair_scores():
    left = np.array(["kitten", "abc", None], dtype=object)
    right = np.array(["sitting", "abc", "x"], dtype=object)
    jw, lv = batch_pair_scores(left, right)
    assert lv[1] == 1.0 and jw[1] == 1.0
    assert lv[0] == pytest.approx(1 - 3 / 7)
    assert lv[2] == 0.0


def test_native_kernels_match_numpy_bodies():
    """The optional C kernels (functions/native.py) must be bit-identical to
    the numpy batch bodies, which are themselves scalar-parity-tested —
    covers ASCII, unicode (UTF-8 multi-byte), empties, and both input
    layouts (object arrays and fixed-width U arrays)."""
    from semanticizer_ray.functions.native import get_lib
    from semanticizer_ray.functions.strings import (
        _batch_jaro_winkler_numpy,
        _batch_levenshtein_numpy,
        _encode_bytes,
        _encode_u32,
        batch_jaro_winkler,
        batch_levenshtein_ratio,
    )

    if get_lib() is None:
        pytest.skip("no C compiler in environment — numpy fallback active")
    rng = np.random.default_rng(3)
    alpha = list("abcde \x1f日本éü")
    strs = ["".join(rng.choice(alpha, rng.integers(0, 90))) for _ in range(400)]
    left = np.array(strs, dtype=object)
    right = np.array(strs[1:] + strs[:1], dtype=object)
    right[:50] = left[:50]  # identical block
    for cap in (17, 64, 256):
        got = batch_levenshtein_ratio(left, right, cap=cap)
        A, la = _encode_bytes(left, cap)
        B, lb = _encode_bytes(right, cap)
        want = _batch_levenshtein_numpy(A, la, B, lb, cap)
        assert np.array_equal(got, want), f"lev cap={cap}"
        got = batch_jaro_winkler(left, right, cap=cap)
        A2, la2 = _encode_u32(left, cap)
        B2, lb2 = _encode_u32(right, cap)
        want = _batch_jaro_winkler_numpy(A2, la2, B2, lb2, 0.1)
        assert np.array_equal(got, want), f"jw cap={cap}"
    # fixed-width U input must equal the object-array path
    lu = np.asarray([s for s in left], dtype="U90")
    ru = np.asarray([s for s in right], dtype="U90")
    assert np.array_equal(
        batch_levenshtein_ratio(lu, ru, cap=64),
        batch_levenshtein_ratio(left, right, cap=64),
    )
    assert np.array_equal(
        batch_jaro_winkler(lu, ru, cap=64), batch_jaro_winkler(left, right, cap=64)
    )
