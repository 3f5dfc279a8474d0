"""Pairwise string similarity metrics: Jaro-Winkler, Levenshtein ratio.

These are NOT in the reference (semanticizer scores candidates with corpus
statistics, not edit distance — SURVEY.md §2.1 "String/math"); the north_rule
adds them for stage-2 pairwise scoring. Pure Python/NumPy, no external deps.

Cost model: both metrics are O(n·m) per pair, so callers MUST cap input
length (``cap`` argument; the pipeline caps conversation profiles at
``BlockingConfig.max_profile_chars`` and scores edit metrics on a shorter
prefix — the full-text signal comes from the MinHash Jaccard estimate, which
is O(signature) per pair). The Levenshtein DP is vectorized one row at a
time with numpy so the Python-level loop is O(n), not O(n·m).
"""

from __future__ import annotations

import numpy as np


def levenshtein_ratio(a: str, b: str, cap: int = 256) -> float:
    """1 - edit_distance/max_len in [0,1]; inputs truncated to ``cap`` chars."""
    a, b = a[:cap], b[:cap]
    if a == b:
        return 1.0
    n, m = len(a), len(b)
    if n == 0 or m == 0:
        return 0.0
    if n < m:  # keep the numpy-vectorized dimension the long one
        a, b, n, m = b, a, m, n
    bv = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    prev = np.arange(m + 1, dtype=np.int32)
    cur = np.empty(m + 1, dtype=np.int32)
    for i, ca in enumerate(a, 1):
        cur[0] = i
        sub = prev[:-1] + (bv != ord(ca))
        ins = prev[1:] + 1
        np.minimum(sub, ins, out=cur[1:])
        # deletions need a sequential scan; emulate with cummin trick:
        # cur[j] = min(cur[j], cur[j-1]+1)  ==  cummin over (cur[j] - j) + j
        np.minimum.accumulate(cur - np.arange(m + 1), out=cur)
        cur += np.arange(m + 1)
        prev, cur = cur, prev
    dist = int(prev[m])
    return 1.0 - dist / max(n, m)


def _jaro(a: str, b: str) -> float:
    n, m = len(a), len(b)
    if n == 0 and m == 0:
        return 1.0
    if n == 0 or m == 0:
        return 0.0
    window = max(n, m) // 2 - 1
    if window < 0:
        window = 0
    b_taken = np.zeros(m, dtype=bool)
    a_match: list[str] = []
    b_match_idx: list[int] = []
    for i, ca in enumerate(a):
        lo, hi = max(0, i - window), min(m, i + window + 1)
        for j in range(lo, hi):
            if not b_taken[j] and b[j] == ca:
                b_taken[j] = True
                a_match.append(ca)
                b_match_idx.append(j)
                break
    k = len(a_match)
    if k == 0:
        return 0.0
    b_match = [b[j] for j in sorted(b_match_idx)]
    transpositions = sum(x != y for x, y in zip(a_match, b_match)) // 2
    return (k / n + k / m + (k - transpositions) / k) / 3.0


def jaro_winkler(a: str, b: str, cap: int = 128, prefix_weight: float = 0.1) -> float:
    """Jaro-Winkler similarity in [0,1]; inputs truncated to ``cap`` chars."""
    a, b = a[:cap], b[:cap]
    j = _jaro(a, b)
    if j <= 0.7:
        return j
    prefix = 0
    for ca, cb in zip(a[:4], b[:4]):
        if ca != cb:
            break
        prefix += 1
    return j + prefix * prefix_weight * (1.0 - j)


def batch_levenshtein_ratio(
    left: np.ndarray, right: np.ndarray, cap: int = 256
) -> np.ndarray:
    """Vectorized Levenshtein ratio over ALL pairs at once.

    One DP over (n_pairs, cap+1) numpy arrays — ``cap`` python iterations
    total instead of per pair, amortizing numpy call overhead ~100×. Exact:
    matches ``levenshtein_ratio`` bit-for-bit (tests assert parity).
    Padding is masked by capturing each pair's answer at its own final DP
    row/column.
    """
    n = len(left)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    la = np.empty(n, dtype=np.int64)
    lb = np.empty(n, dtype=np.int64)
    A = np.zeros((n, cap), dtype=np.uint32)
    B = np.zeros((n, cap), dtype=np.uint32)
    for i in range(n):
        a = (left[i] or "")[:cap]
        b = (right[i] or "")[:cap]
        la[i] = len(a)
        lb[i] = len(b)
        if a:
            A[i, : len(a)] = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        if b:
            B[i, : len(b)] = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    max_a = int(la.max()) if n else 0
    m = int(lb.max()) if n else 0
    # int16 DP cells: distances ≤ 2·cap ≤ 512 and the cummin transform
    # dips to -m ≥ -cap — both well inside int16; half the memory traffic
    # of int32 on a bandwidth-bound loop
    idx = np.arange(m + 1, dtype=np.int16)[None, :]  # (1, m+1)
    prev = np.broadcast_to(idx, (n, m + 1)).astype(np.int16).copy()
    # answer per pair: prev[lb] at DP row la (row 0 answer for la == 0)
    res = np.where(la == 0, lb, -1).astype(np.int64)
    rows = np.arange(n)
    for i in range(1, max_a + 1):
        ca = A[:, i - 1][:, None]  # (n, 1)
        sub = prev[:, :-1] + (B[:, :m] != ca)
        ins = prev[:, 1:] + 1
        cur = np.empty_like(prev)
        cur[:, 0] = i
        np.minimum(sub, ins, out=cur[:, 1:])
        # deletions: cur[j] = min(cur[j], cur[j-1]+1) via cummin transform
        d = cur - idx
        np.minimum.accumulate(d, axis=1, out=d)
        cur = d + idx
        done = la == i
        if done.any():
            res[done] = cur[rows[done], lb[done]]
        prev = cur
    out = np.ones(n, dtype=np.float64)
    nz = (la > 0) | (lb > 0)
    denom = np.maximum(la, lb)
    out[nz] = 1.0 - res[nz] / denom[nz]
    return out


def batch_jaro_winkler(
    left: np.ndarray, right: np.ndarray, cap: int = 64, prefix_weight: float = 0.1
) -> np.ndarray:
    """Vectorized Jaro-Winkler over ALL pairs at once (parity-tested against
    the scalar ``jaro_winkler``).

    The greedy Jaro matching loop runs over character POSITIONS of the left
    string (≤ ``cap`` python iterations per batch); each step resolves every
    pair's "first unmatched window character" with one argmax over the
    (n_pairs, cap) char matrix — the per-pair O(n·window) scan the scalar
    version pays becomes ~8 numpy ops per step. Transpositions come from
    comparing the match sequences (a-order vs j-order) at the end.
    """
    n = len(left)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    la = np.empty(n, dtype=np.int64)
    lb = np.empty(n, dtype=np.int64)
    A = np.zeros((n, cap), dtype=np.uint32)
    B = np.zeros((n, cap), dtype=np.uint32)
    for i in range(n):
        a = (left[i] or "")[:cap]
        b = (right[i] or "")[:cap]
        la[i] = len(a)
        lb[i] = len(b)
        if a:
            A[i, : len(a)] = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
        if b:
            B[i, : len(b)] = np.frombuffer(b.encode("utf-32-le"), dtype=np.uint32)
    max_a = int(la.max())
    m_cols = int(lb.max()) if n else 0
    w = np.maximum(np.maximum(la, lb) // 2 - 1, 0)
    jidx = np.arange(m_cols, dtype=np.int64)[None, :]  # (1, m_cols)
    Bm = B[:, :m_cols]
    taken = np.zeros((n, m_cols), dtype=bool)
    amatch = np.zeros((n, max(max_a, 1)), dtype=np.uint32)
    cnt = np.zeros(n, dtype=np.int64)
    rows = np.arange(n)
    for i in range(max_a):
        active = la > i
        if not active.any():
            break
        lo = i - w  # (n,)
        hi = np.minimum(lb, i + w + 1)
        cand = (
            (Bm == A[:, i][:, None])
            & (jidx >= lo[:, None])
            & (jidx < hi[:, None])
            & ~taken
            & active[:, None]
        )
        has = cand.any(axis=1)
        if not has.any():
            continue
        jstar = cand.argmax(axis=1)
        hr = rows[has]
        taken[hr, jstar[has]] = True
        amatch[hr, cnt[hr]] = A[hr, i]
        cnt[hr] += 1
    k = cnt
    # b_match in ascending-j order: stable argsort puts taken columns first
    order = np.argsort(~taken, axis=1, kind="stable")
    maxk = int(k.max()) if n else 0
    if maxk:
        bmatch = np.take_along_axis(Bm, order[:, :maxk], axis=1)
        kmask = np.arange(maxk)[None, :] < k[:, None]
        trans = ((amatch[:, :maxk] != bmatch) & kmask).sum(axis=1) // 2
    else:
        trans = np.zeros(n, dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        j_sim = (
            k / np.maximum(la, 1) + k / np.maximum(lb, 1) + (k - trans) / np.maximum(k, 1)
        ) / 3.0
    j_sim = np.where(k == 0, 0.0, j_sim)
    j_sim = np.where((la == 0) & (lb == 0), 1.0, j_sim)
    j_sim = np.where((la == 0) ^ (lb == 0), 0.0, j_sim)
    # Winkler prefix boost (common prefix ≤ 4, only when jaro > 0.7)
    p4 = min(4, cap)
    eq = (A[:, :p4] == B[:, :p4]) & (
        np.arange(p4)[None, :] < np.minimum(la, lb)[:, None]
    )
    prefix = np.minimum(eq.cumprod(axis=1).sum(axis=1), 4)
    boost = j_sim > 0.7
    return np.where(boost, j_sim + prefix * prefix_weight * (1.0 - j_sim), j_sim)


def batch_pair_scores(
    left: np.ndarray, right: np.ndarray, lev_cap: int = 256, jw_cap: int = 128
) -> tuple[np.ndarray, np.ndarray]:
    """(jaro_winkler, levenshtein_ratio) for aligned arrays of string pairs."""
    n = len(left)
    jw = np.empty(n, dtype=np.float64)
    for i in range(n):
        jw[i] = jaro_winkler(left[i] or "", right[i] or "", cap=jw_cap)
    lv = batch_levenshtein_ratio(left, right, cap=lev_cap)
    return jw, lv
