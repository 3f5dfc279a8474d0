"""Pairwise string similarity metrics: Jaro-Winkler, Levenshtein ratio.

These are NOT in the reference (semanticizer scores candidates with corpus
statistics, not edit distance — SURVEY.md §2.1 "String/math"); the north_rule
adds them for stage-2 pairwise scoring. Pure Python/NumPy, no external deps.

Cost model: both metrics are capped (``cap`` argument; the pipeline caps
conversation profiles at ``BlockingConfig.max_profile_chars`` and scores
edit metrics on a shorter prefix — the full-text signal comes from the
MinHash Jaccard estimate, which is O(signature) per pair).

Levenshtein here is defined over UTF-8 BYTES (identical to character-level
for ASCII text; a fixed, documented metric for everything else — byte-level
edit distance is the standard industrial choice). The defining reason is
the batch kernel: Myers' bit-parallel algorithm (Myers, JACM 1999) needs a
small dense alphabet for its Peq table, and bytes give 256 for free. The
batch kernel processes 64 DP cells per uint64 word — ~16× less memory
traffic than a row-vectorized int16 DP, which matters because edit scoring
is the single largest compute stage of the flagship pipeline and a
bandwidth-bound kernel stops scaling with cores long before 32
(measured: the int16 row DP ran 325 core-s over the 100k-tier pair set and
scaled 8→32 CPUs at only 1.25×).
"""

from __future__ import annotations

import numpy as np


def levenshtein_ratio(a: str, b: str, cap: int = 256) -> float:
    """1 - byte_edit_distance/max_byte_len in [0,1]; inputs are UTF-8
    encoded and truncated to ``cap`` BYTES. Scalar reference implementation
    (row-vectorized DP) — independent of the batch Myers kernel, which is
    parity-tested against it."""
    ab = a.encode("utf-8")[:cap]
    bb = b.encode("utf-8")[:cap]
    if ab == bb:
        return 1.0
    n, m = len(ab), len(bb)
    if n == 0 or m == 0:
        return 0.0
    if n < m:  # keep the numpy-vectorized dimension the long one
        ab, bb, n, m = bb, ab, m, n
    bv = np.frombuffer(bb, dtype=np.uint8)
    prev = np.arange(m + 1, dtype=np.int32)
    cur = np.empty(m + 1, dtype=np.int32)
    for i, ca in enumerate(ab, 1):
        cur[0] = i
        sub = prev[:-1] + (bv != ca)
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


def _u_lengths(cp: np.ndarray) -> np.ndarray:
    """Char length per row of a zero-padded (n, w) uint32 code-point matrix:
    index of last nonzero + 1 (interior NULs count — only TRAILING zeros are
    padding, matching numpy's own U-dtype → str trailing-NUL trim)."""
    n, w = cp.shape
    nz = cp != 0
    any_nz = nz.any(axis=1)
    lens = np.where(any_nz, w - np.argmax(nz[:, ::-1], axis=1), 0)
    return lens.astype(np.int64)


def _encode_bytes(col: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """String array → (byte matrix (n, cap) uint8 zero-padded, byte lengths
    (n,) int64). UTF-8, truncated to ``cap`` bytes.

    Fixed-width ``U`` arrays (the packed side state's head column) take a
    vectorized path: the UCS4 buffer is viewed as a code-point matrix and,
    when pure ASCII, cast straight to bytes — no per-row python encode (the
    loop measured ~23 ms per 4096-pair batch, all overhead)."""
    n = len(col)
    dt = getattr(col, "dtype", None)
    if dt is not None and dt.kind == "U" and n:
        w = dt.itemsize // 4
        cp = np.ascontiguousarray(col).view(np.uint32).reshape(n, w)
        if int(cp.max(initial=0)) < 128:  # pure ASCII: bytes == code points
            k = min(w, cap)
            M = np.zeros((n, cap), dtype=np.uint8)
            M[:, :k] = cp[:, :k].astype(np.uint8)
            lens = np.minimum(_u_lengths(cp), cap)
            return M, lens
        # non-ASCII rows need real UTF-8 encoding — fall through to the loop
    lens = np.empty(n, dtype=np.int64)
    M = np.zeros((n, cap), dtype=np.uint8)
    for i in range(n):
        s = (col[i] or "").encode("utf-8")[:cap]
        lens[i] = len(s)
        if s:
            M[i, : len(s)] = np.frombuffer(s, dtype=np.uint8)
    return M, lens


def _encode_u32(col: np.ndarray, cap: int) -> tuple[np.ndarray, np.ndarray]:
    """String array → (code-point matrix (n, cap) uint32 zero-padded, char
    lengths (n,) int64), truncated to ``cap`` chars. Vectorized for
    fixed-width ``U`` arrays, python loop otherwise."""
    n = len(col)
    dt = getattr(col, "dtype", None)
    if dt is not None and dt.kind == "U" and n:
        w = dt.itemsize // 4
        cp = np.ascontiguousarray(col).view(np.uint32).reshape(n, w)
        k = min(w, cap)
        M = np.zeros((n, cap), dtype=np.uint32)
        M[:, :k] = cp[:, :k]
        lens = np.minimum(_u_lengths(cp), cap)
        return M, lens
    la = np.empty(n, dtype=np.int64)
    M = np.zeros((n, cap), dtype=np.uint32)
    for i in range(n):
        a = (col[i] or "")[:cap]
        la[i] = len(a)
        if a:
            M[i, : len(a)] = np.frombuffer(a.encode("utf-32-le"), dtype=np.uint32)
    return M, la


def batch_levenshtein_ratio(
    left: np.ndarray, right: np.ndarray, cap: int = 256
) -> np.ndarray:
    """Vectorized Levenshtein ratio over ALL pairs at once — Myers'
    bit-parallel algorithm (Myers, JACM 1999; multiword form per Hyyrö)
    run simultaneously over every pair: the DP state is (n_pairs, W) uint64
    with W = cap/64 words, so one python-level sweep per text byte touches
    ~W·n_pairs words instead of an (n_pairs, cap) int16 row — ~16× less
    memory traffic than the row DP, which is what keeps this kernel scaling
    on a 32-core node (the old row DP was bandwidth-bound at 8 cores).

    Exact byte-level distance: matches ``levenshtein_ratio`` bit-for-bit
    (tests assert parity). Each pair's answer is captured at its own final
    text row ``la``; pad bytes beyond a pair's length never affect its
    captured score.

    When the native kernel is available (``functions/native.py``) the same
    algorithm runs in C at ~2 µs/pair; this numpy body is the fallback AND
    the parity reference (tests assert native == numpy == scalar).
    """
    n = len(left)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, la = _encode_bytes(left, cap)
    B, lb = _encode_bytes(right, cap)
    if cap <= 512:
        from .native import get_lib

        lib = get_lib()
        if lib is not None:
            import ctypes

            out = np.empty(n, dtype=np.float64)
            lib.batch_lev_ratio(
                A.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                la.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                B.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, cap,
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            return out
    return _batch_levenshtein_numpy(A, la, B, lb, cap)


def _batch_levenshtein_numpy(
    A: np.ndarray, la: np.ndarray, B: np.ndarray, lb: np.ndarray, cap: int
) -> np.ndarray:
    """Numpy Myers kernel over pre-encoded byte matrices (see
    ``batch_levenshtein_ratio``)."""
    n = len(la)
    W = max(1, -(-cap // 64))  # words per pattern bitvector
    rows = np.arange(n)

    # Peq[pair, byte, word]: bit j of word w set ⇔ B[pair, 64w + j] == byte.
    # bitwise_or.at accumulates duplicate (pair, byte) hits correctly.
    m_max = int(lb.max()) if n else 0
    Peq = np.zeros((n, 256, W), dtype=np.uint64)
    for j in range(m_max):
        live = lb > j
        if not live.any():
            break
        bit = np.uint64(1 << (j & 63))
        np.bitwise_or.at(Peq, (rows[live], B[live, j], j >> 6), bit)

    ones = np.uint64(0xFFFFFFFFFFFFFFFF)
    # Pv starts with bits 0..lb-1 set (multiword); Mv = 0
    Pv = np.zeros((n, W), dtype=np.uint64)
    for w in range(W):
        bits = np.clip(lb - 64 * w, 0, 64)
        full = bits == 64
        # (1 << bits) - 1 for partial words; avoid 1<<64 overflow via where
        partial = (np.left_shift(np.uint64(1), bits.astype(np.uint64),
                                 where=~full, out=np.zeros(n, dtype=np.uint64))
                   - np.uint64(1)) & ones
        Pv[:, w] = np.where(full, ones, np.where(bits > 0, partial, 0))
    Mv = np.zeros((n, W), dtype=np.uint64)
    score = lb.copy()

    # per-pair high-bit position (bit lb-1): word index + in-word mask
    hw = np.maximum(lb - 1, 0) >> 6
    hbit = (np.uint64(1) << ((np.maximum(lb - 1, 0) & 63).astype(np.uint64)))

    # answers for degenerate pairs up front; loop captures the rest
    res = np.where(la == 0, lb, np.where(lb == 0, la, -1)).astype(np.int64)

    max_a = int(la.max()) if n else 0
    one = np.uint64(1)
    for i in range(1, max_a + 1):
        ca = A[:, i - 1]
        # Eq = Peq[pair, ca, :] — one gather per word
        Eq = Peq[rows, ca, :]  # (n, W)
        Xv = Eq | Mv
        # Xh = (((Eq & Pv) + Pv) ^ Pv) | Eq with multiword carry
        EqPv = Eq & Pv
        Xh = np.empty_like(Pv)
        carry = np.zeros(n, dtype=np.uint64)
        for w in range(W):
            s1 = EqPv[:, w] + Pv[:, w]
            c1 = s1 < EqPv[:, w]
            s2 = s1 + carry
            c2 = s2 < s1
            Xh[:, w] = s2
            carry = (c1 | c2).astype(np.uint64)
        Xh = (Xh ^ Pv) | Eq
        Ph = Mv | ~(Xh | Pv)
        Mh = Pv & Xh
        # score update at each pair's own high bit
        ph_h = (Ph[rows, hw] & hbit) != 0
        mh_h = (Mh[rows, hw] & hbit) != 0
        score += ph_h.astype(np.int64)
        score -= mh_h.astype(np.int64)
        # shift Ph/Mh left by one across words (carry-in 1 for Ph)
        ph_carry = np.full(n, one, dtype=np.uint64)
        mh_carry = np.zeros(n, dtype=np.uint64)
        for w in range(W):
            ph_hi = Ph[:, w] >> np.uint64(63)
            mh_hi = Mh[:, w] >> np.uint64(63)
            Ph[:, w] = (Ph[:, w] << one) | ph_carry
            Mh[:, w] = (Mh[:, w] << one) | mh_carry
            ph_carry = ph_hi
            mh_carry = mh_hi
        Pv = Mh | ~(Xv | Ph)
        Mv = Ph & Xv
        done = (la == i) & (lb > 0)  # lb == 0 answered up front
        if done.any():
            res[done] = score[done]
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

    When the native kernel is available the same greedy-window algorithm
    runs in C (~3 µs/pair); this numpy body is the fallback and parity
    reference.
    """
    n = len(left)
    if n == 0:
        return np.empty(0, dtype=np.float64)
    A, la = _encode_u32(left, cap)
    B, lb = _encode_u32(right, cap)
    if cap <= 512:
        from .native import get_lib

        lib = get_lib()
        if lib is not None:
            import ctypes

            out = np.empty(n, dtype=np.float64)
            lib.batch_jaro_winkler(
                A.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                la.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                B.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
                lb.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                n, cap, ctypes.c_double(prefix_weight),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            )
            return out
    return _batch_jaro_winkler_numpy(A, la, B, lb, prefix_weight)


def _batch_jaro_winkler_numpy(
    A: np.ndarray,
    la: np.ndarray,
    B: np.ndarray,
    lb: np.ndarray,
    prefix_weight: float,
) -> np.ndarray:
    """Numpy greedy-window Jaro-Winkler over pre-encoded code-point
    matrices (see ``batch_jaro_winkler``)."""
    n = len(la)
    cap = A.shape[1]
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
    jw = batch_jaro_winkler(left, right, cap=jw_cap)
    lv = batch_levenshtein_ratio(left, right, cap=lev_cap)
    return jw, lv
