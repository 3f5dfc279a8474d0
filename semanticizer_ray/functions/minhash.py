"""Seeded MinHash signatures over character shingles, and LSH banding.

SURVEY.md T5/T6 — the stage-1 blocking core the north_rule adds on top of
the reference's anchor machinery. Key property exploited for scale:

    minhash(shingles(A) ∪ shingles(B)) = elementwise_min(minhash(A), minhash(B))

so per-TURN signatures computed in a stateless ``map_batches`` pass can be
combined into per-CONVERSATION signatures with a tiny mergeable aggregation —
the conv-level shuffle moves ``num_hashes`` uint64 per turn instead of the
turn text itself.

Hash family: multiply-shift over a 64-bit rolling base hash of each shingle
(``sig_i = min over shingles of (a_i * h + b_i) mod 2^64`` with odd ``a_i``),
vectorized in numpy with intentional uint64 wraparound. ``a_i, b_i`` come
from ``np.random.default_rng(seed)`` → same (seed, text) gives the same
signature on any worker, any platform.
"""

from __future__ import annotations

import numpy as np

# numpy warns on uint64 overflow in some paths; wraparound is intentional here
_ERR = {"over": "ignore"}


def hash_params(num_hashes: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng(seed)
    a = rng.integers(1, np.iinfo(np.uint64).max, size=num_hashes, dtype=np.uint64)
    a |= np.uint64(1)  # odd multipliers → bijective mod 2^64
    b = rng.integers(0, np.iinfo(np.uint64).max, size=num_hashes, dtype=np.uint64)
    return a, b


def shingle_hashes(text: str, k: int) -> np.ndarray:
    """Distinct 64-bit base hashes of all char k-shingles, vectorized.

    A text shorter than k yields one shingle (the whole text) so no input
    maps to an empty set.
    """
    if not text:
        text = "\x00"
    buf = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32)
    kk = min(k, len(buf))
    with np.errstate(**_ERR):
        windows = np.lib.stride_tricks.sliding_window_view(buf, kk).astype(np.uint64)
        mult = np.power(np.uint64(1099511628211), np.arange(kk, dtype=np.uint64))
        h = (windows * mult).sum(axis=1, dtype=np.uint64)
        # final avalanche so nearby windows don't collide structurally
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
    return np.unique(h)


def shingle_hashes_multi(texts: list[str], k: int) -> list[np.ndarray]:
    """Per-text raw k-shingle window hashes for a whole batch, ONE encode +
    ONE windowing pass over the concatenated code-point buffer (boundary
    windows masked out). Hash values are identical to ``shingle_hashes``;
    outputs are NOT deduplicated (callers that union across texts unique
    once per group — cheaper than per-text unique, same resulting set).
    Texts shorter than ``k`` (incl. empty) take the scalar path: their
    single whole-text shingle uses a different window width."""
    n = len(texts)
    if n == 0:
        return []
    lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
    out: list[np.ndarray] = [None] * n  # type: ignore[list-item]
    short = lens < k
    for i in np.flatnonzero(short):
        out[i] = shingle_hashes(texts[i], k)
    long_idx = np.flatnonzero(~short)
    if len(long_idx) == 0:
        return out
    big = np.frombuffer("".join(texts).encode("utf-32-le"), dtype=np.uint32)
    offs = np.concatenate(([0], np.cumsum(lens)))
    with np.errstate(**_ERR):
        windows = np.lib.stride_tricks.sliding_window_view(big, k)
        mult = np.power(np.uint64(1099511628211), np.arange(k, dtype=np.uint64))
        # chunked matvec: bound the (chunk, k) uint64 temp
        h_all = np.empty(len(windows), dtype=np.uint64)
        CH = 1 << 19
        for lo in range(0, len(windows), CH):
            w = windows[lo : lo + CH].astype(np.uint64)
            h_all[lo : lo + CH] = (w * mult).sum(axis=1, dtype=np.uint64)
        h_all ^= h_all >> np.uint64(33)
        h_all *= np.uint64(0xFF51AFD7ED558CCD)
        h_all ^= h_all >> np.uint64(33)
    for i in long_idx:
        out[i] = h_all[offs[i] : offs[i] + lens[i] - k + 1]
    return out


def minhash_from_shingle_groups(
    groups: list[np.ndarray], a: np.ndarray, b: np.ndarray
) -> np.ndarray:
    """MinHash signatures, one row per shingle-hash GROUP (each group =
    the deduplicated shingle set of one record), computed with chunked
    ``np.minimum.reduceat`` over the concatenated hash array — replaces a
    per-record python loop of small (num_hashes × n_shingles) products.
    Chunks align to group boundaries so each reduceat is self-contained.

    With the native kernel present the same arithmetic runs in C with the
    running mins in a stack array — the numpy path materializes an
    (H, total_shingles) product, ~1 GB of DRAM churn per 8k-turn batch,
    which is exactly the kind of bandwidth pressure that stops a 32-core
    node from scaling."""
    H = len(a)
    n = len(groups)
    sig = np.full((n, H), np.iinfo(np.uint64).max, dtype=np.uint64)
    if n == 0:
        return sig
    from .native import get_lib

    lib = get_lib()
    if lib is not None:
        import ctypes

        sh = np.ascontiguousarray(np.concatenate(groups))
        sizes = np.fromiter((len(g) for g in groups), dtype=np.int64, count=n)
        ends = np.cumsum(sizes)
        starts = ends - sizes
        p_u64 = ctypes.POINTER(ctypes.c_uint64)
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        lib.batch_minhash(
            sh.ctypes.data_as(p_u64),
            starts.ctypes.data_as(p_i64),
            ends.ctypes.data_as(p_i64),
            n,
            np.ascontiguousarray(a).ctypes.data_as(p_u64),
            np.ascontiguousarray(b).ctypes.data_as(p_u64),
            H,
            sig.ctypes.data_as(p_u64),
        )
        return sig
    CH = 1 << 16  # ~64 MB peak temp at H=128
    with np.errstate(**_ERR):
        g0 = 0
        while g0 < n:
            g1, total = g0, 0
            while g1 < n and (total == 0 or total + len(groups[g1]) <= CH):
                total += len(groups[g1])
                g1 += 1
            sizes = np.fromiter(
                (len(groups[g]) for g in range(g0, g1)), dtype=np.int64, count=g1 - g0
            )
            nonempty = sizes > 0
            if total:
                sh = np.concatenate([groups[g] for g in range(g0, g1)])
                starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))[nonempty]
                vals = a[:, None] * sh[None, :] + b[:, None]  # (H, total)
                mins = np.minimum.reduceat(vals, starts, axis=1)  # (H, k)
                sig[g0:g1][nonempty] = mins.T
            g0 = g1
    return sig


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, k: int) -> np.ndarray:
    """MinHash signature (uint64[num_hashes]) of a text's char-k-shingles."""
    sh = shingle_hashes(text, k)
    sig = np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    CHUNK = 16384  # bound the (num_hashes × shingles) temp for long texts
    with np.errstate(**_ERR):
        for lo in range(0, len(sh), CHUNK):
            part = sh[lo : lo + CHUNK]
            vals = a[:, None] * part[None, :] + b[:, None]
            np.minimum(sig, vals.min(axis=1), out=sig)
    return sig


def merge_signatures(sigs: np.ndarray) -> np.ndarray:
    """Combine per-part signatures (rows) into one: elementwise min."""
    return sigs.min(axis=0)


def band_hashes(sig: np.ndarray, num_bands: int) -> np.ndarray:
    """Collapse a signature into ``num_bands`` band hashes (uint64).

    Two texts share a band hash iff their signatures agree on every row in
    that band → LSH candidate pair.
    """
    if len(sig) < num_bands:
        # rows-per-band would floor to 0 → every band hash 0 for every
        # text → one bucket per band downstream (silent quadratic pair
        # blowup). A config with num_hashes < num_bands is a loud error.
        raise ValueError(
            f"num_hashes ({len(sig)}) must be >= num_bands ({num_bands})"
        )
    rows = len(sig) // num_bands
    bands = sig[: rows * num_bands].reshape(num_bands, rows)
    mix = np.uint64(0xFF51AFD7ED558CCD)
    acc = np.zeros(num_bands, dtype=np.uint64)
    with np.errstate(**_ERR):
        for r in range(rows):
            acc = (acc ^ bands[:, r]) * mix
    return acc


def batch_band_hashes(sig_mat: np.ndarray, num_bands: int) -> np.ndarray:
    """Band hashes for a whole signature matrix at once: uint64[n, H] →
    uint64[n, num_bands]. Row i equals ``band_hashes(sig_mat[i], num_bands)``
    exactly (same xor-multiply fold, asserted by the parity test) — the
    batched form the explode stages use so no per-row Python runs in the
    blocking hot path."""
    n, h = sig_mat.shape
    if h < num_bands and n > 0:
        # same guard as band_hashes: 0 rows per band hashes every row to 0
        # (an (0, 0) matrix from an empty batch passes through untouched)
        raise ValueError(
            f"num_hashes ({h}) must be >= num_bands ({num_bands})"
        )
    rows = h // num_bands
    bands = sig_mat[:, : rows * num_bands].reshape(n, num_bands, rows)
    mix = np.uint64(0xFF51AFD7ED558CCD)
    acc = np.zeros((n, num_bands), dtype=np.uint64)
    with np.errstate(**_ERR):
        for r in range(rows):
            acc = (acc ^ bands[:, :, r]) * mix
    return acc


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())
