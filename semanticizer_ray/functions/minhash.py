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
    rows = len(sig) // num_bands
    bands = sig[: rows * num_bands].reshape(num_bands, rows)
    mix = np.uint64(0xFF51AFD7ED558CCD)
    acc = np.zeros(num_bands, dtype=np.uint64)
    with np.errstate(**_ERR):
        for r in range(rows):
            acc = (acc ^ bands[:, r]) * mix
    return acc


def estimate_jaccard(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
    return float((sig_a == sig_b).mean())
