"""MinHash determinism, mergeability, Jaccard estimation (SURVEY.md T5)."""

import numpy as np
import pytest

from semanticizer_ray.functions.minhash import (
    band_hashes,
    estimate_jaccard,
    hash_params,
    merge_signatures,
    minhash_signature,
    shingle_hashes,
)

A, B = hash_params(128, seed=42)


def test_deterministic():
    s1 = minhash_signature("hello world this is a test", A, B, k=5)
    s2 = minhash_signature("hello world this is a test", A, B, k=5)
    assert np.array_equal(s1, s2)
    a2, b2 = hash_params(128, seed=42)
    assert np.array_equal(A, a2) and np.array_equal(B, b2)


def test_short_and_empty_text():
    for t in ["", "a", "ab", "abcd"]:
        sig = minhash_signature(t, A, B, k=5)
        assert sig.dtype == np.uint64 and len(sig) == 128
        assert np.array_equal(sig, minhash_signature(t, A, B, k=5))


def test_mergeability():
    """minhash(A ∪ B) == min(minhash(A), minhash(B)) on shingle SETS."""
    t1, t2 = "the quick brown fox jumps", "over the lazy dog again"
    sh = np.union1d(shingle_hashes(t1, 5), shingle_hashes(t2, 5))
    # signature of the union of shingle sets
    sig_union = np.full(128, np.iinfo(np.uint64).max, dtype=np.uint64)
    with np.errstate(over="ignore"):
        vals = A[:, None] * sh[None, :] + B[:, None]
    sig_union = vals.min(axis=1)
    merged = merge_signatures(
        np.stack([minhash_signature(t1, A, B, 5), minhash_signature(t2, A, B, 5)])
    )
    assert np.array_equal(sig_union, merged)


def test_jaccard_estimate_quality():
    base = "please can you check the status of our order and let me know " * 5
    sim = base[:-30] + " minor tail change here now"
    diff = "completely different content about gardening and astronomy " * 5
    a1024, b1024 = hash_params(1024, seed=7)
    s_base = minhash_signature(base, a1024, b1024, 5)
    s_sim = minhash_signature(sim, a1024, b1024, 5)
    s_diff = minhash_signature(diff, a1024, b1024, 5)
    est_sim = estimate_jaccard(s_base, s_sim)
    est_diff = estimate_jaccard(s_base, s_diff)
    # true jaccards
    sh_b, sh_s = set(shingle_hashes(base, 5)), set(shingle_hashes(sim, 5))
    true_sim = len(sh_b & sh_s) / len(sh_b | sh_s)
    assert est_sim == pytest.approx(true_sim, abs=0.08)
    assert est_diff < 0.05 < est_sim


def test_band_hashes():
    sig = minhash_signature("some text for banding", A, B, 5)
    bh = band_hashes(sig, num_bands=16)
    assert len(bh) == 16
    assert np.array_equal(bh, band_hashes(sig, 16))
    # order within band matters
    sig2 = sig.copy()
    sig2[0], sig2[1] = sig[1], sig[0]
    assert bh[0] != band_hashes(sig2, 16)[0]
