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


def test_batch_band_hashes_parity():
    """batch_band_hashes row i == band_hashes(sig[i]) exactly (the fold the
    vectorized block-key explode relies on)."""
    from semanticizer_ray.functions.minhash import batch_band_hashes

    rng = np.random.default_rng(3)
    mat = rng.integers(0, 2**63, size=(40, 128), dtype=np.uint64)
    bh = batch_band_hashes(mat, 16)
    assert bh.shape == (40, 16)
    for i in range(40):
        assert np.array_equal(bh[i], band_hashes(mat[i], 16))
    # degenerate: fewer hashes than bands used to produce all-zero hashes
    # (one bucket per band → silent quadratic pair blowup); now a loud error
    with pytest.raises(ValueError, match="num_bands"):
        batch_band_hashes(mat[:2, :8], 16)


def test_band_key_array_and_hex_codecs():
    import pyarrow as pa

    from semanticizer_ray.functions.minhash import batch_band_hashes
    from semanticizer_ray.stages.blocking import (
        band_key_array,
        hex64_array,
        parse_hex64,
        sig_matrix,
    )

    rng = np.random.default_rng(9)
    mat = rng.integers(0, 2**64, size=(10, 64), dtype=np.uint64)
    bh = batch_band_hashes(mat, 8)
    keys = band_key_array(bh).to_pylist()
    expect = [f"L{b:02d}:{h:016x}" for i in range(10) for b, h in enumerate(bh[i])]
    assert keys == expect
    # hex64 round-trip incl. extremes
    vals = np.array([0, 1, 2**64 - 1, 0xDEADBEEF], dtype=np.uint64)
    col = hex64_array(vals)
    assert col.to_pylist() == [f"{v:016x}" for v in vals]
    assert np.array_equal(parse_hex64(col), vals)
    # parse fallback: non-uniform widths
    assert np.array_equal(
        parse_hex64(pa.array(["ff", "0"])), np.array([255, 0], dtype=np.uint64)
    )
    # sig_matrix zero-copy view (incl. sliced array)
    col2 = pa.array([row.tobytes() for row in mat])
    assert np.array_equal(sig_matrix(col2, 10), mat)
    assert np.array_equal(sig_matrix(col2.slice(3, 4), 4), mat[3:7])
    # ragged widths must fail loudly (never silently mis-band rows)
    import pytest as _pytest

    ragged = pa.array([b"\0" * 8, b"\0" * 16, b"\0" * 24])
    with _pytest.raises(ValueError, match="uniform"):
        sig_matrix(ragged, 3)
    # uniform zero-width signatures used to slip through as an (n, 0)
    # matrix (→ identical all-zero band keys for every row); now loud
    with _pytest.raises(ValueError, match="zero-width"):
        sig_matrix(pa.array([b"", b"", b""]), 3)


def test_doc_signatures_batch_vs_scalar():
    """_DocSignatures (batched kernels) emits exactly the per-doc signature
    and band keys the scalar path produces."""
    import hashlib

    import pyarrow as pa

    from semanticizer_ray.config import EngineConfig
    from semanticizer_ray.stages.dedup import _DocSignatures

    cfg = EngineConfig()
    texts = ["the quick brown fox", "", "short", "the quick brown fox", "abcdefg " * 40]
    ids = list(range(len(texts)))
    batch = pa.table({"doc_id": pa.array(ids, pa.int64()), "text": texts})
    out = _DocSignatures(cfg, "doc_id", "text")(batch)
    nb = cfg.blocking.num_bands
    assert out.num_rows == len(texts) * nb
    a, b = hash_params(cfg.blocking.num_hashes, cfg.seed)
    docs = out["doc"].to_pylist()
    sigs = out["sig"].to_pylist()
    keys = out["bucket"].to_pylist()
    contents = out["content"].to_pylist()
    for i, t in enumerate(texts):
        rows = [r for r in range(out.num_rows) if docs[r] == i]
        assert len(rows) == nb
        sig = minhash_signature(t, a, b, cfg.blocking.shingle_k)
        for r in rows:
            assert sigs[r] == sig.tobytes()
        got_keys = [keys[r] for r in rows]
        expect = [
            f"L{band:02d}:{h:016x}" for band, h in enumerate(band_hashes(sig, nb))
        ]
        assert got_keys == expect
        ch = int.from_bytes(
            hashlib.md5(t.encode()).digest()[:8], "little", signed=True
        )
        assert all(contents[r] == ch for r in rows)
