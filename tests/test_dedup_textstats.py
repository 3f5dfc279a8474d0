"""SimHash Hamming≤k banding + script-aware langid (round-2 additions)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_simhash_hamming_pairs_planted(ray_session):
    """Values within Hamming≤k group; beyond-k values do not."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import simhash_hamming_pairs

    base = 0x0123456789ABCDEF
    vals = {
        1: base,
        2: base ^ 0x1,                # d=1 from base
        3: base ^ 0b11,               # d=2 from base
        4: base ^ 0xFFFF0000FFFF0000, # far from everything
        5: 0x0F0F0F0F0F0F0F0F,        # far
    }
    rows = pd.DataFrame(
        {"doc_id": list(vals), "simhash": [f"{v:016x}" for v in vals.values()]}
    )
    out = simhash_hamming_pairs(rd.from_pandas(rows), hamming_k=2).to_pandas()
    got = {(min(a, b), max(a, b)): h for a, b, h in zip(out["src"], out["dst"], out["hamming"])}
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 2
    assert (2, 3) in got  # d(base^1, base^3) = 1
    for far in ((1, 4), (1, 5), (4, 5)):
        assert far not in got


def test_simhash_dedup_hamming_end_to_end(ray_session):
    """1-word-substituted long docs land within Hamming≤3 and group."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import simhash, simhash_dedup

    words = [f"tok{i}" for i in range(200)]
    doc_a = " ".join(words)
    doc_b = " ".join(words[:-1] + ["CHANGED"])  # one token differs
    doc_c = " ".join(f"other{i}" for i in range(200))
    docs = pd.DataFrame({"doc_id": [1, 2, 3], "text": [doc_a, doc_b, doc_c]})

    sh = simhash(rd.from_pandas(docs)).to_pandas()
    vals = dict(zip(sh["doc_id"], (int(s, 16) for s in sh["simhash"])))
    d_ab = bin(vals[1] ^ vals[2]).count("1")
    assert 0 < d_ab <= 3, f"planted near-dup at distance {d_ab}"

    out = simhash_dedup(rd.from_pandas(docs), hamming_k=3).to_pandas()
    grp = dict(zip(out["doc_id"], out["dup_group"]))
    assert grp[1] == grp[2] == 1
    assert grp[3] == 3


def test_minhash_dedup_huge_ids_min_invariant(ray_session):
    """ADVICE r2: ids ≥ 10^12 must still honor dup_group = NUMERIC min id
    (the 20-digit zero-pad keeps lexicographic order == numeric order)."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import minhash_dedup, simhash_dedup
    from semanticizer_ray.config import EngineConfig

    # 999999999999 < 10^12 ≤ 8000000000000: a 12-digit pad would sort
    # "8000000000000" (13 digits) before "999999999999" lexicographically
    big, small = 8_000_000_000_000, 999_999_999_999
    text = " ".join(f"tok{i}" for i in range(80))
    docs = pd.DataFrame(
        {"doc_id": [big, small, 7], "text": [text, text, "unrelated words here"]}
    )
    out = minhash_dedup(rd.from_pandas(docs), EngineConfig()).to_pandas()
    grp = dict(zip(out["doc_id"], out["dup_group"]))
    assert grp[big] == grp[small] == small
    assert grp[7] == 7

    out2 = simhash_dedup(rd.from_pandas(docs), hamming_k=3).to_pandas()
    grp2 = dict(zip(out2["doc_id"], out2["dup_group"]))
    assert grp2[big] == grp2[small] == small

    with pytest.raises(Exception, match="non-negative"):
        minhash_dedup(
            rd.from_pandas(pd.DataFrame({"doc_id": [-1, 2], "text": [text, text]})),
            EngineConfig(),
        ).materialize()


def test_minhash_exact_verify_equals_exact_groups(ray_session):
    """exact_verify mode: LSH candidates + content-fingerprint verify must
    reproduce the exact-text groups — near-dups (high Jaccard, unequal
    text) must NOT group, exact dups must."""
    import ray.data as rd

    from semanticizer_ray.config import EngineConfig
    from semanticizer_ray.stages.dedup import minhash_dedup

    words = [f"tok{i}" for i in range(120)]
    exact = " ".join(words)
    near = " ".join(words[:-1] + ["CHANGED"])  # Jaccard ≈ 0.97, text ≠
    docs = pd.DataFrame(
        {"doc_id": [1, 2, 3, 4], "text": [exact, exact, near, "something else"]}
    )
    ds = rd.from_pandas(docs)
    cfg = EngineConfig()

    near_mode = minhash_dedup(ds, cfg).to_pandas()
    g = dict(zip(near_mode["doc_id"], near_mode["dup_group"]))
    assert g[1] == g[2] == g[3] == 1  # threshold mode groups the near-dup

    exact_mode = minhash_dedup(ds, cfg, exact_verify=True).to_pandas()
    g = dict(zip(exact_mode["doc_id"], exact_mode["dup_group"]))
    assert g[1] == g[2] == 1
    assert g[3] == 3 and g[4] == 4  # near-dup stays out in exact mode


def test_minhash_exact_verify_unaffected_by_max_bucket(ray_session):
    """exact_verify must stay exact when a text has MORE duplicates than
    max_bucket (the star-to-min verification makes truncation unnecessary;
    regression for the silently-broken oracle equivalence)."""
    import ray.data as rd

    from semanticizer_ray.config import EngineConfig
    from semanticizer_ray.stages.dedup import minhash_dedup

    n_dup = 12
    docs = pd.DataFrame(
        {
            "doc_id": list(range(1, n_dup + 1)) + [100, 101],
            "text": ["same text body with enough tokens to shingle"] * n_dup
            + ["another body entirely", "a third distinct body"],
        }
    )
    out = minhash_dedup(
        rd.from_pandas(docs), EngineConfig(), exact_verify=True, max_bucket=4
    ).to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert all(g[i] == 1 for i in range(1, n_dup + 1))  # ALL dups group to min
    assert g[100] == 100 and g[101] == 101


def test_simhash_batch_invariance(ray_session):
    """Same docs at different batch sizes → identical simhash values."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import simhash

    docs = pd.DataFrame(
        {
            "doc_id": range(20),
            "text": [f"alpha beta gamma doc {i} " * (i + 1) for i in range(20)],
        }
    )
    a = simhash(rd.from_pandas(docs).repartition(1)).to_pandas().sort_values("doc_id")
    b = simhash(rd.from_pandas(docs).repartition(7)).to_pandas().sort_values("doc_id")
    assert list(a["simhash"]) == list(b["simhash"])


def test_langid_scripts_and_latin(ray_session):
    """Golden vectors: real-language snippets incl. non-latin scripts."""
    import ray.data as rd

    from semanticizer_ray.stages.textstats import lang_id

    samples = [
        ("en", "the cat sat on the mat and it is happy with the result for now"),
        ("de", "der hund und die katze sind nicht mit den kindern zu hause"),
        ("fr", "le chat est sur la table et il est content pour le moment que"),
        ("es", "el perro y la gata es una mascota que vive por la casa"),
        ("zh", "今天天气很好我们一起去公园散步然后吃午饭"),
        ("ja", "今日はいい天気ですねこうえんへいきましょうかたのしいです"),
        ("ko", "오늘 날씨가 좋아서 공원에 산책하러 갑니다"),
        ("ru", "сегодня хорошая погода и мы идем гулять в парк вместе"),
    ]
    df = pd.DataFrame(
        {"doc_id": range(len(samples)), "lang": [s[0] for s in samples],
         "text": [s[1] for s in samples]}
    )
    out = lang_id(rd.from_pandas(df)).to_pandas().sort_values("doc_id")
    acc = (out["lang_pred"].to_numpy() == df["lang"].to_numpy()).mean()
    assert acc >= 0.95, list(zip(df["lang"], out["lang_pred"]))


def test_fingerprint_properties(ray_session):
    """Deterministic, distinct for distinct texts, stable across batching."""
    import ray.data as rd

    from semanticizer_ray.stages.textstats import fingerprint

    docs = pd.DataFrame(
        {"doc_id": range(30),
         "text": [f"document body {i} with some shared prefix" for i in range(30)]}
    )
    a = fingerprint(rd.from_pandas(docs).repartition(1)).to_pandas().sort_values("doc_id")
    b = fingerprint(rd.from_pandas(docs).repartition(5)).to_pandas().sort_values("doc_id")
    assert list(a["fp"]) == list(b["fp"])
    assert a["fp"].nunique() == len(a)


def test_content_fp64_shared_basis():
    """content_fp64 is THE single fingerprint basis of the exact-verify
    dedup modes: little-endian signed int64 of the first 8 md5 bytes,
    None treated as empty text."""
    import hashlib

    from semanticizer_ray.stages.dedup import content_fp64

    texts = ["", "hello", "hello", None, "héllo"]
    got = content_fp64(texts)
    assert got.dtype == np.int64 and len(got) == len(texts)
    for t, v in zip(texts, got):
        expect = int.from_bytes(
            hashlib.md5((t or "").encode("utf-8")).digest()[:8], "little", signed=True
        )
        assert int(v) == expect
    assert got[1] == got[2] and got[0] == got[3] and got[1] != got[4]


def test_fingerprint_matches_scalar_reference(ray_session):
    """Byte-exact parity vs an independent per-byte scalar reference
    (UTF-8 byte-level FNV polynomial + murmur avalanche), including empty
    text and multi-byte non-ASCII — the cases the ASCII-only DuckDB oracle
    (catalog.DOC_FINGERPRINTS_SQL) cannot cover."""
    import ray.data as rd

    from semanticizer_ray.stages.textstats import fingerprint

    texts = ["", "a", "héllo wörld", "日本語テキスト", "mixed ascii + ünïcode", "a" * 3000]

    def ref(t: str) -> str:
        mask = (1 << 64) - 1
        p, s = 1, 0
        for byte in t.encode("utf-8"):
            s = (s + byte * p) & mask
            p = (p * 1099511628211) & mask
        acc = (14695981039346656037 + s) & mask
        acc ^= acc >> 33
        acc = (acc * 0xFF51AFD7ED558CCD) & mask
        acc ^= acc >> 33
        return f"{acc:016x}"

    docs = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    got = fingerprint(rd.from_pandas(docs)).to_pandas().sort_values("doc_id")
    assert list(got["fp"]) == [ref(t) for t in texts]


def test_simhash_exact_verify_equals_exact_groups(ray_session):
    """exact_verify mode: simhash-grouped shuffle + content-fingerprint
    verify must reproduce exact-text groups — in particular, distinct
    texts with the SAME word multiset (identical simhash by construction)
    must NOT group."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import simhash, simhash_dedup

    a = "alpha beta gamma delta epsilon"
    b = "epsilon delta gamma beta alpha"  # same multiset → same simhash
    docs = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": [a, a, b, "other"]})
    ds = rd.from_pandas(docs)

    sh = simhash(ds).to_pandas()
    v = dict(zip(sh["doc_id"], sh["simhash"]))
    assert v[1] == v[3]  # the hazard exact_verify exists to defuse

    out = simhash_dedup(ds, exact_verify=True).to_pandas()
    g = dict(zip(out["doc_id"], out["dup_group"]))
    assert g[1] == g[2] == 1
    assert g[3] == 3 and g[4] == 4


def _brute_cosine_pairs(ids, vecs, tau):
    V = np.asarray(vecs, dtype=np.float64)
    n = np.linalg.norm(V, axis=1)
    n[n == 0] = 1.0
    Vn = V / n[:, None]
    C = Vn @ Vn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = C[iu, ju] >= tau
    return {
        (min(ids[i], ids[j]), max(ids[i], ids[j])): C[i, j]
        for i, j in zip(iu[keep], ju[keep])
    }


def test_embedding_pairs_exact_matches_bruteforce(ray_session):
    """The triangle block-pair plan is EXACT: pair set and cosines equal the
    driver-side all-pairs reference, for any block count (B=1 degenerate,
    B=5 non-dividing, B=8 default)."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import embedding_pairs_exact

    rng = np.random.default_rng(7)
    n, d, tau = 60, 16, 0.55
    vecs = rng.standard_normal((n, d))
    # plant correlated pairs so the threshold keeps a non-trivial set
    vecs[10] = vecs[3] + 0.1 * rng.standard_normal(d)
    vecs[41] = vecs[20] + 0.05 * rng.standard_normal(d)
    ids = list(range(100, 100 + n))
    want = _brute_cosine_pairs(ids, vecs, tau)
    assert len(want) > 2

    df = pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in vecs]})
    for nb in (1, 5, 8):
        out = embedding_pairs_exact(
            rd.from_pandas(df).repartition(4), cosine_threshold=tau, num_blocks=nb
        ).to_pandas()
        got = {
            (int(r.src), int(r.dst)): float(r.cosine) for r in out.itertuples()
        }
        assert set(got) == set(want), f"pair set mismatch at B={nb}"
        for k in want:
            assert abs(got[k] - want[k]) < 1e-9


def test_knn_brute_set_matches_duckdb_and_lsh_recall_gate(ray_session):
    """The distributed knn_brute top-k SET equals an independent DuckDB
    all-pairs derivation (same cosine, same vec_id tie-break) — the premise
    that makes the knn_lsh_recall engine/oracle recalls identical — and the
    gate's own query/oracle pair hash-matches."""
    import duckdb

    from semanticizer_ray.pipelines.catalog import (
        KNN_BRUTE_CTES,
        KNN_LSH_RECALL_SQL,
        _KNN_EMB,
        _knn_queries,
        knn_lsh_recall,
    )
    from semanticizer_ray.sources.parquet import read_table
    from semanticizer_ray.stages.similarity import knn_brute

    ds = read_table(_KNN_EMB, columns=["vec_id", "embedding"])
    brute = knn_brute(ds, _knn_queries(), k=10).to_pandas()
    # the SAME CTE chain the shipped oracle uses — so the premise this test
    # pins (engine brute set == oracle brute set) cannot drift from the
    # query the driver actually runs
    sql_brute = duckdb.sql(
        f"WITH {KNN_BRUTE_CTES} SELECT query_idx, vec_id FROM brute"
    ).df()
    assert set(zip(brute["query_idx"], brute["vec_id"])) == set(
        zip(sql_brute["query_idx"], sql_brute["vec_id"])
    )
    got = knn_lsh_recall("unused")
    want = duckdb.sql(KNN_LSH_RECALL_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["recall"].iloc[0] >= 0.6  # representative operating point


def test_embedding_lsh_subset_of_exact_with_high_threshold_recall(ray_session):
    """LSH near-dup pairs are a SUBSET of the exact join; at a high
    threshold with planted near-identical vectors (tiny perturbations keep
    every hyperplane sign w.h.p.) the LSH path recovers the planted pairs."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import embedding_dedup, embedding_pairs_exact

    rng = np.random.default_rng(11)
    n, d, tau = 80, 24, 0.995
    base = rng.standard_normal((n, d)) * 4.0  # well away from the planes
    vecs = list(base)
    planted = []
    for src in (5, 17, 33):
        dup = base[src] + 1e-4 * rng.standard_normal(d)
        planted.append((src, len(vecs)))
        vecs.append(dup)
    ids = list(range(len(vecs)))
    df = pd.DataFrame({"vec_id": ids, "embedding": [list(v) for v in vecs]})
    ds = rd.from_pandas(df)

    exact = embedding_pairs_exact(ds, cosine_threshold=tau, num_blocks=4).to_pandas()
    lsh = embedding_dedup(ds, cosine_threshold=tau).to_pandas()
    exact_set = {(int(r.src), int(r.dst)) for r in exact.itertuples()}
    lsh_set = {(int(r.src), int(r.dst)) for r in lsh.itertuples()}
    assert lsh_set <= exact_set
    for a, b in planted:
        assert (min(a, b), max(a, b)) in exact_set
    # recall of the LSH path on the planted near-identical pairs
    hits = sum((min(a, b), max(a, b)) in lsh_set for a, b in planted)
    assert hits == len(planted)


def test_embedding_neardup_recall_gate_and_fixture_staleness(ray_session):
    """The embedding_neardup_recall gate's engine result hash-matches its
    DuckDB oracle, recall is 1.0 on the planted fixture, and — the staleness
    contract — a stale manifest forces the planted FIXTURE itself to be
    regenerated, not just the pairs artifact (a cached fixture from an older
    generator must not survive a bare os.path.exists check)."""
    import json

    import duckdb
    import pyarrow.parquet as pq

    from semanticizer_ray.pipelines import catalog as c

    got = c.embedding_neardup_recall("unused")
    want = duckdb.sql(c.EMBND_RECALL_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["exact_pairs"].iloc[0] > 0
    assert got["recall"].iloc[0] == 1.0

    # staleness: truncate the fixture and plant a stale fingerprint;
    # ensure() must rebuild the fixture to full size and refresh the manifest
    full = pq.read_table(c._EMBND_FIX)
    pq.write_table(full.slice(0, 5), c._EMBND_FIX)
    with open(c._EMBND_MANIFEST, "w") as f:
        json.dump({"fingerprint": "stale"}, f)
    c.ensure_embedding_neardup_artifacts()
    assert pq.read_table(c._EMBND_FIX).num_rows == full.num_rows
    with open(c._EMBND_MANIFEST) as f:
        assert json.load(f)["fingerprint"] == c._embnd_fingerprint()


def test_file_fingerprint_tracks_content():
    """_file_fingerprint (the external-input component of the knn_lsh_recall
    fingerprint) changes when the file's content changes and is stable
    across re-reads of identical content."""
    import os
    import tempfile

    from semanticizer_ray.pipelines.catalog import _file_fingerprint

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.bin")
        with open(p, "wb") as f:
            f.write(b"alpha")
        fp1 = _file_fingerprint(p)
        assert fp1 == _file_fingerprint(p)
        os.utime(p, ns=(1, 1))  # defeat the (size, mtime) memo key
        with open(p, "wb") as f:
            f.write(b"bravo")
        os.utime(p, ns=(2, 2))
        assert _file_fingerprint(p) != fp1


def test_ngram_jaccard_pairs_matches_scalar_primitive(ray_session):
    """The distributed inverted-index join equals the all-pairs scalar
    primitive (ngram_jaccard) on every pair, including short-doc (< n
    words) and empty-doc edge cases."""
    import itertools

    import ray.data as rd

    from semanticizer_ray.stages.dedup import ngram_jaccard, ngram_jaccard_pairs

    texts = [
        "the cat sat on the mat today",      # 0
        "the cat sat on the mat yesterday",  # 1: near-dup of 0
        "a completely different document about spark shuffles",  # 2
        "the cat sat on the mat today",      # 3: exact dup of 0
        "short doc",                         # 4: < n words → whole-text gram
        "short doc",                         # 5: dup of 4 via whole-text gram
        "",                                  # 6: empty → no postings, no pairs
        "spark shuffles are completely different here too now",  # 7
    ]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    thr = 0.5
    got = (
        ngram_jaccard_pairs(rd.from_pandas(df).repartition(4), n=3, threshold=thr)
        .to_pandas()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    want_rows = [
        (a, b, ngram_jaccard(texts[a], texts[b], 3))
        for a, b in itertools.combinations(range(len(texts)), 2)
        if ngram_jaccard(texts[a], texts[b], 3) >= thr and texts[a] and texts[b]
    ]
    want = pd.DataFrame(want_rows, columns=["src", "dst", "jaccard"]).astype(
        {"src": "int64", "dst": "int64"}
    )
    pd.testing.assert_frame_equal(got, want)
    # the planted structure actually exercises each edge case
    assert {(0, 3), (4, 5)} <= set(zip(want["src"], want["dst"]))
    assert (want["jaccard"] == 1.0).sum() >= 2 and (want["jaccard"] < 1.0).any()


def test_ngram_jaccard_pairs_threshold_and_empty(ray_session):
    """threshold=0 emits every sharing pair; an input with no sharing
    pairs yields an empty, correctly-typed frame."""
    import ray.data as rd

    from semanticizer_ray.stages.dedup import ngram_jaccard_pairs

    df = pd.DataFrame(
        {"doc_id": [10, 20], "text": ["alpha beta gamma delta", "epsilon zeta eta theta"]}
    )
    out = ngram_jaccard_pairs(rd.from_pandas(df), n=3, threshold=0.0).to_pandas()
    # a fully-empty Ray dataset loses its schema on to_pandas (known Ray
    # quirk; the catalog wrapper restores the typed empty frame)
    assert len(out) == 0


def test_kmeans_centroids_deterministic_and_valid():
    """Fixed seed + fixed input → identical centroids (the IVF picks
    artifact depends on this); unit-norm rows; nlist validation."""
    import numpy as np

    from semanticizer_ray.stages.similarity import kmeans_centroids

    rng = np.random.default_rng(3)
    V = rng.standard_normal((200, 8))
    C1 = kmeans_centroids(V, nlist=8, seed=42)
    C2 = kmeans_centroids(V, nlist=8, seed=42)
    np.testing.assert_array_equal(C1, C2)
    np.testing.assert_allclose(np.linalg.norm(C1, axis=1), 1.0, atol=1e-12)
    with pytest.raises(ValueError, match="nlist"):
        kmeans_centroids(V, nlist=0)
    with pytest.raises(ValueError, match="nlist"):
        kmeans_centroids(V, nlist=201)


def test_knn_ivf_full_probe_equals_brute_and_recall_gate(ray_session):
    """With nprobe == nlist (every cell probed) IVF must equal knn_brute
    exactly — pruning is the ONLY approximation. At the shipped operating
    point (nlist=16, nprobe=4) the recall gate's engine/oracle pair
    hash-matches and recall clears the representative floor."""
    import duckdb

    from semanticizer_ray.pipelines.catalog import (
        KNN_IVF_RECALL_SQL,
        _KNN_EMB,
        _knn_queries,
        knn_ivf_recall,
    )
    from semanticizer_ray.sources.parquet import read_table
    from semanticizer_ray.stages.similarity import knn_brute, knn_ivf

    ds = read_table(_KNN_EMB, columns=["vec_id", "embedding"])
    Q = _knn_queries()
    brute = (
        knn_brute(ds, Q, k=10)
        .to_pandas()
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    full = (
        knn_ivf(ds, Q, k=10, nlist=8, nprobe=8)
        .to_pandas()
        .sort_values(["query_idx", "vec_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(full, brute)

    got = knn_ivf_recall("unused")
    want = duckdb.sql(KNN_IVF_RECALL_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["recall"].iloc[0] >= 0.6  # representative operating point


def test_bm25_hand_computed_and_validation(ray_session):
    """BM25 on a 3-doc corpus vs an independent in-test recomputation of
    the Okapi formula; membership is term-presence; validation raises."""
    import math

    import ray.data as rd

    from semanticizer_ray.stages.retrieval import bm25_score

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([0, 1, 2], dtype="int64"),
            "text": ["cat dog CAT", "bird bird", "dog!"],
        }
    )
    out = (
        bm25_score(rd.from_pandas(docs).repartition(2), ("cat", "dog"))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [0, 2]
    assert list(out["n_terms"]) == [2, 1]

    # independent recomputation: N=3, avgdl=2, df(cat)=1, df(dog)=2
    def idf(df):
        return math.log((3 - df + 0.5) / (df + 0.5) + 1)

    def part(tf, dl, df):
        return idf(df) * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))

    want0 = part(2, 3, 1) + part(1, 3, 2)
    want2 = part(1, 1, 2)
    np.testing.assert_allclose(out["score"], [want0, want2], rtol=1e-12)

    with pytest.raises(ValueError, match="terms"):
        bm25_score(rd.from_pandas(docs), ())
    with pytest.raises(ValueError, match="terms"):
        bm25_score(rd.from_pandas(docs), ("cat", "cat"))


def test_corpus_top_terms_hand_counted(ray_session):
    import ray.data as rd

    from semanticizer_ray.stages.retrieval import corpus_top_terms

    docs = pd.DataFrame(
        {"text": ["cat dog cat", "Dog! dog bird", "cat zzz", "", None]}
    )
    out = corpus_top_terms(rd.from_pandas(docs).repartition(3), k=3).to_pandas()
    # counts: cat=3, dog=3, bird=1, zzz=1 → ties by term asc
    assert list(out["term"]) == ["cat", "dog", "bird"]
    assert list(out["n"]) == [3, 3, 1]
    with pytest.raises(ValueError, match="k must"):
        corpus_top_terms(rd.from_pandas(docs), k=0)


def test_token_shards_hand_computed_and_invariance(ray_session):
    """shard_id = exclusive running token total // budget, in doc_id
    order — incl. an over-budget doc (keeps its shard alone, ids skip),
    non-dense doc_ids, and partitioning/bucket_width invariance."""
    import ray.data as rd

    from semanticizer_ray.stages.packing import token_shards

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([2, 5, 9, 14, 21], dtype="int64"),
            "text": ["a b c", "d e", "w " * 12, "x", "y z"],
        }
    )
    # tokens: 3, 2, 12, 1, 2 → before: 0, 3, 5, 17, 18 → //4: 0, 0, 1, 4, 4
    want = [0, 0, 1, 4, 4]
    out = (
        token_shards(rd.from_pandas(docs).repartition(3), budget=4, bucket_width=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_tokens"]) == [3, 2, 12, 1, 2]
    assert list(out["shard_id"]) == want

    # invariant to partitioning and bucket granularity
    out2 = (
        token_shards(rd.from_pandas(docs).repartition(1), budget=4, bucket_width=1000)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    with pytest.raises(ValueError, match="budget"):
        token_shards(rd.from_pandas(docs), budget=0)


def test_stratified_sample_rates_and_determinism(ray_session):
    """Per-group keep decisions are deterministic, respect the per-group
    rate direction (rate 0 drops all, rate 1 keeps all), unknown groups
    take the default, and a rerun is identical."""
    import ray.data as rd

    from semanticizer_ray.stages.filters import stratified_sample

    df = pd.DataFrame(
        {
            "doc_id": pd.Series(range(1000), dtype="int64"),
            "lang": ["en", "de", "xx", "fr"] * 250,
        }
    )
    rates = {"en": 1.0, "de": 0.0, "fr": 0.5}
    out = (
        stratified_sample(rd.from_pandas(df).repartition(4), rates, default_rate=0.2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    by = out.groupby("lang").size()
    assert by.get("en", 0) == 250  # rate 1.0 keeps all
    assert by.get("de", 0) == 0  # rate 0.0 drops all
    assert 70 <= by.get("fr", 0) <= 180  # ~0.5 of 250
    assert 20 <= by.get("xx", 0) <= 80  # default ~0.2 of 250
    out2 = (
        stratified_sample(rd.from_pandas(df).repartition(9), rates, default_rate=0.2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out2)
    with pytest.raises(ValueError, match="rate"):
        stratified_sample(rd.from_pandas(df), {"en": 1.5})


def test_contamination_check_hand_computed(ray_session):
    """Docs overlapping the blocklist by ≥1 word n-gram are flagged with
    the DISTINCT matching-gram count; clean docs are absent; punctuation
    and case fold into the shared tokenizer."""
    import ray.data as rd

    from semanticizer_ray.stages.retrieval import contamination_check, word_ngrams

    bench_text = "the quick brown fox jumps over the lazy dog"
    bl = set(word_ngrams(bench_text, 3))
    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([10, 11, 12], dtype="int64"),
            "text": [
                "The QUICK, brown fox! ran",  # hits "the quick brown" + "quick brown fox"
                "a clean document entirely",
                "over the lazy dog again over the lazy dog",  # 2 distinct hits, repeated
            ],
        }
    )
    out = (
        contamination_check(rd.from_pandas(docs).repartition(2), bl, n=3)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["doc_id"]) == [10, 12]
    assert list(out["n_hits"]) == [2, 2]
    assert word_ngrams("a b", 3) == []
    with pytest.raises(ValueError, match="n must"):
        contamination_check(rd.from_pandas(docs), bl, n=0)


def test_quantize_embeddings_roundtrip_and_edges(ray_session):
    """int8 codes reconstruct within scale/2 per element; zero vectors
    get scale 0 / all-zero codes; codes stay in [-127, 127] with the max
    element mapping to exactly ±127."""
    import ray.data as rd

    from semanticizer_ray.stages.quantize import quantize_embeddings

    rng = np.random.default_rng(23)
    V = rng.standard_normal((50, 16))
    V[7] = 0.0  # zero vector
    V[9, 3] = -V[9].__abs__().max() * 1.5  # negative max magnitude
    df = pd.DataFrame(
        {"vec_id": np.arange(50, dtype=np.int64), "embedding": list(map(list, V))}
    )
    out = (
        quantize_embeddings(rd.from_pandas(df).repartition(3))
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    assert out["code_min"].min() >= -127 and out["code_max"].max() <= 127
    z = out[out.vec_id == 7].iloc[0]
    assert z["scale"] == 0 and z["code_sum"] == 0 and z["code_max"] == 0
    n9 = out[out.vec_id == 9].iloc[0]
    assert n9["code_min"] == -127  # the max-magnitude element, negative
    for _, row in out.iterrows():
        codes = np.asarray(row["codes"], dtype=np.float64)
        recon = codes * row["scale"]
        err = np.abs(recon - V[int(row["vec_id"])])
        bound = (row["scale"] / 2 if row["scale"] > 0 else 0) + 1e-12
        assert err.max() <= bound, (row["vec_id"], err.max(), bound)


def test_repetition_stats_hand_computed(ray_session):
    """Hand-counted duplicate 2-gram fractions, incl. a no-token doc and
    a doc shorter than n (both → all-zero row, frac 0)."""
    import ray.data as rd

    from semanticizer_ray.stages.textstats import repetition_stats

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([0, 1, 2, 3], dtype="int64"),
            "text": [
                "a b a b a",  # grams: ab,ba,ab,ba → total 4, distinct 2, max 2
                "x y z",  # xy,yz → total 2, distinct 2, max 1
                "solo",  # < 2 tokens → zeros
                "!!!",  # no tokens → zeros
            ],
        }
    )
    out = (
        repetition_stats(rd.from_pandas(docs).repartition(2), n=2)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_grams"]) == [4, 2, 0, 0]
    assert list(out["n_distinct"]) == [2, 2, 0, 0]
    assert list(out["max_gram_count"]) == [2, 1, 0, 0]
    np.testing.assert_allclose(out["dup_frac"], [0.5, 0.0, 0.0, 0.0])
    with pytest.raises(ValueError, match="n must"):
        repetition_stats(rd.from_pandas(docs), n=0)


def test_knn_quantized_recall_gate_and_fresh_corpus(ray_session):
    """The int8 storage-path scan: gate hash-matches its SQL oracle and
    recall is 1.0 on the fixed fixture; on a fresh clustered corpus the
    quantized scan's top-k matches the float scan (int8 error ≪ typical
    neighbor gaps)."""
    import duckdb

    from semanticizer_ray.pipelines.catalog import (
        KNN_QUANTIZED_RECALL_SQL,
        knn_quantized_recall,
    )
    from semanticizer_ray.stages.similarity import knn_brute, knn_quantized

    got = knn_quantized_recall("unused")
    want = duckdb.sql(KNN_QUANTIZED_RECALL_SQL).df()
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["recall"].iloc[0] == 1.0

    import ray.data as rd

    rng = np.random.default_rng(29)
    centers = rng.standard_normal((6, 16)) * 4
    V = np.vstack([c + rng.standard_normal((120, 16)) for c in centers])
    df = pd.DataFrame(
        {"vec_id": np.arange(len(V), dtype=np.int64), "embedding": list(map(list, V))}
    )
    ds = rd.from_pandas(df).repartition(4)
    Q = V[rng.choice(len(V), 4, replace=False)]
    b = knn_brute(ds, Q, k=5).to_pandas()
    q = knn_quantized(ds, Q, k=5).to_pandas()
    bset = set(zip(b.query_idx, b.vec_id))
    qset = set(zip(q.query_idx, q.vec_id))
    assert len(bset & qset) / len(bset) >= 0.9


def test_pii_stats_hand_computed_and_re2_parity(ray_session):
    """Hand-counted PII hits plus Python-re ↔ DuckDB-RE2 parity over
    edge strings (the oracle depends on the engines agreeing)."""
    import duckdb
    import ray.data as rd

    from semanticizer_ray.stages.filters import (
        PII_EMAIL,
        PII_PHONE,
        PII_URL,
        pii_stats,
    )

    docs = pd.DataFrame(
        {
            "doc_id": pd.Series([0, 1, 2, 3], dtype="int64"),
            "text": [
                "mail a.b%c@ex-ample.co.uk, see https://x.io/p?q=1",
                "call +1 (555) 123-4567 or 0044-555-666777",
                "bad@.com edge@x. no matches http//nope",
                None,
            ],
        }
    )
    out = (
        pii_stats(rd.from_pandas(docs).repartition(2))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert list(out["n_emails"]) == [1, 0, 0, 0]
    assert list(out["n_urls"]) == [1, 0, 0, 0]
    assert list(out["n_phones"]) == [0, 2, 0, 0]

    con = duckdb.connect()
    for t in docs["text"].dropna():
        import re as _re

        py = [
            len(_re.findall(p, t)) for p in (PII_EMAIL, PII_URL, PII_PHONE)
        ]
        sql = con.execute(
            "SELECT len(regexp_extract_all(?, ?)), len(regexp_extract_all(?, ?)),"
            " len(regexp_extract_all(?, ?))",
            [t, PII_EMAIL, t, PII_URL, t, PII_PHONE],
        ).fetchone()
        assert py == list(sql), t
