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
