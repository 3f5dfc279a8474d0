"""Generator determinism + planted-structure sanity (FIXTURES.md F1–F3)."""

import numpy as np

from semanticizer_ray.gen import gen_entities, gen_link_corpus, gen_transcripts


def test_entities_deterministic():
    e1 = gen_entities(50, seed=42)
    e2 = gen_entities(50, seed=42)
    assert e1.equals(e2)
    assert e1.num_rows == 50
    assert len(set(e1["title"].to_pylist())) == 50


def test_link_corpus_shape():
    ents = gen_entities(50, seed=42)
    c1 = gen_link_corpus(ents, n_docs=100, seed=42)
    c2 = gen_link_corpus(ents, n_docs=100, seed=42)
    assert c1.equals(c2)
    sid = np.asarray(c1["sense_id"])
    assert (sid == -1).any(), "needs plain-text occurrences"
    assert (sid >= 0).any()
    # ambiguity planted: some label maps to >=2 senses
    import collections

    senses = collections.defaultdict(set)
    for lab, s in zip(c1["label"].to_pylist(), sid):
        if s >= 0:
            senses[lab].add(int(s))
    assert any(len(v) >= 2 for v in senses.values())


def test_transcripts_schema_and_truth():
    t1, g1 = gen_transcripts(100, seed=42)
    t2, g2 = gen_transcripts(100, seed=42)
    assert t1.equals(t2) and g1.equals(g2)
    assert t1.schema.names == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(t1.schema.field("turn_idx").type) == "int32"
    assert str(t1.schema.field("ts").type) == "timestamp[us]"
    assert g1.num_rows == 100
    # clusters: canonical id is min member
    import collections

    members = collections.defaultdict(list)
    for c, cl in zip(g1["conv_id"].to_pylist(), g1["cluster_id"].to_pylist()):
        members[cl].append(c)
    for cl, ms in members.items():
        assert cl == min(ms)
    # some clusters have >1 member (duplicates planted)
    assert any(len(ms) > 1 for ms in members.values())
    # turn_idx contiguous per conv
    conv = np.asarray(t1["conv_id"])
    tidx = np.asarray(t1["turn_idx"])
    for cid in np.unique(conv)[:10]:
        ti = np.sort(tidx[conv == cid])
        assert (ti == np.arange(len(ti))).all()


def test_duplicates_are_similar():
    """Planted duplicates must be near-dups (high char-5-gram Jaccard)."""
    from semanticizer_ray.functions.minhash import shingle_hashes

    t, g = gen_transcripts(200, seed=42)
    conv = np.asarray(t["conv_id"]).astype(str)
    texts = {}
    for cid in np.unique(conv):
        mask = conv == cid
        texts[cid] = " ".join(np.asarray(t["text"])[mask].astype(str))
    import collections

    members = collections.defaultdict(list)
    for c, cl in zip(g["conv_id"].to_pylist(), g["cluster_id"].to_pylist()):
        members[cl].append(c)
    dup_jac, nondup_jac = [], []
    cluster_list = [ms for ms in members.values() if len(ms) > 1]
    for ms in cluster_list[:20]:
        sh = [set(shingle_hashes(texts[c], 5)) for c in ms]
        for i in range(1, len(sh)):
            dup_jac.append(len(sh[0] & sh[i]) / len(sh[0] | sh[i]))
    singles = [ms[0] for ms in members.values() if len(ms) == 1][:20]
    for i in range(1, len(singles)):
        s0 = set(shingle_hashes(texts[singles[0]], 5))
        si = set(shingle_hashes(texts[singles[i]], 5))
        nondup_jac.append(len(s0 & si) / len(s0 | si))
    # short conversations perturb proportionally more → assert distribution,
    # not min; hard tail is caught by anchor-key blocking, not LSH
    assert float(np.median(dup_jac)) > 0.7, f"dup median: {np.median(dup_jac)}"
    assert min(dup_jac) > 0.3, f"duplicates too dissimilar: {min(dup_jac)}"
    assert max(nondup_jac) < 0.4, f"non-duplicates too similar: {max(nondup_jac)}"


def test_translations_and_pageviews_side_tables():
    """J5/F4 side tables: deterministic, correctly shaped, joinable."""
    from semanticizer_ray.gen import gen_pageviews, gen_translations

    ents = gen_entities(50, seed=42)
    t1, t2 = gen_translations(ents, 42), gen_translations(ents, 42)
    assert t1.equals(t2)
    assert t1.schema.names == ["sense_id", "lang", "trans_title"]
    sid = np.asarray(t1["sense_id"])
    assert sid.min() >= 0 and sid.max() < 50
    langs = set(t1["lang"].to_pylist())
    assert langs <= {"de", "es", "fr", "it", "nl"} and len(langs) == 5
    # at most one row per (sense, lang)
    pairs = list(zip(sid.tolist(), t1["lang"].to_pylist()))
    assert len(pairs) == len(set(pairs))
    # translated title carries the lang marker prefix
    assert all(
        tt.startswith(f"{lg}:") for lg, tt in zip(t1["lang"].to_pylist(),
                                                  t1["trans_title"].to_pylist())
    )

    p1, p2 = gen_pageviews(ents, 42), gen_pageviews(ents, 42)
    assert p1.equals(p2)
    assert p1.schema.names == ["sense_id", "day", "views"]
    assert p1.num_rows == 50 * 14
    day = np.asarray(p1["day"])
    assert day.min() == 0 and day.max() == 13
    views = np.asarray(p1["views"])
    assert (views >= 0).all() and views.sum() > 0
    # Zipfian: head entity out-views the tail entity
    v = views.reshape(50, 14).sum(axis=1)
    assert v[0] > v[-1]


def test_side_table_regeneration_uses_recorded_seed(tmp_path):
    """write_fixture_set records its seed in fixture_manifest.json;
    catalog._side_table regenerates a deleted side table with THAT seed,
    not the historical default 42."""
    import json
    import os

    import pyarrow.parquet as pq

    from semanticizer_ray.gen import gen_translations, write_fixture_set
    from semanticizer_ray.pipelines.catalog import _side_table

    out = str(tmp_path / "fx7")
    write_fixture_set(out, n_convs=60, seed=7)
    with open(os.path.join(out, "fixture_manifest.json")) as f:
        assert json.load(f)["seed"] == 7
    expect = gen_translations(pq.read_table(os.path.join(out, "entities.parquet")), 7)
    os.remove(os.path.join(out, "translations.parquet"))
    regen = pq.read_table(_side_table(out, "translations"))
    assert regen.equals(expect)
