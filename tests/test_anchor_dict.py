"""T4 build_anchor_dict vs a DuckDB oracle on the same corpus (SURVEY.md §5.5)."""

import duckdb
import pyarrow as pa
import pytest

from semanticizer_ray.config import DEFAULT_CONFIG
from semanticizer_ray.gen import gen_entities, gen_link_corpus
from semanticizer_ray.state.anchor_dict import AnchorDict, build_anchor_dict


@pytest.fixture(scope="module")
def corpus():
    ents = gen_entities(40, seed=42)
    return gen_link_corpus(ents, n_docs=150, seed=42)


def test_build_matches_duckdb(ray_session, corpus):
    import ray.data as rd

    ds = rd.from_arrow(corpus)
    out = build_anchor_dict(ds, DEFAULT_CONFIG)
    got = out.to_pandas().set_index("label").sort_index()

    con = duckdb.connect()
    con.register("corpus", corpus)
    want = con.sql(
        """
        SELECT label,
               sum(CASE WHEN sense_id >= 0 THEN 1 ELSE 0 END) AS link_occ,
               count(DISTINCT CASE WHEN sense_id >= 0 THEN doc_id END) AS link_doc,
               count(*) AS text_occ,
               count(DISTINCT doc_id) AS text_doc
        FROM corpus GROUP BY label ORDER BY label
        """
    ).df().set_index("label")

    assert list(got.index) == list(want.index)
    for col in ["link_occ", "link_doc", "text_occ", "text_doc"]:
        assert (got[col].astype(int) == want[col].astype(int)).all(), col

    # per-sense stats for one ambiguous label
    amb = con.sql(
        """
        SELECT label, sense_id, count(*) AS occ, count(DISTINCT doc_id) AS doc
        FROM corpus WHERE sense_id >= 0
        GROUP BY label, sense_id
        ORDER BY label, sense_id
        """
    ).df()
    sense_map = {}
    for lab, senses in zip(got.index, got["senses"]):
        sense_map[lab] = {s["sense_id"]: s for s in (senses if senses is not None else [])}
    for _, r in amb.iterrows():
        s = sense_map[r["label"]][int(r["sense_id"])]
        assert s["occ"] == int(r["occ"])
        assert s["doc"] == int(r["doc"])


def test_anchor_dict_lookup(ray_session, corpus):
    import ray.data as rd

    out = build_anchor_dict(rd.from_arrow(corpus), DEFAULT_CONFIG)
    table = pa.Table.from_pandas(out.to_pandas())
    d = AnchorDict(table)
    assert len(d) > 0
    # every norm maps back to entries whose senses are sorted by sense_id
    some = next(iter(d.by_norm.values()))
    assert all("link_probability" in e for e in some)
    # uppercase variant labels normalize onto the same key as the title
    ents_with_upper = [e["label"] for es in d.by_norm.values() for e in es if e["label"].isupper()]
    if ents_with_upper:
        lab = ents_with_upper[0]
        from semanticizer_ray.functions.normalize import normalize_text

        assert any(e["label"] == lab for e in d.lookup(normalize_text(lab)))
