"""F6 golden linking decisions: commonness ranking, sense filtering,
normalization edge cases, overlapping n-grams, unique-per-sense (SURVEY §5.2)."""

import dataclasses

import pyarrow as pa
import pytest

from semanticizer_ray.config import AnchorConfig, EngineConfig
from semanticizer_ray.stages.mentions import AnchorMatcher
from semanticizer_ray.state.anchor_dict import make_anchor_dict_table

# hand-built mini dictionary (FIXTURES.md F6)
DICT_ROWS = [
    {
        "label": "acme",
        "link_occ": 100, "link_doc": 75, "text_occ": 150, "text_doc": 100,
        "senses": [
            {"sense_id": 1, "occ": 75, "doc": 60, "from_title": False, "from_redirect": False},
            {"sense_id": 2, "occ": 25, "doc": 15, "from_title": False, "from_redirect": False},
        ],
    },
    {
        "label": "acme corp",
        "link_occ": 40, "link_doc": 40, "text_occ": 50, "text_doc": 45,
        "senses": [
            {"sense_id": 1, "occ": 40, "doc": 40, "from_title": True, "from_redirect": False},
        ],
    },
    {
        "label": "Émile",
        "link_occ": 10, "link_doc": 10, "text_occ": 20, "text_doc": 20,
        "senses": [
            {"sense_id": 3, "occ": 10, "doc": 10, "from_title": True, "from_redirect": False},
        ],
    },
    {
        "label": "big-data",
        "link_occ": 5, "link_doc": 5, "text_occ": 100, "text_doc": 100,
        "senses": [
            {"sense_id": 4, "occ": 5, "doc": 5, "from_title": False, "from_redirect": True},
        ],
    },
]


def run_matcher(texts: list[str], cfg: EngineConfig) -> list[dict]:
    table = make_anchor_dict_table([dict(r, senses=list(r["senses"])) for r in DICT_ROWS])
    m = AnchorMatcher(table, cfg)
    batch = pa.table(
        {
            "conv_id": pa.array([f"c{i}" for i in range(len(texts))]),
            "turn_idx": pa.array([0] * len(texts), pa.int32()),
            "text": pa.array(texts, pa.string()),
        }
    )
    return m(batch).to_pylist()


def test_commonness_ranking():
    out = run_matcher(["we met acme today"], EngineConfig())
    assert len(out) == 2  # two senses of "acme"
    by_sense = {o["sense_id"]: o for o in out}
    assert by_sense[1]["prior_probability"] == pytest.approx(0.75, abs=1e-12)
    assert by_sense[2]["prior_probability"] == pytest.approx(0.25, abs=1e-12)
    assert by_sense[1]["sense_probability"] == pytest.approx(60 / 75, abs=1e-12)
    assert by_sense[2]["sense_probability"] == pytest.approx(15 / 75, abs=1e-12)
    assert by_sense[1]["link_probability"] == pytest.approx(0.75, abs=1e-12)
    # span points into the original text
    o = by_sense[1]
    assert "we met acme today"[o["start"] : o["end"]] == "acme"


def test_sense_probability_threshold():
    cfg = EngineConfig(anchor=AnchorConfig(min_sense_probability=0.3))
    out = run_matcher(["we met acme today"], cfg)
    assert [o["sense_id"] for o in out] == [1]  # sense 2 at 0.2 filtered


def test_link_probability_threshold():
    cfg = EngineConfig(anchor=AnchorConfig(min_link_probability=0.1))
    out = run_matcher(["big-data rules"], cfg)
    assert out == []  # keyphraseness 5/100 = 0.05 < 0.1
    out2 = run_matcher(["big-data rules"], EngineConfig())
    assert len(out2) == 1 and out2[0]["sense_id"] == 4


def test_overlapping_ngrams_all_emitted():
    out = run_matcher(["ACME Corp announced"], EngineConfig())
    labels = sorted(o["label"] for o in out)
    # unigram "acme" (2 senses) + bigram "acme corp" (1 sense)
    assert labels == ["acme", "acme", "acme corp"]
    bigram = [o for o in out if o["label"] == "acme corp"][0]
    assert "ACME Corp announced"[bigram["start"] : bigram["end"]] == "ACME Corp"


def test_normalization_accents_and_dashes():
    out = run_matcher(["talked to Emile about big data"], EngineConfig())
    labels = {o["label"] for o in out}
    assert labels == {"Émile", "big-data"}


def test_unique_per_sense():
    cfg = EngineConfig(anchor=AnchorConfig(unique_per_sense=True))
    out = run_matcher(["acme bought acme corp"], cfg)
    # sense 1 appears via "acme" (x2) and "acme corp": keep the single best
    # (highest sense_probability = acme corp at 1.0); sense 2 once
    sids = sorted(o["sense_id"] for o in out)
    assert sids == [1, 2]
    s1 = [o for o in out if o["sense_id"] == 1][0]
    assert s1["label"] == "acme corp"
    assert s1["sense_probability"] == pytest.approx(1.0, abs=1e-12)


def test_empty_and_no_match():
    out = run_matcher(["", "nothing to see here"], EngineConfig())
    assert out == []


def test_candidate_entries_batch_matches_scalar_fold():
    """The vectorized batch anchor-count path must reproduce the scalar
    count_labels_normtext fold exactly: same counts, same first-seen
    lp/link_doc, same first-seen list order, per conversation."""
    import numpy as np

    from semanticizer_ray.functions.normalize import normalize_text
    from semanticizer_ray.stages.signatures import _conv_anchor_lists

    table = make_anchor_dict_table([dict(r, senses=list(r["senses"])) for r in DICT_ROWS])
    cfg = EngineConfig()
    m = AnchorMatcher(table, cfg)
    texts = [
        "Acme Corp ships big-data",          # multiword + unigram overlap
        "acme acme corp acme",               # repeats; count aggregation
        "Émile joined ACME",            # unicode + case
        "",                                  # empty turn
        "nothing matches here at all",
        "big-data big-data acme corp",
    ]
    norm = [normalize_text(t, cfg.normalize) for t in texts]
    # two turns per conv → exercises cross-turn merge + first-seen keep
    conv_sorted = np.asarray(["a", "a", "b", "b", "c", "c"], dtype=object)
    got = _conv_anchor_lists(m, norm, conv_sorted)
    exp = []
    i = 0
    while i < len(norm):
        ac: dict = {}
        for t in norm[i : i + 2]:
            for lab, (c, lp, ld) in m.count_labels_normtext(t).items():
                if lab in ac:
                    c0, lp0, ld0 = ac[lab]
                    ac[lab] = (c0 + c, lp0, ld0)
                else:
                    ac[lab] = (c, lp, ld)
        exp.append([(lab, c, lp, ld) for lab, (c, lp, ld) in ac.items()])
        i += 2
    assert got == exp
