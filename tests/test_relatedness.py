"""F3 context features: Milne–Witten relatedness artifact + ctx kernel
(SURVEY.md F3; the reference's ContextFeaturesProcessor recast as an
offline co-occurrence artifact + pair feature)."""

import math

import pandas as pd

import numpy as np
import pytest

from semanticizer_ray.config import EngineConfig
from semanticizer_ray.state.anchor_dict import make_anchor_dict_table
from semanticizer_ray.state.relatedness import RelatednessState, build_relatedness
from semanticizer_ray.stages.scoring import (
    MAX_SIDE_ANCHORS,
    _anchor_matrices,
    _ctx_relatedness_batch,
    _ctx_relatedness_scalar,
)


def _corpus_rows():
    """8 linked docs; sense 1 links in docs 1-4, sense 2 in docs 2-5 →
    |A|=4, |B|=4, |A∩B|=3, N=8: mw = 1 - (log4 - log3) / (log8 - log4).
    Every doc links a distinct one-off sense so all 8 count toward N
    (N = docs with ≥1 link); the one-off pairs die at min_cooc=2."""
    rows = []
    for d in range(8):
        rows.append(
            {"doc_id": d, "label": f"one_off_{d}", "sense_id": 100 + d,
             "from_title": False, "from_redirect": False}
        )
        rows.append(
            {"doc_id": d, "label": "plaintext", "sense_id": -1,
             "from_title": False, "from_redirect": False}
        )
    for d in (1, 2, 3, 4):
        rows.append(
            {"doc_id": d, "label": "alpha", "sense_id": 1,
             "from_title": False, "from_redirect": False}
        )
    for d in (2, 3, 4, 5):
        rows.append(
            {"doc_id": d, "label": "beta", "sense_id": 2,
             "from_title": False, "from_redirect": False}
        )
    return rows


def _dict_table():
    return make_anchor_dict_table(
        [
            {
                "label": "alpha", "link_occ": 4, "link_doc": 4,
                "text_occ": 4, "text_doc": 4,
                "senses": [{"sense_id": 1, "occ": 4, "doc": 4,
                            "from_title": False, "from_redirect": False}],
            },
            {
                "label": "beta", "link_occ": 4, "link_doc": 4,
                "text_occ": 4, "text_doc": 4,
                "senses": [{"sense_id": 2, "occ": 4, "doc": 4,
                            "from_title": False, "from_redirect": False}],
            },
            {
                "label": "gamma", "link_occ": 1, "link_doc": 1,
                "text_occ": 1, "text_doc": 1,
                "senses": [{"sense_id": 99, "occ": 1, "doc": 1,
                            "from_title": False, "from_redirect": False}],
            },
        ]
    )


EXPECTED_MW = 1.0 - (math.log(4) - math.log(3)) / (math.log(8) - math.log(4))


@pytest.fixture(scope="module")
def rel_state(ray_session):
    import ray.data as rd

    corpus = rd.from_items(_corpus_rows())
    rel = build_relatedness(corpus, EngineConfig(), min_cooc=2)
    assert len(rel) == 1
    assert rel.iloc[0]["sense_a"] == 1 and rel.iloc[0]["sense_b"] == 2
    assert rel.iloc[0]["cooc"] == 3
    assert rel.iloc[0]["rel"] == pytest.approx(EXPECTED_MW, abs=1e-12)
    return RelatednessState.from_tables(_dict_table(), rel)


def test_mw_golden(rel_state):
    """The artifact + state reproduce the hand-computed MW value."""
    from semanticizer_ray.stages.scoring import _label_hash64

    sa = rel_state.sense_of_hash(_label_hash64("alpha"))
    sb = rel_state.sense_of_hash(_label_hash64("beta"))
    sg = rel_state.sense_of_hash(_label_hash64("gamma"))
    assert sa >= 0 and sb >= 0 and sg >= 0
    assert rel_state.rel_of(sa, sb) == pytest.approx(EXPECTED_MW, abs=1e-12)
    assert rel_state.rel_of(sa, sa) == 1.0
    assert rel_state.rel_of(sa, sg) == 0.0
    assert rel_state.rel_of(-1, sb) == 0.0


def test_ctx_feature_values(rel_state):
    # related-but-different labels → the MW value
    assert _ctx_relatedness_scalar(
        ["alpha"], [1.0], ["beta"], [1.0], rel_state
    ) == pytest.approx(EXPECTED_MW, abs=1e-12)
    # identical label → 1.0 even without the artifact
    assert _ctx_relatedness_scalar(["alpha"], [1.0], ["alpha"], [1.0], None) == 1.0
    # unrelated known labels → 0
    assert _ctx_relatedness_scalar(["alpha"], [1.0], ["gamma"], [1.0], rel_state) == 0.0
    # weighted mix: (w_rel · mw + w_same · 1) / (total weight products)
    got = _ctx_relatedness_scalar(
        ["alpha", "beta"], [1.0, 2.0], ["beta"], [1.0], rel_state
    )
    want = (1.0 * EXPECTED_MW + 2.0 * 1.0) / 3.0
    assert got == pytest.approx(want, abs=1e-12)
    # empty side → 0
    assert _ctx_relatedness_scalar([], [], ["beta"], [1.0], rel_state) == 0.0


def test_ctx_batch_matches_scalar(rel_state):
    """Vectorized kernel == scalar twin over mixed random anchor sets."""
    rng = np.random.default_rng(7)
    vocab = ["alpha", "beta", "gamma", "unknown1", "unknown2"]
    cases = []
    for _ in range(60):
        ka = rng.integers(0, 4)
        kb = rng.integers(0, 4)
        la = list(rng.choice(vocab, size=ka, replace=False)) if ka else []
        lb = list(rng.choice(vocab, size=kb, replace=False)) if kb else []
        wa = [float(w) for w in rng.uniform(0.1, 2.0, size=ka)]
        wb = [float(w) for w in rng.uniform(0.1, 2.0, size=kb)]
        cases.append((la, wa, lb, wb))
    ah_a, aw_a = _anchor_matrices([c[0] for c in cases], [c[1] for c in cases])
    ah_b, aw_b = _anchor_matrices([c[2] for c in cases], [c[3] for c in cases])
    for pack in (rel_state.pack(), None):
        got = _ctx_relatedness_batch(ah_a, aw_a, ah_b, aw_b, pack)
        state = rel_state if pack is not None else None
        for i, (la, wa, lb, wb) in enumerate(cases):
            want = _ctx_relatedness_scalar(la, wa, lb, wb, state)
            assert got[i] == pytest.approx(want, abs=1e-12), (i, la, lb)


def test_sense_degrees_vs_duckdb(ray_session, fixture_dir):
    """F2 degree features match a DuckDB oracle on the fixture corpus."""
    import duckdb
    import ray.data as rd

    from semanticizer_ray.state.relatedness import build_sense_degrees

    corpus_path = fixture_dir["link_corpus"]
    got = build_sense_degrees(rd.read_parquet(corpus_path), EngineConfig())
    want = duckdb.sql(
        f"""
        SELECT sense_id,
               CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS indegree,
               CAST(COUNT(*) AS BIGINT) AS link_occ,
               LN(COUNT(DISTINCT doc_id) + 1) AS generality
        FROM read_parquet('{corpus_path}')
        WHERE sense_id >= 0
        GROUP BY sense_id ORDER BY sense_id
        """
    ).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), want.reset_index(drop=True), check_dtype=False
    )


def test_ctx_in_edges(ray_session, rel_state):
    """The feature flows through score_pairs into the edge table."""
    import pyarrow as pa
    import ray.data as rd

    from semanticizer_ray.functions.minhash import hash_params, minhash_signature
    from semanticizer_ray.stages.scoring import score_pairs

    cfg = EngineConfig()
    a, b = hash_params(cfg.blocking.num_hashes, cfg.seed)

    def prof_row(cid, text, labels, weights):
        sig = minhash_signature(text, a, b, cfg.blocking.shingle_k).tobytes()
        return {
            "conv_id": cid, "sig": sig, "text_head": text,
            "n_chars": len(text), "anchor_labels": labels,
            "anchor_weights": weights,
        }

    profiles = rd.from_items(
        [
            prof_row("c1", "the alpha conversation text", ["alpha"], [1.0]),
            prof_row("c2", "a beta conversation text", ["beta"], [1.0]),
        ]
    )
    pairs = rd.from_arrow(
        pa.table(
            {
                "conv_a": ["c1"], "conv_b": ["c2"],
                "block_id": ["t"], "block_overflow": [0],
            }
        )
    )
    edges = score_pairs(pairs, profiles, cfg, relatedness=rel_state).to_pandas()
    assert edges.iloc[0]["ctx_relatedness"] == pytest.approx(EXPECTED_MW, abs=1e-9)
