"""End-to-end entity resolution vs brute-force oracle (SURVEY.md §5.3).

"Reference clusters" = driver-side brute-force scoring of the labeled pairs
(pairs sharing ≥1 blocking key — the north_rule F1 population) with the SAME
feature functions + union-find. The pipeline must reproduce them with
pairwise F1 ≥ 0.99, preserve per-turn text equality, and emit a partition.
"""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from semanticizer_ray.config import EngineConfig
from semanticizer_ray.functions.minhash import estimate_jaccard
from semanticizer_ray.functions.strings import jaro_winkler, levenshtein_ratio
from semanticizer_ray.stages.clustering import unionfind_reference
from semanticizer_ray.stages.scoring import JW_CAP, LEV_CAP, _anchor_overlap
from semanticizer_ray.pipelines.entity_resolution import resolve_entities


@pytest.fixture(scope="module")
def er_run(ray_session, fixture_dir):
    """Full pipeline WITH the F3 relatedness artifact — the oracle tests
    below recompute features with the same state, so parity covers the
    context feature end-to-end."""
    import ray.data as rd

    from semanticizer_ray.config import DEFAULT_CONFIG
    from semanticizer_ray.state.anchor_dict import build_anchor_dict
    from semanticizer_ray.state.relatedness import RelatednessState, build_relatedness
    import pyarrow as pa

    cfg = EngineConfig()
    transcripts = rd.read_parquet(fixture_dir["transcripts"])
    corpus = rd.read_parquet(fixture_dir["link_corpus"])
    dict_table = pa.Table.from_pandas(build_anchor_dict(corpus, cfg).to_pandas())
    rel_state = RelatednessState.from_tables(
        dict_table, build_relatedness(corpus, cfg)
    )
    result = resolve_entities(
        transcripts, cfg, anchor_dict_source=dict_table, relatedness=rel_state
    )
    return cfg, result, rel_state


def test_empty_transcripts(ray_session):
    """A schema'd but 0-row transcripts table flows through every stage
    (empty datasets lose their schema through to_pandas() — regression)."""
    import pyarrow as pa
    import ray.data as rd

    empty = rd.from_arrow(
        pa.table(
            {
                "conv_id": pa.array([], pa.string()),
                "turn_idx": pa.array([], pa.int64()),
                "speaker": pa.array([], pa.string()),
                "text": pa.array([], pa.string()),
                "ts": pa.array([], pa.int64()),
            }
        )
    )
    res = resolve_entities(empty, EngineConfig(), anchor_dict_source=None)
    assert res.clusters.count() == 0


def _score_row(row, cfg: EngineConfig, relatedness=None) -> float:
    from semanticizer_ray.stages.scoring import compute_pair_features

    feats = compute_pair_features(
        row["sig_a"], row["sig_b"],
        row["text_head_a"], row["text_head_b"],
        row["n_chars_a"], row["n_chars_b"],
        row["anchor_labels_a"], row["anchor_weights_a"],
        row["anchor_labels_b"], row["anchor_weights_b"],
        relatedness=relatedness,
    )
    wsum = sum(cfg.scoring.weights.values())
    return sum(w * feats[k] for k, w in cfg.scoring.weights.items()) / wsum + cfg.scoring.bias


def _pairwise_f1(pred_same: pd.Series, true_same: pd.Series) -> float:
    tp = int((pred_same & true_same).sum())
    fp = int((pred_same & ~true_same).sum())
    fn = int((~pred_same & true_same).sum())
    return 2 * tp / (2 * tp + fp + fn) if tp else 0.0


def _attach_side(edges: pd.DataFrame, result) -> pd.DataFrame:
    side = result.profiles.to_pandas()[
        ["conv_id", "sig", "text_head", "n_chars", "anchor_labels", "anchor_weights"]
    ]
    for col in ("anchor_labels", "anchor_weights"):
        side[col] = side[col].apply(
            lambda v: list(v) if isinstance(v, (list, np.ndarray)) else []
        )
    for sfx, key in (("_a", "conv_a"), ("_b", "conv_b")):
        edges = edges.merge(
            side.rename(columns={c: c + sfx for c in side.columns if c != "conv_id"}),
            left_on=key,
            right_on="conv_id",
            how="left",
        ).drop(columns=["conv_id"])
    return edges


def test_f1_vs_bruteforce_oracle(er_run, fixture_dir):
    """Pipeline clusters == oracle clusters on blocked pairs (F1 >= 0.99)."""
    cfg, result, rel_state = er_run
    edges = result.edges.to_pandas()  # scored blocked pairs
    assert len(edges) > 50
    edges = _attach_side(edges, result)

    # oracle: same features, driver-side score + union-find over match edges
    oracle_scores = edges.apply(lambda r: _score_row(r, cfg, rel_state), axis=1)
    assert np.allclose(oracle_scores, edges["score"], atol=1e-9), "scorer parity"
    oracle_match = oracle_scores >= cfg.scoring.threshold
    oracle_edges = list(
        zip(edges.loc[oracle_match, "conv_a"], edges.loc[oracle_match, "conv_b"])
    )
    all_convs = result.profiles.to_pandas()["conv_id"].tolist()
    oracle_clusters = unionfind_reference(oracle_edges, all_convs)

    clusters = result.clusters.to_pandas()
    assert clusters["conv_id"].is_unique and len(clusters) == len(all_convs)
    pred = dict(zip(clusters["conv_id"], clusters["cluster_id"]))

    pred_same = pd.Series(
        [pred[a] == pred[b] for a, b in zip(edges["conv_a"], edges["conv_b"])]
    )
    orac_same = pd.Series(
        [
            oracle_clusters[a] == oracle_clusters[b]
            for a, b in zip(edges["conv_a"], edges["conv_b"])
        ]
    )
    f1 = _pairwise_f1(pred_same, orac_same)
    assert f1 >= 0.99, f"pairwise F1 vs oracle clusters = {f1}"


def test_quality_vs_ground_truth(er_run, fixture_dir):
    """Sanity: predicted clusters track the generator's planted truth."""
    cfg, result, rel_state = er_run
    truth = pq.read_table(fixture_dir["clusters_truth"]).to_pandas()
    tmap = dict(zip(truth["conv_id"], truth["cluster_id"]))
    edges = result.edges.to_pandas()
    clusters = result.clusters.to_pandas()
    pred = dict(zip(clusters["conv_id"], clusters["cluster_id"]))
    pred_same = pd.Series(
        [pred[a] == pred[b] for a, b in zip(edges["conv_a"], edges["conv_b"])]
    )
    true_same = pd.Series(
        [tmap[a] == tmap[b] for a, b in zip(edges["conv_a"], edges["conv_b"])]
    )
    f1 = _pairwise_f1(pred_same, true_same)
    assert f1 >= 0.9, f"pairwise F1 vs planted truth = {f1}"


def test_canonical_cluster_ids(er_run):
    _, result, _rel = er_run
    clusters = result.clusters.to_pandas()
    mins = clusters.groupby("cluster_id")["conv_id"].min()
    assert (mins.index == mins.values).all()  # cluster_id = min member


def test_per_turn_text_equality(ray_session, er_run, fixture_dir):
    """north_rule invariant: pipeline never mutates turn text; outputs
    byte-identical under stable (conv_id, turn_idx) ordering."""
    import ray.data as rd

    cfg, result, rel_state = er_run
    src = (
        pq.read_table(fixture_dir["transcripts"])
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    from semanticizer_ray.stages.normalize_turns import normalize_turns

    out = (
        normalize_turns(rd.read_parquet(fixture_dir["transcripts"]), cfg)
        .to_pandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    assert (out["conv_id"] == src["conv_id"]).all()
    assert (out["turn_idx"] == src["turn_idx"]).all()
    assert (out["text"] == src["text"]).all()


def test_score_symmetry(er_run):
    """Property (SURVEY §5.4): s(a,b) == s(b,a) — features are symmetric."""
    from semanticizer_ray.stages.scoring import compute_pair_features

    cfg, result, rel_state = er_run
    edges = _attach_side(result.edges.to_pandas().head(50), result)
    for _, r in edges.iterrows():
        f_ab = compute_pair_features(
            r["sig_a"], r["sig_b"], r["text_head_a"], r["text_head_b"],
            r["n_chars_a"], r["n_chars_b"],
            r["anchor_labels_a"], r["anchor_weights_a"],
            r["anchor_labels_b"], r["anchor_weights_b"],
            relatedness=rel_state,
        )
        f_ba = compute_pair_features(
            r["sig_b"], r["sig_a"], r["text_head_b"], r["text_head_a"],
            r["n_chars_b"], r["n_chars_a"],
            r["anchor_labels_b"], r["anchor_weights_b"],
            r["anchor_labels_a"], r["anchor_weights_a"],
            relatedness=rel_state,
        )
        for k in f_ab:
            assert abs(f_ab[k] - f_ba[k]) < 1e-12, k


def test_clustering_is_partition(er_run):
    """Property: every conversation in exactly one cluster; cluster ids are
    member ids (canonical min)."""
    _, result, _rel = er_run
    clusters = result.clusters.to_pandas()
    profiles = result.profiles.to_pandas()
    assert set(clusters["conv_id"]) == set(profiles["conv_id"])
    assert clusters["conv_id"].is_unique
    assert set(clusters["cluster_id"]) <= set(clusters["conv_id"])
