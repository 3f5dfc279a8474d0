"""A4/F5 analog: offline weight fitting from labeled pairs (FIXTURES.md F5)."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import pytest

from semanticizer_ray.stages.scoring import FEATURE_NAMES, fit_weights


@pytest.fixture(scope="module")
def labeled(ray_session, fixture_dir):
    """Labeled pairs = scored candidate pairs (sharing a blocking key) ×
    ground truth — the F1 population of the north_rule."""
    import pyarrow as pa
    import ray.data as rd

    from semanticizer_ray.config import EngineConfig
    from semanticizer_ray.pipelines.entity_resolution import resolve_entities
    from semanticizer_ray.state.anchor_dict import build_anchor_dict

    cfg = EngineConfig()
    dict_table = pa.Table.from_pandas(
        build_anchor_dict(rd.read_parquet(fixture_dir["link_corpus"]), cfg).to_pandas()
    )
    res = resolve_entities(
        rd.read_parquet(fixture_dir["transcripts"]), cfg, anchor_dict_source=dict_table
    )
    edges = res.edges.to_pandas()
    truth = pq.read_table(fixture_dir["clusters_truth"]).to_pandas()
    tmap = dict(zip(truth["conv_id"], truth["cluster_id"]))
    edges["is_match_true"] = [
        tmap[a] == tmap[b] for a, b in zip(edges["conv_a"], edges["conv_b"])
    ]
    return cfg, edges


def test_fit_weights_deterministic_and_effective(labeled):
    cfg, edges = labeled
    X = edges[FEATURE_NAMES]
    y = edges["is_match_true"].to_numpy()
    w1, b1, t1 = fit_weights(X, y)
    w2, b2, t2 = fit_weights(X, y)
    assert w1 == w2 and b1 == b2 and t1 == t2  # deterministic

    # fitted model separates the training pairs at least as well as the
    # default config threshold does
    wsum = sum(w1.values()) or 1.0
    scores = X.to_numpy() @ (np.array([w1[k] for k in FEATURE_NAMES]) / wsum) + b1
    pred = scores >= t1

    def f1(p, t):
        tp = (p & t).sum()
        fp = (p & ~t).sum()
        fn = (~p & t).sum()
        return 2 * tp / (2 * tp + fp + fn) if tp else 0.0

    default_pred = edges["is_match"].to_numpy()
    assert f1(pred, y) >= f1(default_pred, y) - 1e-9
    assert f1(pred, y) > 0.95
