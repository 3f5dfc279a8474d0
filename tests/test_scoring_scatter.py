"""Scatter/gather scorer parity: byte-identical to the broadcast path.

The scale path (``score_pairs_scatter`` — no driver materialization, no
whole-dataset broadcast) must produce exactly the edges of the broadcast
path (``score_pairs_fused``) — same kernel, same anchor matrices — and the
``score_pairs`` gate must route by profile count.
"""

import pandas as pd
import pyarrow as pa
import pytest

from semanticizer_ray.config import EngineConfig, ScoringConfig


@pytest.fixture(scope="module")
def scored_inputs(ray_session, fixture_dir):
    import ray.data as rd

    from semanticizer_ray.stages.blocking import anchor_block_keys, lsh_block_keys
    from semanticizer_ray.stages.normalize_turns import normalize_turns
    from semanticizer_ray.stages.pairs import candidate_pairs
    from semanticizer_ray.stages.signatures import conv_profiles
    from semanticizer_ray.state.anchor_dict import build_anchor_dict

    cfg = EngineConfig()
    transcripts = rd.read_parquet(fixture_dir["transcripts"])
    corpus = rd.read_parquet(fixture_dir["link_corpus"])
    dict_table = pa.Table.from_pandas(build_anchor_dict(corpus, cfg).to_pandas())
    profiles = conv_profiles(
        normalize_turns(transcripts, cfg), cfg, dict_source=dict_table
    ).materialize()
    keys = lsh_block_keys(profiles, cfg).union(anchor_block_keys(profiles, cfg))
    pairs = candidate_pairs(keys, cfg).materialize()
    return cfg, profiles, pairs


def _sorted_edges(ds) -> pd.DataFrame:
    df = ds.to_pandas()
    return df.sort_values(["conv_a", "conv_b"]).reset_index(drop=True)


def test_scatter_parity_byte_identical(scored_inputs):
    from semanticizer_ray.stages.scoring import (
        build_side_state,
        score_pairs_fused,
        score_pairs_scatter,
    )

    cfg, profiles, pairs = scored_inputs
    bcast = _sorted_edges(score_pairs_fused(pairs, build_side_state(profiles), cfg))
    scat = _sorted_edges(score_pairs_scatter(pairs, profiles, cfg))
    assert len(bcast) > 50
    pd.testing.assert_frame_equal(bcast, scat, check_exact=True)


def test_gate_routes_by_profile_count(scored_inputs):
    import semanticizer_ray.stages.scoring as S

    cfg, profiles, pairs = scored_inputs
    n = profiles.count()

    called = {}
    orig_fused, orig_scatter = S.score_pairs_fused, S.score_pairs_scatter
    try:
        S.score_pairs_fused = lambda *a, **k: called.setdefault("fused", True) or orig_fused(*a, **k)
        S.score_pairs_scatter = lambda *a, **k: called.setdefault("scatter", True) or orig_scatter(*a, **k)

        lo = EngineConfig(scoring=ScoringConfig(side_broadcast_gate=0))
        S.score_pairs(pairs, profiles, lo)
        assert called == {"scatter": True}

        called.clear()
        hi = EngineConfig(scoring=ScoringConfig(side_broadcast_gate=n))
        S.score_pairs(pairs, profiles, hi)
        assert called == {"fused": True}
    finally:
        S.score_pairs_fused, S.score_pairs_scatter = orig_fused, orig_scatter


def test_fused_raises_on_overwide_pair_id(ray_session, scored_inputs):
    """ADVICE r2: a pair conv_id wider than the side table's fixed-width id
    dtype must raise BEFORE the cast — a truncation that prefix-collides
    with a real id would otherwise silently score the wrong profile. The
    side table pads ids to MAX_ID_BYTES, so the guard fires for ids wider
    than that; anything at or under the pad width is looked up exactly
    (and a ghost id hits the membership check instead — separate test)."""
    import ray.data as rd

    from semanticizer_ray.stages.scoring import (
        MAX_ID_BYTES,
        build_side_state,
        score_pairs_fused,
    )

    cfg, profiles, _ = scored_inputs
    real = profiles.take(1)[0]["conv_id"]
    # prefix-collision shape: real id + suffix pushing it past the pad width
    wide_id = real + "-x" * MAX_ID_BYTES
    assert len(wide_id.encode()) > MAX_ID_BYTES
    wide = rd.from_pandas(
        pd.DataFrame(
            {
                "conv_a": [wide_id],
                "conv_b": [real],
                "block_id": ["b"],
                "block_overflow": [0],
            }
        )
    )
    with pytest.raises(Exception, match="wider than"):
        score_pairs_fused(wide, build_side_state(profiles), cfg).materialize()


def test_scatter_raises_on_missing_profile(ray_session, scored_inputs):
    import ray.data as rd

    from semanticizer_ray.stages.scoring import score_pairs_scatter

    cfg, profiles, _ = scored_inputs
    # ghost ids no wider than real ones, so the id-width guard does NOT
    # fire first and the membership check itself is exercised
    width = max(len(r["conv_id"]) for r in profiles.take(5))
    ghost = rd.from_pandas(
        pd.DataFrame(
            {
                "conv_a": ["z" * width],
                "conv_b": ["y" * width],
                "block_id": ["b"],
                "block_overflow": [0],
            }
        )
    )
    with pytest.raises(Exception, match="no profile row"):
        score_pairs_scatter(ghost, profiles, cfg).materialize()


def test_side_state_survives_empty_pandas_block(ray_session, scored_inputs):
    """ray 2.49 forwards zero-row PANDAS blocks past map_batches UDFs
    unconverted, so build_bucket_states' split task used to receive a
    pd.DataFrame (with the un-shrunk schema) and crash on .num_rows —
    exactly what sorted_grouped_agg's interior pass emits when a sorted
    block holds only edge keys. Regression: an empty pandas block unioned
    into profiles must not change the packed state."""
    import ray
    import ray.data as rd

    from semanticizer_ray.stages.scoring import build_side_state

    import numpy as np

    cfg, profiles, _ = scored_inputs
    full = profiles.to_pandas()
    with_empty = rd.from_pandas(full).union(rd.from_pandas(full.iloc[0:0]))
    got = ray.get(build_side_state(with_empty))
    ref = ray.get(build_side_state(rd.from_pandas(full)))
    assert len(got) == len(ref)
    for a, b in zip(got, ref):
        np.testing.assert_array_equal(a, b)
