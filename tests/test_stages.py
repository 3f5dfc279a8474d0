"""Stage-level tests: normalize (T2), profiles (T5), blocking (T6), pairs (T7)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from semanticizer_ray.config import BlockingConfig, EngineConfig
from semanticizer_ray.functions.minhash import hash_params, shingle_hashes
from semanticizer_ray.stages.normalize_turns import normalize_turns
from semanticizer_ray.stages.pairs import candidate_pairs
from semanticizer_ray.stages.signatures import conv_profiles


@pytest.fixture(scope="module")
def transcripts_ds(ray_session, fixture_dir):
    import ray.data as rd

    return rd.read_parquet(fixture_dir["transcripts"])


def test_normalize_turns_keeps_text(ray_session, transcripts_ds):
    cfg = EngineConfig()
    out = normalize_turns(transcripts_ds, cfg)
    df = out.to_pandas()
    src = transcripts_ds.to_pandas()
    # per-turn text equality invariant: raw text column byte-identical
    merged = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    src = src.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    assert (merged["text"] == src["text"]).all()
    assert "norm_text" in merged.columns
    assert (merged["norm_text"].str.lower() == merged["norm_text"]).all()


def test_conv_profiles_match_driver_computation(ray_session, transcripts_ds):
    """Profile signature == minhash over union of per-turn shingles (driver)."""
    cfg = EngineConfig()
    from semanticizer_ray.functions.normalize import normalize_text

    prof = conv_profiles(normalize_turns(transcripts_ds, cfg), cfg).to_pandas()
    assert prof["conv_id"].is_unique

    src = transcripts_ds.to_pandas().sort_values(["conv_id", "turn_idx"])
    a, b = hash_params(cfg.blocking.num_hashes, cfg.seed)
    for cid in prof["conv_id"].head(5):
        turns = src[src["conv_id"] == cid]["text"].tolist()
        shs = [shingle_hashes(normalize_text(t), cfg.blocking.shingle_k) for t in turns]
        sh = np.unique(np.concatenate(shs))
        with np.errstate(over="ignore"):
            want = (a[:, None] * sh[None, :] + b[:, None]).min(axis=1)
        got = np.frombuffer(
            prof.loc[prof["conv_id"] == cid, "sig"].iloc[0], dtype=np.uint64
        )
        assert np.array_equal(got, want), cid
        # text head = ordered concat of normalized turns, truncated
        head = prof.loc[prof["conv_id"] == cid, "text_head"].iloc[0]
        full = " ".join(normalize_text(t) for t in turns)
        assert full[: len(head)] == head[: len(full)] or head == full[: cfg.blocking.max_profile_chars]


def test_profiles_batch_invariance(ray_session, transcripts_ds):
    """Signatures identical whatever the batch size (mergeability)."""
    cfg = EngineConfig()
    n1 = conv_profiles(normalize_turns(transcripts_ds, cfg), cfg, batch_size=64).to_pandas()
    n2 = conv_profiles(normalize_turns(transcripts_ds, cfg), cfg, batch_size=8192).to_pandas()
    m = n1.merge(n2, on="conv_id", suffixes=("_1", "_2"))
    assert len(m) == len(n1)
    assert (m["sig_1"] == m["sig_2"]).all()
    assert (m["n_chars_1"] == m["n_chars_2"]).all()


def test_lsh_blocks_group_duplicates(ray_session, fixture_dir, transcripts_ds):
    """Most planted duplicate pairs share >=1 LSH band key."""
    import pyarrow.parquet as pq

    from semanticizer_ray.stages.blocking import lsh_block_keys

    cfg = EngineConfig()
    profiles = conv_profiles(normalize_turns(transcripts_ds, cfg), cfg)
    keys = lsh_block_keys(profiles, cfg).to_pandas()
    truth = pq.read_table(fixture_dir["clusters_truth"]).to_pandas()
    by_conv = keys.groupby("conv_id")["block_key"].apply(set)
    clusters = truth.groupby("cluster_id")["conv_id"].apply(list)
    dup_pairs = 0
    covered = 0
    for ms in clusters:
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                dup_pairs += 1
                if by_conv.get(ms[i], set()) & by_conv.get(ms[j], set()):
                    covered += 1
    assert dup_pairs > 20
    assert covered / dup_pairs > 0.8, f"LSH recall {covered}/{dup_pairs}"


def test_candidate_pairs_small(ray_session):
    import ray.data as rd

    rows = pd.DataFrame(
        {
            "block_key": ["k1"] * 3 + ["k2"] * 2 + ["k3"],
            "conv_id": ["a", "b", "c", "a", "b", "z"],
        }
    )
    cfg = EngineConfig()
    out = candidate_pairs(rd.from_pandas(rows), cfg).to_pandas()
    got = set(zip(out["conv_a"], out["conv_b"]))
    # k1 yields ab, ac, bc; k2 yields ab (dedup with k1); k3 nothing
    assert got == {("a", "b"), ("a", "c"), ("b", "c")}
    assert out[["conv_a", "conv_b"]].duplicated().sum() == 0


def test_candidate_pairs_salting_exact_coverage(ray_session):
    """A hot key's pair set is identical with salting forced on."""
    import ray.data as rd

    members = [f"m{i:02d}" for i in range(30)]
    rows = pd.DataFrame({"block_key": ["hot"] * 30, "conv_id": members})
    want = {(a, b) for i, a in enumerate(members) for b in members[i + 1 :]}

    cfg_plain = EngineConfig(blocking=BlockingConfig(max_block_size=1000))
    out_plain = candidate_pairs(rd.from_pandas(rows), cfg_plain).to_pandas()
    got_plain = set(zip(out_plain["conv_a"], out_plain["conv_b"]))
    assert got_plain == want

    cfg_salt = EngineConfig(blocking=BlockingConfig(max_block_size=8))
    out_salt = candidate_pairs(rd.from_pandas(rows), cfg_salt).to_pandas()
    got_salt = set(zip(out_salt["conv_a"], out_salt["conv_b"]))
    assert got_salt == want  # salting invariance (SURVEY §5.4)


def test_candidate_pairs_overflow_counted(ray_session):
    import ray.data as rd

    members = [f"m{i:02d}" for i in range(30)]
    rows = pd.DataFrame({"block_key": ["hot"] * 30, "conv_id": members})
    cfg = EngineConfig(
        blocking=BlockingConfig(max_block_size=1000, max_pairs_per_block=100)
    )
    out = candidate_pairs(rd.from_pandas(rows), cfg).to_pandas()
    assert len(out) == 100
    assert (out["block_overflow"] > 0).all()  # no silent caps


def test_fused_block_keys_equals_union(ray_session, transcripts_ds):
    """block_keys(include_anchors=...) is row-identical (up to order) to
    lsh_block_keys ∪ anchor_block_keys — the fused explode only changes
    block layout."""
    from semanticizer_ray.stages.blocking import (
        anchor_block_keys,
        block_keys,
        lsh_block_keys,
    )

    cfg = EngineConfig()
    profiles = conv_profiles(normalize_turns(transcripts_ds, cfg), cfg).materialize()
    fused = (
        block_keys(profiles, cfg, include_anchors=True)
        .to_pandas()
        .sort_values(["conv_id", "block_key"])
        .reset_index(drop=True)
    )
    union = (
        lsh_block_keys(profiles, cfg)
        .union(anchor_block_keys(profiles, cfg))
        .to_pandas()
        .sort_values(["conv_id", "block_key"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fused, union)

    lsh_only = (
        block_keys(profiles, cfg, include_anchors=False)
        .to_pandas()
        .sort_values(["conv_id", "block_key"])
        .reset_index(drop=True)
    )
    lsh_union = (
        lsh_block_keys(profiles, cfg)
        .to_pandas()
        .sort_values(["conv_id", "block_key"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(lsh_only, lsh_union)
