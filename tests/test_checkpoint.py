"""T10 checkpoint/resume: manifests, atomicity, resume-equals-fresh."""

import json
import os

import pandas as pd
import pytest

from semanticizer_ray.config import EngineConfig
from semanticizer_ray.pipelines.entity_resolution import resolve_entities_checkpointed
from semanticizer_ray.stages.checkpoint import Checkpointer, fingerprint_paths


def test_stage_roundtrip_and_reuse(ray_session, tmp_path):
    import ray.data as rd

    cfg = EngineConfig()
    ck = Checkpointer(str(tmp_path / "ck"), cfg)
    calls = {"n": 0}

    def compute():
        calls["n"] += 1
        return rd.from_pandas(pd.DataFrame({"x": [1, 2, 3]}))

    r1 = ck.stage("s1", "fp0", compute)
    assert not r1.resumed and calls["n"] == 1
    assert r1.dataset.count() == 3
    man = json.load(open(tmp_path / "ck" / "s1" / "MANIFEST.json"))
    assert man["rows"] == 3 and man["config_hash"] == cfg.config_hash()
    assert all(f["rows"] >= 0 for f in man["files"])  # per-partition lineage

    r2 = ck.stage("s1", "fp0", compute)
    assert r2.resumed and calls["n"] == 1  # no recompute
    assert r2.fingerprint == r1.fingerprint

    # changed input fingerprint → recompute
    r3 = ck.stage("s1", "fp1", compute)
    assert not r3.resumed and calls["n"] == 2


def test_config_change_invalidates(ray_session, tmp_path):
    import ray.data as rd
    from semanticizer_ray.config import ScoringConfig

    def compute():
        return rd.from_pandas(pd.DataFrame({"x": [1]}))

    ck1 = Checkpointer(str(tmp_path / "ck"), EngineConfig())
    ck1.stage("s", "fp", compute)
    ck2 = Checkpointer(
        str(tmp_path / "ck"), EngineConfig(scoring=ScoringConfig(threshold=0.9))
    )
    r = ck2.stage("s", "fp", compute)
    assert not r.resumed


def test_resume_equals_fresh(ray_session, fixture_dir, tmp_path):
    """Kill after stage k (delete later stages), resume, byte-compare."""
    cfg = EngineConfig()
    tr = fixture_dir["transcripts"]

    fresh = resolve_entities_checkpointed(
        tr, cfg, str(tmp_path / "run1")
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)

    # simulate crash: copy run1 but drop edges+clusters, then resume
    import shutil

    shutil.copytree(tmp_path / "run1", tmp_path / "run2")
    shutil.rmtree(tmp_path / "run2" / "edges")
    shutil.rmtree(tmp_path / "run2" / "clusters")
    resumed = resolve_entities_checkpointed(
        tr, cfg, str(tmp_path / "run2")
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(fresh, resumed)

    # third run with everything present: all stages resumed (no recompute)
    man_before = json.load(open(tmp_path / "run1" / "clusters" / "MANIFEST.json"))
    again = resolve_entities_checkpointed(tr, cfg, str(tmp_path / "run1"))
    man_after = json.load(open(tmp_path / "run1" / "clusters" / "MANIFEST.json"))
    assert man_before["written_at"] == man_after["written_at"]
    assert again.count() == len(fresh)


def test_no_tmp_litter_on_success(ray_session, fixture_dir, tmp_path):
    cfg = EngineConfig()
    resolve_entities_checkpointed(
        fixture_dir["transcripts"], cfg, str(tmp_path / "run")
    )
    leftovers = [d for d in os.listdir(tmp_path / "run") if d.startswith(".tmp-")]
    assert leftovers == []
