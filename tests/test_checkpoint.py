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


def test_partitioned_stage_resumes_after_crash(ray_session, tmp_path):
    """Crash mid-stage (exception during part 3 of 5) → resume completes
    only the missing parts; result identical to an uninterrupted run."""
    import ray.data as rd

    cfg = EngineConfig()
    part_ids = [f"b{i}" for i in range(5)]

    def make_compute(fail_at: str | None, calls: list):
        def compute(pid: str) -> rd.Dataset:
            if pid == fail_at:
                raise RuntimeError("simulated crash mid-shuffle")
            calls.append(pid)
            return rd.from_pandas(
                pd.DataFrame({"part": [pid] * 3, "v": [1, 2, 3]})
            )

        return compute

    ck_fresh = Checkpointer(str(tmp_path / "fresh"), cfg)
    fresh_calls: list = []
    fresh = ck_fresh.partitioned_stage(
        "s", "fp0", part_ids, make_compute(None, fresh_calls)
    )
    fresh_df = fresh.dataset.to_pandas().sort_values(["part", "v"]).reset_index(drop=True)

    ck = Checkpointer(str(tmp_path / "crashy"), cfg)
    crash_calls: list = []
    with pytest.raises(RuntimeError, match="simulated crash"):
        ck.partitioned_stage("s", "fp0", part_ids, make_compute("b3", crash_calls))
    assert crash_calls == ["b0", "b1", "b2"]  # b3 crashed, b4 never ran
    assert not os.path.exists(tmp_path / "crashy" / "s" / "MANIFEST.json")

    resume_calls: list = []
    resumed = ck.partitioned_stage(
        "s", "fp0", part_ids, make_compute(None, resume_calls)
    )
    assert resume_calls == ["b3", "b4"]  # finished parts NOT recomputed
    assert resumed.resumed
    resumed_df = (
        resumed.dataset.to_pandas().sort_values(["part", "v"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(fresh_df, resumed_df)

    # changed input fingerprint invalidates partial parts too
    ck2 = Checkpointer(str(tmp_path / "crashy2"), cfg)
    c2: list = []
    with pytest.raises(RuntimeError):
        ck2.partitioned_stage("s", "fpA", part_ids, make_compute("b2", c2))
    c3: list = []
    ck2.partitioned_stage("s", "fpB", part_ids, make_compute(None, c3))
    assert c3 == part_ids  # nothing reused across fingerprints


def test_partitioned_stage_part_ids_change_invalidates(ray_session, tmp_path):
    """ADVICE r2: a COMPLETED partitioned stage must rebuild when the part
    set changes (e.g. pair_resume_buckets), same as a pending one — the
    part set is part of the stage's identity."""
    import ray.data as rd

    cfg = EngineConfig()

    def make_compute(calls: list):
        def compute(pid: str) -> rd.Dataset:
            calls.append(pid)
            return rd.from_pandas(pd.DataFrame({"part": [pid], "v": [1]}))

        return compute

    ck = Checkpointer(str(tmp_path / "ck"), cfg)
    c1: list = []
    ck.partitioned_stage("s", "fp0", ["b0", "b1"], make_compute(c1))
    assert c1 == ["b0", "b1"]

    # same part set → full reuse
    c2: list = []
    r2 = ck.partitioned_stage("s", "fp0", ["b0", "b1"], make_compute(c2))
    assert c2 == [] and r2.resumed

    # changed part set, same config + fingerprint → rebuild, not reuse
    c3: list = []
    r3 = ck.partitioned_stage("s", "fp0", ["b0", "b1", "b2"], make_compute(c3))
    assert c3 == ["b0", "b1", "b2"] and not r3.resumed
    man = json.load(open(tmp_path / "ck" / "s" / "MANIFEST.json"))
    assert man["part_ids"] == ["b0", "b1", "b2"]


def test_pair_shuffle_partition_resume(ray_session, fixture_dir, tmp_path):
    """Kill during the pair shuffle (partial parts on disk, no manifest),
    resume, byte-compare final clusters to an uninterrupted run — the
    north_rule "resumes mid-shuffle" criterion."""
    import shutil

    cfg = EngineConfig()
    tr = fixture_dir["transcripts"]

    fresh = resolve_entities_checkpointed(
        tr, cfg, str(tmp_path / "runA"), pair_resume_buckets=8
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)

    # fabricate the exact on-disk state of a run killed mid-pair-write:
    # profiles complete; pairs stage has PENDING + a subset of parts
    src, dst = tmp_path / "runA", tmp_path / "runB"
    os.makedirs(dst)
    shutil.copytree(src / "profiles", dst / "profiles")
    man = json.load(open(src / "pairs" / "MANIFEST.json"))
    os.makedirs(dst / "pairs" / "parts")
    with open(dst / "pairs" / "PENDING.json", "w") as f:
        json.dump(
            {
                "config_hash": man["config_hash"],
                "input_fingerprint": man["input_fingerprint"],
                "part_ids": [f"b{i}" for i in range(8)],
            },
            f,
        )
    done_parts = ["b0", "b1", "b5"]
    for pid in done_parts:
        shutil.copytree(src / "pairs" / "parts" / pid, dst / "pairs" / "parts" / pid)
    # in-flight litter from the "crash"
    os.makedirs(dst / "pairs" / "parts" / ".tmp-b2-dead")

    kept_mtimes = {
        pid: os.path.getmtime(dst / "pairs" / "parts" / pid) for pid in done_parts
    }
    resumed = resolve_entities_checkpointed(
        tr, cfg, str(dst), pair_resume_buckets=8
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)

    pd.testing.assert_frame_equal(fresh, resumed)
    for pid in done_parts:  # finished parts were reused, not rewritten
        assert os.path.getmtime(dst / "pairs" / "parts" / pid) == kept_mtimes[pid]
    assert not os.path.exists(dst / "pairs" / "parts" / ".tmp-b2-dead")
    man_b = json.load(open(dst / "pairs" / "MANIFEST.json"))
    assert sorted(man_b["resumed_parts"]) == done_parts


def test_pair_shuffle_resume_after_sigkill(ray_session, fixture_dir, tmp_path):
    """Hard-kill (SIGKILL) a separate process mid-pair-write, then resume
    in this session: finished parts are reused and the final clusters
    byte-match an uninterrupted run."""
    import signal
    import subprocess
    import sys
    import time

    cfg = EngineConfig()
    tr = fixture_dir["transcripts"]

    fresh = resolve_entities_checkpointed(
        tr, cfg, str(tmp_path / "runK_fresh"), pair_resume_buckets=6
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)

    ck_dir = tmp_path / "runK"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = f"""
import ray
ray.init(address="local", num_cpus=4, include_dashboard=False, logging_level="ERROR")
from ray.data import DataContext
DataContext.get_current().enable_progress_bars = False
import sys
sys.path.insert(0, {repr(repo_root)})
from semanticizer_ray.config import EngineConfig
from semanticizer_ray.pipelines.entity_resolution import resolve_entities_checkpointed
resolve_entities_checkpointed(
    {repr(str(tr))}, EngineConfig(), {repr(str(ck_dir))}, pair_resume_buckets=6
)
"""
    proc = subprocess.Popen([sys.executable, "-c", script])
    parts_dir = ck_dir / "pairs" / "parts"
    deadline = time.time() + 180
    killed = False
    while time.time() < deadline and proc.poll() is None:
        done = (
            [d for d in os.listdir(parts_dir) if not d.startswith(".tmp-")]
            if parts_dir.exists()
            else []
        )
        if len(done) >= 2:  # mid-stage: some parts written, some not
            proc.send_signal(signal.SIGKILL)
            killed = True
            break
        time.sleep(0.5)
    proc.wait(timeout=60)
    assert killed, "subprocess finished before the kill window (raise buckets?)"
    assert not (ck_dir / "pairs" / "MANIFEST.json").exists()

    survivors = sorted(
        d for d in os.listdir(parts_dir) if not d.startswith(".tmp-")
    )
    assert survivors  # something real survived the kill
    resumed = resolve_entities_checkpointed(
        tr, cfg, str(ck_dir), pair_resume_buckets=6
    ).to_pandas().sort_values("conv_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(fresh, resumed)
    man = json.load(open(ck_dir / "pairs" / "MANIFEST.json"))
    # per-part renames are atomic, so exactly the survivors were reused
    assert sorted(man["resumed_parts"]) == survivors


def test_no_tmp_litter_on_success(ray_session, fixture_dir, tmp_path):
    cfg = EngineConfig()
    resolve_entities_checkpointed(
        fixture_dir["transcripts"], cfg, str(tmp_path / "run")
    )
    leftovers = [d for d in os.listdir(tmp_path / "run") if d.startswith(".tmp-")]
    assert leftovers == []
