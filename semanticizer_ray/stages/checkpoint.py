"""Stage T10: per-partition Parquet checkpoints + lineage manifests.

North_rule: "Every stage checkpoints per-partition Parquet with lineage
metadata (block id, input fingerprints, pair counts) so the pipeline
resumes mid-shuffle." Reference analog: the Redis version-namespace swap on
dump reload (``wpm/namespace.py``; SURVEY.md S2) — here the atomic unit is
a directory rename plus a manifest written LAST.

Layout per stage:
    <root>/<stage>/data/*.parquet      (one file per Ray block — the
                                        partition lineage unit)
    <root>/<stage>/MANIFEST.json       {stage, config_hash,
                                        input_fingerprint, rows, files:
                                        [{name, rows}], wall_sec}

Write protocol (idempotent under task retry / driver crash):
1. write the Dataset to ``<root>/.tmp-<stage>-<nonce>/``;
2. write MANIFEST.json inside it (manifest present ⇒ data complete);
3. atomic ``os.rename`` onto the final path.
A crashed run leaves only ``.tmp-*`` litter, never a half-valid stage dir.

Resume: a stage is reused iff its manifest exists AND its config_hash and
input_fingerprint match the current run — config or upstream changes
invalidate downstream stages automatically (fingerprints chain: each
stage's output fingerprint feeds the next stage's input fingerprint).
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from dataclasses import dataclass
from typing import Callable

import ray.data as rd

from ..config import EngineConfig

MANIFEST = "MANIFEST.json"


def fingerprint_paths(paths: list[str]) -> str:
    """Deterministic fingerprint of input files (path, size, mtime_ns).

    Nanosecond mtime: with whole-second granularity a file rewritten within
    the same second at identical size would fingerprint identically and a
    resume would silently reuse stale downstream stages.
    """
    h = hashlib.sha256()
    for p in sorted(paths):
        st = os.stat(p)
        h.update(f"{p}:{st.st_size}:{st.st_mtime_ns}".encode())
    return h.hexdigest()[:16]


@dataclass
class StageResult:
    dataset: rd.Dataset
    fingerprint: str
    resumed: bool
    wall_sec: float


class Checkpointer:
    def __init__(self, root: str, cfg: EngineConfig):
        self.root = root
        self.cfg = cfg
        self.config_hash = cfg.config_hash()
        os.makedirs(root, exist_ok=True)

    def _dir(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def _manifest(self, stage: str) -> dict | None:
        path = os.path.join(self._dir(stage), MANIFEST)
        if not os.path.exists(path):
            return None
        with open(path) as f:
            return json.load(f)

    def stage(
        self,
        name: str,
        input_fingerprint: str,
        compute: Callable[[], rd.Dataset],
    ) -> StageResult:
        """Return the stage's dataset, reusing a valid checkpoint if one
        exists, else computing + checkpointing it."""
        man = self._manifest(name)
        if (
            man is not None
            and man.get("config_hash") == self.config_hash
            and man.get("input_fingerprint") == input_fingerprint
        ):
            ds = rd.read_parquet(os.path.join(self._dir(name), "data"))
            return StageResult(
                dataset=ds,
                fingerprint=man["output_fingerprint"],
                resumed=True,
                wall_sec=0.0,
            )

        t0 = time.perf_counter()
        ds = compute()
        nonce = uuid.uuid4().hex[:8]
        tmp = os.path.join(self.root, f".tmp-{name}-{nonce}")
        data_dir = os.path.join(tmp, "data")
        ds.write_parquet(data_dir)
        wall = time.perf_counter() - t0
        files = sorted(f for f in os.listdir(data_dir) if f.endswith(".parquet"))
        import pyarrow.parquet as pq

        file_meta = [
            {"name": f, "rows": pq.read_metadata(os.path.join(data_dir, f)).num_rows}
            for f in files
        ]
        rows = sum(m["rows"] for m in file_meta)
        out_fp = fingerprint_paths([os.path.join(data_dir, f) for f in files])
        manifest = {
            "stage": name,
            "config_hash": self.config_hash,
            "input_fingerprint": input_fingerprint,
            "output_fingerprint": out_fp,
            "rows": rows,
            "files": file_meta,
            "wall_sec": round(wall, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        with open(os.path.join(tmp, MANIFEST), "w") as f:
            json.dump(manifest, f, indent=1)
        final = self._dir(name)
        if os.path.exists(final):  # stale (config/input changed): replace
            import shutil

            shutil.rmtree(final)
        os.rename(tmp, final)
        return StageResult(
            dataset=rd.read_parquet(os.path.join(final, "data")),
            fingerprint=out_fp,
            resumed=False,
            wall_sec=wall,
        )

    def partitioned_stage(
        self,
        name: str,
        input_fingerprint: str,
        part_ids: list[str],
        compute_part: Callable[[str], rd.Dataset],
    ) -> StageResult:
        """Partition-level resume (north_rule "resumes mid-shuffle"): the
        stage's work is split into deterministic parts; each finished part
        is an atomically-renamed directory under ``parts/``, so a crash
        mid-stage loses only the in-flight part. Resume = anti-join of
        ``part_ids`` against the finished directory names (the J6
        semi/anti-join pattern, driver-side — part counts are small).

        Layout:
            <root>/<stage>/PENDING.json   (config_hash + input_fingerprint,
                                           written FIRST — guards partial
                                           parts against config/input drift)
            <root>/<stage>/parts/<pid>/*.parquet   (atomic per-part rename)
            <root>/<stage>/MANIFEST.json  (written LAST — the commit point;
                                           same validity contract as
                                           ``stage()``)
        """
        final = self._dir(name)
        man = self._manifest(name)
        if (
            man is not None
            and man.get("config_hash") == self.config_hash
            and man.get("input_fingerprint") == input_fingerprint
            # a changed partitioning must invalidate a COMPLETED stage too,
            # not just pending parts (ADVICE r2): the part set is part of
            # the stage's identity
            and man.get("part_ids") == list(part_ids)
        ):
            ds = rd.read_parquet(os.path.join(final, "parts"))
            return StageResult(
                dataset=ds,
                fingerprint=man["output_fingerprint"],
                resumed=True,
                wall_sec=0.0,
            )

        t0 = time.perf_counter()
        pending_path = os.path.join(final, "PENDING.json")
        parts_dir = os.path.join(final, "parts")
        pending = None
        if os.path.exists(pending_path):
            with open(pending_path) as f:
                pending = json.load(f)
        if (
            pending is None
            or pending.get("config_hash") != self.config_hash
            or pending.get("input_fingerprint") != input_fingerprint
            or pending.get("part_ids") != list(part_ids)  # partitioning changed
            or man is not None  # stale complete stage: rebuild from scratch
        ):
            if os.path.exists(final):
                import shutil

                shutil.rmtree(final)
            os.makedirs(parts_dir, exist_ok=True)
            with open(pending_path + ".tmp", "w") as f:
                json.dump(
                    {
                        "config_hash": self.config_hash,
                        "input_fingerprint": input_fingerprint,
                        "part_ids": list(part_ids),
                    },
                    f,
                )
            os.rename(pending_path + ".tmp", pending_path)

        # clear crashed in-flight litter so the final read sees only
        # completed (renamed) parts
        if os.path.exists(parts_dir):
            import shutil

            for d in os.listdir(parts_dir):
                if d.startswith(".tmp-"):
                    shutil.rmtree(os.path.join(parts_dir, d), ignore_errors=True)
        done = {
            d for d in os.listdir(parts_dir) if not d.startswith(".tmp-")
        } if os.path.exists(parts_dir) else set()
        resumed_any = bool(done)
        for pid in part_ids:
            if pid in done:
                continue
            ds_part = compute_part(pid)
            tmp = os.path.join(parts_dir, f".tmp-{pid}-{uuid.uuid4().hex[:8]}")
            ds_part.write_parquet(tmp)
            os.makedirs(tmp, exist_ok=True)  # an all-empty part writes no dir
            os.rename(tmp, os.path.join(parts_dir, pid))
        wall = time.perf_counter() - t0

        import pyarrow.parquet as pq

        file_meta = []
        all_files = []
        for pid in sorted(part_ids):
            pdir = os.path.join(parts_dir, pid)
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet"):
                    p = os.path.join(pdir, f)
                    all_files.append(p)
                    file_meta.append(
                        {
                            "name": f"{pid}/{f}",
                            "rows": pq.read_metadata(p).num_rows,
                        }
                    )
        out_fp = fingerprint_paths(all_files)
        manifest = {
            "stage": name,
            "config_hash": self.config_hash,
            "input_fingerprint": input_fingerprint,
            "output_fingerprint": out_fp,
            "rows": sum(m["rows"] for m in file_meta),
            "files": file_meta,
            "partitioned": True,
            "part_ids": list(part_ids),
            "resumed_parts": sorted(done),
            "wall_sec": round(wall, 3),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        mtmp = os.path.join(final, f".tmp-manifest-{uuid.uuid4().hex[:8]}")
        with open(mtmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.rename(mtmp, os.path.join(final, MANIFEST))
        return StageResult(
            dataset=rd.read_parquet(parts_dir),
            fingerprint=out_fp,
            resumed=resumed_any,
            wall_sec=wall,
        )

    def completed_stages(self) -> dict[str, dict]:
        out = {}
        for d in sorted(os.listdir(self.root)):
            if d.startswith(".tmp-"):
                continue
            man = self._manifest(d)
            if man is not None:
                out[d] = man
        return out
