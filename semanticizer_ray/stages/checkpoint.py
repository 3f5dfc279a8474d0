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

    def completed_stages(self) -> dict[str, dict]:
        out = {}
        for d in sorted(os.listdir(self.root)):
            if d.startswith(".tmp-"):
                continue
            man = self._manifest(d)
            if man is not None:
                out[d] = man
        return out
