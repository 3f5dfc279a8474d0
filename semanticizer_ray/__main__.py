"""CLI entry point — the ``ray job submit`` surface (north_rule).

    # full checkpointed run (resumable; see stages/checkpoint.py)
    ray job submit -- python -m semanticizer_ray run \\
        --transcripts /data/transcripts.parquet \\
        --checkpoint-dir /data/er_run1 [--anchor-dict /data/anchor_dict.parquet]

    # build the anchor dictionary artifact (offline job; reference S1/S2)
    ray job submit -- python -m semanticizer_ray build-dict \\
        --corpus /data/link_corpus.parquet --out /data/anchor_dict.parquet

    # build the F3 sense co-occurrence relatedness artifact (offline job)
    ray job submit -- python -m semanticizer_ray build-relatedness \\
        --corpus /data/link_corpus.parquet --out /data/relatedness.parquet

Standalone use initializes a local Ray session (guarded — under
``ray job submit`` the cluster session is joined instead).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# CLI processes are dedicated drivers: opt into the worker-scoped
# allocator tuning. The package __init__ already ran (python -m imports it
# first), so re-invoke the tuner after setting the opt-in — it is
# idempotent and reads the env at call time.
os.environ.setdefault("SEMANTICIZER_MALLOC_TUNE", "1")
from semanticizer_ray import _tune_malloc  # noqa: E402

_tune_malloc()


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="semanticizer_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    runp = sub.add_parser("run", help="checkpointed entity-resolution run")
    runp.add_argument("--transcripts", required=True)
    runp.add_argument("--checkpoint-dir", required=True)
    runp.add_argument("--anchor-dict", default=None)
    runp.add_argument("--relatedness", default=None,
                      help="F3 relatedness artifact (build-relatedness output)")
    runp.add_argument("--threshold", type=float, default=None)
    runp.add_argument("--seed", type=int, default=42)

    dictp = sub.add_parser("build-dict", help="build the anchor dictionary artifact")
    dictp.add_argument("--corpus", required=True)
    dictp.add_argument("--out", required=True)
    dictp.add_argument("--seed", type=int, default=42)

    relp = sub.add_parser(
        "build-relatedness", help="build the F3 sense co-occurrence artifact"
    )
    relp.add_argument("--corpus", required=True)
    relp.add_argument("--out", required=True)
    relp.add_argument("--min-cooc", type=int, default=2)
    relp.add_argument("--max-relations-per-sense", type=int, default=64)
    relp.add_argument("--seed", type=int, default=42)

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from .config import EngineConfig, ScoringConfig

    if args.cmd == "run":
        kw = {"seed": args.seed}
        if args.threshold is not None:
            kw["scoring"] = ScoringConfig(threshold=args.threshold)
        cfg = EngineConfig(**kw)
        from .pipelines.entity_resolution import resolve_entities_checkpointed

        clusters = resolve_entities_checkpointed(
            args.transcripts,
            cfg,
            args.checkpoint_dir,
            anchor_dict_path=args.anchor_dict,
            relatedness_path=args.relatedness,
        )
        n = clusters.count()
        from .stages.checkpoint import Checkpointer

        manifests = Checkpointer(args.checkpoint_dir, cfg).completed_stages()
        print(
            json.dumps(
                {
                    "clusters": n,
                    "checkpoint_dir": args.checkpoint_dir,
                    "stages": {
                        k: {"rows": m["rows"], "wall_sec": m["wall_sec"]}
                        for k, m in manifests.items()
                    },
                }
            )
        )
    elif args.cmd == "build-dict":
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from .state.anchor_dict import build_anchor_dict

        cfg = EngineConfig(seed=args.seed)
        table = pa.Table.from_pandas(
            build_anchor_dict(rd.read_parquet(args.corpus), cfg).to_pandas()
        )
        tmp = args.out + ".tmp"
        pq.write_table(table, tmp)
        import os

        os.replace(tmp, args.out)
        print(json.dumps({"labels": table.num_rows, "out": args.out}))
    elif args.cmd == "build-relatedness":
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from .state.relatedness import build_relatedness

        cfg = EngineConfig(seed=args.seed)
        rel = build_relatedness(
            rd.read_parquet(args.corpus),
            cfg,
            min_cooc=args.min_cooc,
            max_relations_per_sense=args.max_relations_per_sense,
        )
        tmp = args.out + ".tmp"
        pq.write_table(pa.Table.from_pandas(rel, preserve_index=False), tmp)
        os.replace(tmp, args.out)
        print(json.dumps({"pairs": len(rel), "out": args.out}))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
