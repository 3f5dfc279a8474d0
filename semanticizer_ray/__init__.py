"""semanticizer_ray — a Ray-Data-native record-linkage / entity-resolution engine.

A from-scratch re-expression of the query and data-processing capabilities of
``semanticize/semanticizer`` (the UvA Wikipedia-anchor entity-linking service;
see SURVEY.md) as a three-stage blocking → pairwise-scoring → transitive-
clustering pipeline over Parquet transcript tables, built Ray-Data-first:

- every stage is a ``ray.data.Dataset`` → ``Dataset`` transform
  (``map_batches`` over zero-copy Arrow batches; actor pools for stateful
  stages like the anchor-dictionary matcher);
- wide steps (anchor-dict aggregation, blocking-key shuffle, connected
  components) use ``groupby``/``aggregate``/``map_groups`` with partial
  pre-aggregation and explicit hot-key handling;
- outputs are partitioned Parquet checkpoints with lineage manifests.

Reference semantics preserved (SURVEY.md §2): text normalization
(``functions.normalize``), n-gram anchor matching with linkProbability /
commonness / senseProbability scoring (``stages.mentions``), candidate
filtering (threshold + unique-per-sense), feature computation and linear
re-scoring (``stages.scoring``).
"""

__version__ = "0.1.0"


def _tune_malloc() -> None:
    """Stop glibc from mmap/munmap-ing every large numpy temporary.

    Vectorized batch kernels allocate and free multi-MB temporaries per
    batch; glibc serves blocks over M_MMAP_THRESHOLD (128 KB default) with
    fresh mmaps and returns them on free, so every batch re-pays page
    faults + TLB shootdowns + memory-zone lock contention IN THE KERNEL.
    Measured on a 32-core node at full width: a 32-process numpy loop spent
    ~92% of its CPU in system time; raising the threshold flipped that to
    ~64% user time (same work). Trade, documented: freed large blocks are
    retained up to the high-water mark per process (bounded here by 256 MB
    blocks; batch-sized temps are well under it). Best-effort: non-glibc
    platforms no-op.

    Scope: a LIBRARY must not mutate a host application's allocator as an
    import side effect, so this applies only inside Ray WORKER processes
    (detected via RAY_RAYLET_PID, which raylet sets for workers but not
    drivers — workers import this package when unpickling stage UDFs, so
    every worker is tuned no matter how the driver configured ray.init).
    ``SEMANTICIZER_MALLOC_TUNE=1`` opts a driver/CLI process in;
    ``SEMANTICIZER_MALLOC_TUNE=0`` disables everywhere."""
    import os

    flag = os.environ.get("SEMANTICIZER_MALLOC_TUNE")
    if flag == "0":
        return
    if flag != "1" and "RAY_RAYLET_PID" not in os.environ:
        return
    try:
        import ctypes

        libc = ctypes.CDLL(None)
        M_TRIM_THRESHOLD, M_MMAP_THRESHOLD = -1, -3
        libc.mallopt(M_MMAP_THRESHOLD, 1 << 28)
        libc.mallopt(M_TRIM_THRESHOLD, 1 << 28)
    except (OSError, AttributeError):
        pass


_tune_malloc()
