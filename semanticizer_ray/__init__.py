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
