"""Dataset sources/sinks: pruned Parquet readers, checkpointed writers."""
