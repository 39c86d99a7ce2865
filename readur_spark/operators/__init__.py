"""Spark operators: vectorized extraction, dedup, partitioning,
checkpointing, metrics."""
