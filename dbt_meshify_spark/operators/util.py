"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, min_factor: int = 1) -> DataFrame:
    """Raise parallelism before a CPU-heavy projection when the upstream scan
    produced fewer partitions than the cluster can run.

    Small local parquet files arrive as a single input split, which would
    serialize per-row signature/hash work onto one core (measured 19.5s -> 1.9s
    on MinHash signatures at sf0.1). On a real cluster a large table's splits
    already exceed ``defaultParallelism``, so this is a no-op there — it never
    introduces a shuffle at scale.
    """
    target = df.sparkSession.sparkContext.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
