"""Data-layout management: compaction and sort-clustered rewrite.

The two layout problems every standing 100 TB parquet corpus grows:

- **Small files.** Streaming foreachBatch sinks, per-batch incremental
  appends, and over-parallel writers leave thousands of KB-sized files;
  at read time each costs a task + a footer fetch, and the scheduler, not
  the scan, becomes the bottleneck. ``compact_parquet`` rewrites a
  directory to ~target-sized files.
- **No clustering.** Parquet row-group min/max stats only prune when rows
  are clustered on the filtered column. ``optimize_layout`` rewrites a
  table range-partitioned and sorted on the given columns, so every file
  owns a narrow, non-overlapping key range and a selective filter skips
  whole files (the open-format analog of Delta ``OPTIMIZE ... ZORDER BY``
  for the single-column-prefix case, which is what row-group stats can
  actually use).

Both are one-shuffle rewrites, safe to run as periodic maintenance jobs:
write-then-swap into place is the caller's policy (see
``lakehouse.merge_upsert`` for the swap pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def compact_parquet(
    spark: SparkSession,
    path: str,
    out_path: str,
    target_rows_per_file: int = 1_000_000,
) -> int:
    """Rewrite a parquet directory into ``ceil(rows/target)`` files.

    One job: count from metadata-cheap scan, then a round-robin
    ``repartition(n)`` (no key — compaction must not skew on data values)
    and a single write. Returns the file count written. At 100 TB run it
    per-partition-directory, not corpus-wide, so each maintenance job stays
    executor-sized.
    """
    df = spark.read.parquet(path)
    rows = df.count()
    n = max(1, -(-rows // target_rows_per_file))
    df.repartition(n).write.mode("overwrite").parquet(out_path)
    return n


def optimize_layout(
    df: DataFrame,
    out_path: str,
    cluster_by: list[str],
    target_files: int = 8,
) -> None:
    """Rewrite ``df`` clustered on ``cluster_by``: range-partitioned across
    files and sorted within each, so parquet row-group/file min-max stats
    become selective and a pushed-down filter on the cluster column prunes
    entire files instead of scanning them.

    ``repartitionByRange`` samples the key distribution, so files get
    near-equal ROW counts even on skewed keys (a hash layout would put a
    hot key's whole mass in one file); ``sortWithinPartitions`` orders
    rows inside each file so row-group stats are tight too. One shuffle
    total. Verified by reading back file-level parquet stats in
    tests/test_operators.py::test_optimize_layout_clusters_key_ranges.
    """
    cols = [F.col(c) for c in cluster_by]
    (
        df.repartitionByRange(target_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(out_path)
    )
