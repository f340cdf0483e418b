"""Lakehouse upsert adapter: real MERGE when a table format is installed,
write-then-swap parquet otherwise.

The incremental algebra everywhere in this engine (runner merge strategy,
``streaming.stream_to_incremental``) is "same-key new rows replace old" — at
cluster scale that should execute as a transactional ``MERGE INTO`` on
Delta/Iceberg (file-level pruning + conflict-safe commits) instead of
rewriting the table. Neither format ships in this container, so the adapter
resolves at runtime:

- Delta importable -> ``DeltaTable.merge`` (whenMatched update-all /
  whenNotMatched insert-all, i.e. dbt-spark's merge strategy verbatim).
- Otherwise -> the deterministic anti-join + union + versioned-parquet swap
  used by the runner (correct, but rewrites; the 100 TB upgrade path is
  "install Delta", not "change callers").

Reference semantics: dbt incremental ``unique_key`` merge
(/root/reference/test-projects/split/split_proj/models/marts/orders.sql:1-6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def delta_available() -> bool:
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


def merge_upsert(
    spark: SparkSession,
    target_dir: str,
    source: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Upsert ``source`` into the table at ``target_dir`` by ``keys``;
    creates the table on first call. Returns the post-merge table."""
    if delta_available():
        return _merge_delta(spark, target_dir, source, keys)
    return _merge_parquet_swap(spark, target_dir, source, keys)


def _merge_delta(
    spark: SparkSession, target_dir: str, source: DataFrame, keys: list[str]
) -> DataFrame:
    from delta.tables import DeltaTable

    if not DeltaTable.isDeltaTable(spark, target_dir):
        source.write.format("delta").mode("overwrite").save(target_dir)
        return spark.read.format("delta").load(target_dir)
    target = DeltaTable.forPath(spark, target_dir)
    cond = " AND ".join(f"t.`{k}` <=> s.`{k}`" for k in keys)
    (
        target.alias("t")
        .merge(source.alias("s"), cond)
        .whenMatchedUpdateAll()
        .whenNotMatchedInsertAll()
        .execute()
    )
    return spark.read.format("delta").load(target_dir)


def _merge_parquet_swap(
    spark: SparkSession, target_dir: str, source: DataFrame, keys: list[str]
) -> DataFrame:
    """Versioned-parquet fallback: read v{n}, anti-join survivors, write
    v{n+1}. The version marker lives in ``_VERSION`` so repeated calls (and
    separate processes) agree on the current table."""
    import os

    marker = os.path.join(target_dir, "_VERSION")
    version = 0
    if os.path.exists(marker):
        with open(marker) as f:
            version = int(f.read().strip())
    if version:
        existing = spark.read.parquet(os.path.join(target_dir, f"v{version}"))
        survivors = existing.join(
            source.select(*keys).distinct(), on=keys, how="left_anti"
        )
        combined = source.unionByName(survivors)
    else:
        combined = source
    version += 1
    out_path = os.path.join(target_dir, f"v{version}")
    combined.write.mode("overwrite").parquet(out_path)
    os.makedirs(target_dir, exist_ok=True)
    with open(marker, "w") as f:
        f.write(str(version))
    return spark.read.parquet(out_path)


def list_versions(target_dir: str) -> list[int]:
    """Versions available at ``target_dir`` (ascending). Parquet-swap tables
    keep every ``v{n}`` directory precisely so trainings can pin the exact
    snapshot they consumed; Delta tables answer from their own log."""
    import os
    import re

    if not os.path.isdir(target_dir):
        return []
    return sorted(
        int(m.group(1))
        for d in os.listdir(target_dir)
        if (m := re.fullmatch(r"v(\d+)", d))
    )


def read_table_version(
    spark: SparkSession, target_dir: str, version: int | None = None
) -> DataFrame:
    """Snapshot read (time travel): the table at ``target_dir`` exactly as
    of ``version`` (default: current). A training run that records the
    version it read is exactly reproducible later, merges since
    notwithstanding — the dataset-lineage half of incremental curation.

    Delta path: native ``versionAsOf``. Parquet-swap path: each merge wrote
    an immutable ``v{n}`` directory, so the snapshot is a plain read of
    that directory.
    """
    import os

    if delta_available():
        from delta.tables import DeltaTable

        if DeltaTable.isDeltaTable(spark, target_dir):
            r = spark.read.format("delta")
            if version is not None:
                r = r.option("versionAsOf", version)
            return r.load(target_dir)
    versions = list_versions(target_dir)
    if not versions:
        raise FileNotFoundError(f"no table versions at {target_dir}")
    if version is None:
        marker = os.path.join(target_dir, "_VERSION")
        with open(marker) as f:
            version = int(f.read().strip())
    if version not in versions:
        raise ValueError(f"version {version} not in {versions} at {target_dir}")
    return spark.read.parquet(os.path.join(target_dir, f"v{version}"))


def expire_versions(
    spark: SparkSession, target_dir: str, keep_last: int = 2
) -> list[int]:
    """Retention maintenance for versioned tables (the VACUUM /
    ``delta.logRetentionDuration`` analog of the parquet-swap path): delete
    every snapshot older than the newest ``keep_last``, NEVER touching the
    current version. Returns the versions removed.

    Each ``v{n}`` directory is immutable, so expiry is a pure directory
    delete — no data rewrite, no reader coordination beyond "don't pin a
    version you've expired" (the caller owns that policy; training runs
    that must stay reproducible keep their pinned versions out of the
    retention window). Delta tables manage their own retention and are
    left alone.
    """
    import os
    import shutil

    if keep_last < 1:
        raise ValueError("expire_versions: keep_last must be >= 1")
    if delta_available():
        from delta.tables import DeltaTable

        if DeltaTable.isDeltaTable(spark, target_dir):
            return []  # Delta retention is the engine's job (VACUUM)
    versions = list_versions(target_dir)
    doomed = versions[:-keep_last] if len(versions) > keep_last else []
    marker = os.path.join(target_dir, "_VERSION")
    current = None
    if os.path.exists(marker):
        with open(marker) as f:
            current = int(f.read().strip())
    removed = []
    for v in doomed:
        if v == current:
            continue  # the live version is never expired
        path = os.path.join(target_dir, f"v{v}")
        shutil.rmtree(path, ignore_errors=True)
        # report only what actually left the disk — a permission/NFS-busy
        # failure must not corrupt the caller's retention audit
        if not os.path.exists(path):
            removed.append(v)
    return removed
