"""Portable read-back for foreachBatch parquet sinks.

Every drained streaming monitor in this package commits micro-batch state
as ``{out_dir}/{name}/batch={id}`` parquet and reads the union back after
``awaitTermination``. Zero micro-batches means the sink directory was never
created; ``os.path.isdir`` detects that only on a LOCAL filesystem — on
HDFS/S3 (the deployment story the batch-keyed sinks are designed for) that
guard is always False and committed state would silently read back as empty
(round-12 advice). Asking Spark itself is portable across filesystems: a
missing path is the datasource's PATH_NOT_FOUND AnalysisException; anything
else — a corrupted but existing directory — still RAISES, which the
curation monitors require (an unreadable sink must not masquerade as an
empty corpus).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_sink_or_none(
    spark: SparkSession, path: str, schema: str | None = None
) -> DataFrame | None:
    """Read a streaming parquet sink, or None when it was never written.

    Only the never-written case (PATH_NOT_FOUND) maps to None; every other
    read failure propagates.

    Pass ``schema`` for STREAMING FILE sinks (``.format("parquet")``): the
    file sink creates ``{path}/_spark_metadata`` eagerly at query start,
    so a zero-micro-batch drain leaves a directory with the metadata log
    and no data files — schema inference then raises UNABLE_TO_INFER
    (verified empirically on this Spark). An explicit schema skips
    inference and the metadata-log file index returns the correct empty
    frame. foreachBatch ``batch=`` keyed sinks have no metadata log and
    need no schema: either a batch committed (footers exist) or the
    directory does not.
    """
    from pyspark.errors import AnalysisException

    reader = spark.read.schema(schema) if schema else spark.read
    try:
        return reader.parquet(path)
    except AnalysisException as e:
        msg = str(e)
        if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
            return None
        raise
