"""Source registry: bind the driver testdata parquet tables into Spark.

Mirrors the reference's source layer — dbt ``source()`` bindings resolved to
warehouse relations (see /root/reference/dbt_meshify/dbt_projects.py:279-296
for how the reference learns relations from the catalog; here Spark *is* the
warehouse, so a source is just a parquet scan).

Scale notes:
- All loads are plain ``spark.read.parquet`` — predicate pushdown and column
  pruning reach the scan via Catalyst; nothing is materialized driver-side.
- ``events`` carries TIMESTAMP(NANOS), unreadable by Spark's parquet reader.
  With ``spark.sql.legacy.parquet.nanosAsLong=true`` it surfaces as raw long
  nanoseconds, which we convert to TIMESTAMP via integer division — the same
  truncation DuckDB applies when it narrows ns->us, so both engines agree to
  the microsecond. The conversion is a JVM-side projection (distributed,
  codegen'd); the pyarrow fallback below only exists for sessions where the
  legacy flag is immutable, and is bounded to test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_meshify_spark.session import prepare

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _events_via_arrow(spark: SparkSession, path: str) -> DataFrame:
    """Last-resort loader for TIMESTAMP(NANOS) parquet: downcast in pyarrow.

    Driver-sided — acceptable only at test SF. At 100 TB the fix is the
    legacy-conf path above (or re-writing the source with us timestamps).
    """
    import pyarrow.parquet as pq

    tbl = pq.read_table(path)
    schema = tbl.schema
    for i, field in enumerate(schema):
        if str(field.type) == "timestamp[ns]":
            import pyarrow as pa

            tbl = tbl.set_column(
                i, field.name, tbl.column(i).cast(pa.timestamp("us"))
            )
    return spark.createDataFrame(tbl.to_pandas())


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing the events timestamp column."""
    prepare(spark)
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name != "events":
        return spark.read.parquet(path)
    try:
        df = spark.read.parquet(path)
    except Exception:
        return _events_via_arrow(spark, path)
    ts_field = df.schema["ts"]
    if isinstance(ts_field.dataType, T.LongType):
        # ns -> us truncation via integer division, matching DuckDB's cast.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view; returns the frames."""
    frames = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        frames[name] = df
    return frames
