"""Date spine generator (T1) — dbt_utils.date_spine semantics.

Reference analog: /root/reference/test-projects/split/split_proj/models/marts/
metricflow_time_spine.sql:9-15. Generator form: ``sequence`` + ``explode``
evaluates JVM-side; for multi-century spines Spark distributes the explode
across partitions via a range seed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def date_spine(
    spark: SparkSession, start: str, end: str, out_col: str = "date_day"
) -> DataFrame:
    """All dates in [start, end) — matching dbt_utils.date_spine's
    end-exclusive contract."""
    return (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(start).cast("date"),
                    F.date_sub(F.lit(end).cast("date"), 1),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias(out_col)
        )
    )
