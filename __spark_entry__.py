"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship multi-way-join query (Q06 — the shape of
the reference corpus's orders.sql mart) at sf0.001. ``queries()`` /
``oracle_sql()`` expose the full declared corpus from SURVEY.md §2.7 plus the
§2.6 extension operators; implementations live in ``dbt_meshify_spark``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from dbt_meshify_spark.queries import ORACLES, QUERIES  # noqa: E402
from dbt_meshify_spark.session import prepare  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    prepare(spark)
    return QUERIES["q06_multiway_join"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""

    def _wrap(fn):
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            prepare(spark)
            return fn(spark, sf_dir)

        return run

    return {name: _wrap(fn) for name, fn in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each hash-checkable query."""
    return {name: sql.strip() for name, sql in ORACLES.items()}
