"""Declared query corpus (SURVEY.md §2.7) + extension operators (§2.6).

Each query is a callable ``(spark, sf_dir) -> DataFrame`` built with the
DataFrame API (Catalyst plans the physical execution), paired — where the
semantics are SQL-expressible — with the equivalent ANSI SQL the DuckDB
oracle runs. Registries:

- ``QUERIES``: name -> callable
- ``ORACLES``: name -> SQL (subset of QUERIES keys; missing => rows-only check)
"""

from dbt_meshify_spark.queries.relational import (
    ORACLES as _REL_ORACLES,
    QUERIES as _REL_QUERIES,
)
from dbt_meshify_spark.queries.extensions import (
    ORACLES as _EXT_ORACLES,
    QUERIES as _EXT_QUERIES,
)

QUERIES = {**_REL_QUERIES, **_EXT_QUERIES}
ORACLES = {**_REL_ORACLES, **_EXT_ORACLES}

__all__ = ["QUERIES", "ORACLES"]
