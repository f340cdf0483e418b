"""Every declared query (SURVEY.md §2.7) must match the DuckDB oracle at the
correctness scale factor — the local replica of the driver's t2 gate."""

from __future__ import annotations

import pytest

from dbt_meshify_spark.queries import ORACLES, QUERIES
from tests.conftest import SF_ORACLE
from tests.oracle_utils import assert_matches_oracle

ORACLE_KEYS = sorted(ORACLES)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert_matches_oracle(df, duck, ORACLES[name], name)


def test_every_query_has_entry():
    # queries without an oracle get the driver's weaker rows-only check;
    # they must still run (covered by test_smoke_all_queries).
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_smoke_rows_only_queries(spark, name):
    df = QUERIES[name](spark, SF_ORACLE)
    assert df.count() >= 0


def test_oracle_checked_outputs_are_scalar_only(spark):
    # The driver's value comparator canonicalizes via pandas, which cannot
    # sort/hash list cells (round-1 q36 failure). Every oracle-checked
    # query must emit scalar columns only; array-typed surfaces belong in
    # rows-only queries or unit tests.
    from pyspark.sql import types as T

    from tests.conftest import SF_SMOKE

    bad = []
    for name in ORACLE_KEYS:
        schema = QUERIES[name](spark, SF_SMOKE).schema
        for f in schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append((name, f.name, f.dataType.simpleString()))
    assert not bad, f"non-scalar columns in oracle-checked outputs: {bad}"
