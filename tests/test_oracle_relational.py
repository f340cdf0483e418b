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
