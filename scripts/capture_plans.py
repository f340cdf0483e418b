"""Capture .explain('formatted') for named queries into a directory.

Plan-shape evidence only (no noop execution, no timing) — safe to run
alongside other work. Usage:

    python scripts/capture_plans.py DIR SUFFIX query [query ...]

writes DIR/<query>_<SUFFIX>.txt for each query.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 4:
        raise SystemExit("usage: capture_plans.py DIR SUFFIX query [query ...]")
    out_dir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from dbt_meshify_spark.queries import QUERIES
    from dbt_meshify_spark.session import get_spark

    spark = get_spark(app_name="dbt-meshify-spark-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(
                spark.sparkContext._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            )
        print(f"wrote {path}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
