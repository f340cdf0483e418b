"""Simulate the driver gate locally: plain SparkSession (no engine configs),
entry() smoke, every queries() entry vs its oracle_sql() DuckDB replay at
sf0.01, then exit nonzero on any mismatch. Run ALONE (no concurrent Spark).

Usage: python scripts/driver_sim.py [--sf-dir /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--only", default=None, help="comma-separated query names")
    args = ap.parse_args()

    import duckdb
    from pyspark.sql import SparkSession

    from tests.oracle_utils import canon_duck, canon_spark

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as e

    t0 = time.time()
    n = e.entry(spark).count()
    print(f"entry(): {n} rows in {time.time() - t0:.1f}s", flush=True)
    assert n >= 0

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    queries = e.queries()
    oracles = e.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    bad = []
    for name, fn in sorted(queries.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, args.sf_dir)
            s_cols, s_rows = canon_spark(df)
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error {ex}", flush=True)
            continue
        if name not in oracles:
            print(
                f"ok   {name}: rows-only {len(s_rows)} rows "
                f"({time.time() - t0:.1f}s)",
                flush=True,
            )
            continue
        try:
            d_cols, d_rows = canon_duck(con, oracles[name])
        except Exception as ex:  # noqa: BLE001
            bad.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error {ex}", flush=True)
            continue
        if s_cols != d_cols:
            bad.append((name, f"cols {s_cols} vs {d_cols}"))
        elif len(s_rows) != len(d_rows):
            bad.append((name, f"rows {len(s_rows)} vs {len(d_rows)}"))
        elif s_rows != d_rows:
            diff = next(
                (i for i, (a, b) in enumerate(zip(s_rows, d_rows)) if a != b),
                -1,
            )
            bad.append(
                (
                    name,
                    f"hash mismatch at row {diff}:\n"
                    f"  spark={s_rows[diff]}\n  duck ={d_rows[diff]}",
                )
            )
        status = "FAIL" if bad and bad[-1][0] == name else "ok  "
        print(
            f"{status} {name}: {len(s_rows)} rows ({time.time() - t0:.1f}s)",
            flush=True,
        )

    print(f"\n{len(queries)} queries, {len(bad)} failures")
    for name, why in bad:
        print(f"  {name}: {why}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
