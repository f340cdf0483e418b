"""Local replica of the driver's DuckDB-oracle comparison.

Canonicalization: columns sorted by name, floats rounded to 4 dp,
dates/timestamps to ISO strings, rows compared as sorted multisets —
mirrors the driver's row-count + schema + order-insensitive value-hash.
"""

from __future__ import annotations

import datetime
import decimal
import math


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 4)
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    return v


def canon_spark(df) -> tuple[list[str], list[tuple]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_value(r[c]) for c in cols) for r in df.collect()]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows


def canon_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    res = con.execute(sql)
    names = [d[0] for d in res.description]
    order = sorted(range(len(names)), key=lambda i: names[i])
    cols = [names[i] for i in order]
    rows = [tuple(_canon_value(r[i]) for i in order) for r in res.fetchall()]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows


def assert_matches_oracle(spark_df, con, sql: str, name: str = "?"):
    s_cols, s_rows = canon_spark(spark_df)
    d_cols, d_rows = canon_duck(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"
