"""Local replica of the driver's DuckDB-oracle comparison.

Pandas-faithful (round 3): the driver canonicalizes BOTH result sets through
pandas (Spark ``toPandas()``, DuckDB ``.df()``) and hashes ``str()`` forms of
the values. That pipeline coerces DuckDB HUGEINT (bare integer ``SUM``) and
nullable int64 columns to float64 — so an uncast windowed SUM hashes as
``"3.0"`` against Spark's ``"3"`` (the 2-round q12 red row). The previous sim
fetched DuckDB rows via ``fetchall()`` (HUGEINT -> Python int) and masked that
whole bug class. This version:

- fetches both sides as pandas frames,
- canonicalizes each cell to a STRING (ints ``"3"``, floats rounded to 4 dp
  then ``str()`` -> ``"3.0"``), so int-vs-float dtype asymmetry fails loudly,
- keeps column sort + order-insensitive row multiset, mirroring the driver's
  row-count + schema + value-hash checks.

NULL semantics: pandas cannot distinguish SQL NULL from NaN inside a float64
column — both engines coerce NULL -> NaN there symmetrically, so NaN canons
to "NaN" on both sides. None / NaT (object and datetime columns) canon to
None.
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd


def _canon_cell(v):
    """Canonical string form of one cell (None for SQL NULL)."""
    if v is None or v is pd.NaT:
        return None
    if isinstance(v, (bool, np.bool_)):
        return str(bool(v))
    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, np.floating):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # -0.0 + 0.0 == +0.0 in IEEE round-to-nearest-even, so the fold below
        # normalizes a rounded -0.0 identically on both engines; real negative
        # values are unaffected.
        return str(round(v, 4) + 0.0)
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        v = v.to_pydatetime()
    if isinstance(v, datetime.datetime):
        # DuckDB .df() returns DATE columns as datetime64 (midnight); Spark
        # toPandas keeps datetime.date objects. Driver rounds r1/r2 prove the
        # driver treats these as equal (q14/q15/q22... all green), so fold
        # exact-midnight timestamps to the date form on both sides.
        v = v.replace(tzinfo=None)
        if (v.hour, v.minute, v.second, v.microsecond) == (0, 0, 0, 0):
            return v.date().isoformat()
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        # The driver's pandas canonicalizer cannot hash list cells (CLAUDE.md);
        # oracle-checked outputs must be scalar-only. Tolerated here for
        # rows-only uses of canon_spark in tests.
        return tuple(_canon_cell(x) for x in v)
    return str(v)


def _canon_pdf(pdf: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    order = sorted(range(len(pdf.columns)), key=lambda i: str(pdf.columns[i]))
    cols = [str(pdf.columns[i]) for i in order]
    raw = pdf.iloc[:, order]
    rows = [
        tuple(_canon_cell(x) for x in tup)
        for tup in raw.itertuples(index=False, name=None)
    ]
    rows.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return cols, rows


def canon_spark(df) -> tuple[list[str], list[tuple]]:
    return _canon_pdf(df.toPandas())


def canon_duck(con, sql: str) -> tuple[list[str], list[tuple]]:
    return _canon_pdf(con.execute(sql).df())


def assert_matches_oracle(spark_df, con, sql: str, name: str = "?"):
    s_cols, s_rows = canon_spark(spark_df)
    d_cols, d_rows = canon_duck(con, sql)
    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    for i, (a, b) in enumerate(zip(s_rows, d_rows)):
        assert a == b, f"{name}: row {i} differs:\n  spark={a}\n  duck ={b}"
