"""Corpus snapshot diffing (N9): what changed between two dataset versions.

Continuous-curation pipelines re-crawl and re-filter; before retraining you
want the delta — which documents appeared, vanished, or changed content —
both as an audit artifact (dataset cards, eval-drift analysis) and as the
input to incremental downstream passes (only `added`/`changed` docs need
re-scoring, re-embedding, near-dup probing).

Plan shape at 100 TB: each side reduces to (id, fingerprint) projections —
the text never shuffles; the diff is one equi-join on the id (both sides
shuffle-partitioned by the same key, so co-partitioned layouts via
``sources/bucketing.py`` make it exchange-free). Full-outer semantics via a
single join, not two anti-joins — one pass instead of three.

Complements ``sources/lakehouse.py::read_table_version`` (time-travel reads
of the engine's own incremental tables): this diffs ANY two document frames
regardless of provenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    include_unchanged: bool = False,
) -> DataFrame:
    """Row-level diff of two corpus snapshots keyed on ``id_col``.

    Returns (id, status, fp_old, fp_new) with status in
    ``added | removed | changed`` (+ ``unchanged`` when requested).
    Content identity is the md5 of the text — the same fingerprint family
    as ``operators.dedup.exact_dedup``, so a doc counts as `changed` only
    when its bytes changed, not when row order or file layout did.
    """
    # presence is tracked explicitly — a document with NULL text has a NULL
    # fingerprint, and inferring presence from fingerprint nullness would
    # misreport it as added/removed (caught by the nasty-input suite)
    o = old.select(
        F.col(id_col),
        F.md5(F.col(text_col).cast("string")).alias("fp_old"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col),
        F.md5(F.col(text_col).cast("string")).alias("fp_new"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("fp_old").eqNullSafe(F.col("fp_new")), F.lit("changed")
        )
        .otherwise(F.lit("unchanged"))
    )
    out = joined.withColumn("status", status)
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out.select(id_col, "status", "fp_old", "fp_new")


def diff_summary(diff: DataFrame) -> DataFrame:
    """Per-status row counts of a :func:`snapshot_diff` frame — the one-line
    audit row a dataset card embeds."""
    return diff.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
