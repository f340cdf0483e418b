"""Domain-level corpus curation (N4/N9): per-source stats and quality-ranked
domain filtering.

Web-scale pipelines (C4, RefinedWeb) curate at the DOMAIN grain before the
document grain: aggregate quality per domain, keep the trustworthy domains,
drop everything from the rest. The `documents.source` column is the domain
key here.

Plan shape at 100 TB: the domain aggregate is a partial-agg-friendly groupBy
on a low-cardinality key (domains << documents), so the stats frame is tiny;
the keep-set joins back to the corpus as a broadcast equi-join — the corpus
itself is never shuffled. The rank window runs over the tiny stats frame
only, never over documents.

No reference analog (dbt-meshify has no text plane); the operator mirrors
the published C4/RefinedWeb curation recipe re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_meshify_spark.operators.text import quality_score


def domain_stats(
    df: DataFrame, domain_col: str = "source", text_col: str = "text"
) -> DataFrame:
    """Per-domain aggregate: doc count, total chars, mean doc quality
    (``operators.text.quality_score`` composite, already rounded 4dp per doc;
    the mean is rounded again to 4dp)."""
    scored = quality_score(df, text_col=text_col)
    return scored.groupBy(domain_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(F.length(F.col(text_col))).cast("bigint").alias("total_chars"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
    )


def filter_top_domains(
    df: DataFrame,
    top_k: int,
    domain_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Keep only documents from the ``top_k`` domains by mean quality
    (ties break on domain name ascending — deterministic).

    Returns the surviving documents with their domain's rank and mean
    quality attached. The top-k cut is an ``orderBy().limit(k)`` —
    planned as TakeOrderedAndProject, partial top-k per partition then a
    k-row merge — so even a web-scale domain frame (millions of hosts)
    never funnels through one task; the rank window runs over the k
    surviving rows only.
    """
    stats = domain_stats(df, domain_col=domain_col, text_col=text_col)
    order = [F.col("avg_quality").desc(), F.col(domain_col).asc()]
    w = Window.orderBy(*order)
    kept = (
        stats.orderBy(*order)
        .limit(top_k)
        .withColumn("domain_rank", F.row_number().over(w))
        .select(domain_col, "domain_rank", "avg_quality")
    )
    return df.join(F.broadcast(kept), domain_col)


def calibrate_scores(
    df: DataFrame,
    score_col: str = "quality",
    domain_col: str = "source",
    out_col: str = "score_pct",
) -> DataFrame:
    """Per-domain percentile calibration of a score column: replace the raw
    score with its percent-rank WITHIN its domain, so a fixed global
    threshold (e.g. "keep the top 30%") selects the same fraction from every
    domain — raw score distributions differ wildly across sources (a
    quality model scores encyclopedia prose higher than forum text
    everywhere), and an uncalibrated global cut silently drops entire
    domains.

    Exact tier: one window per domain partition (ties share a rank, so the
    result is deterministic without a tiebreaker). At extreme per-domain
    cardinality swap in the approx tier: per-domain approxQuantile
    thresholds broadcast back — same posture as ``keep_top_fraction``.
    """
    w = Window.partitionBy(domain_col).orderBy(F.col(score_col).asc())
    return df.withColumn(out_col, F.round(F.percent_rank().over(w), 4))
