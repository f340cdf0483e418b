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


def score_psi(
    old: DataFrame,
    new: DataFrame,
    score_col: str,
    n_buckets: int = 10,
    smoothing: float = 0.5,
) -> DataFrame:
    """Population Stability Index of a score distribution between two
    corpus snapshots — the standard drift alarm for continuous curation
    (quality scores, perplexity, classifier outputs): PSI < 0.1 stable,
    0.1-0.25 moderate shift, > 0.25 retrain/investigate.

    Buckets are fixed-width over the BASELINE snapshot's [min, max]
    (two scalars, one aggregate, broadcast back — no global sort; an
    approx-quantile edge tier is the production variant for heavy-tailed
    scores and composes the same way). New-snapshot scores outside the
    baseline range clamp into the edge buckets. Bucket probabilities get
    add-``smoothing`` Laplace mass so an empty bucket cannot produce
    ln(0). NULL scores are dropped on both sides (a scoreless doc carries
    no distribution mass).

    Returns one row per bucket: ``bucket, n_old, n_new, p_old, p_new,
    psi_term`` plus the repeated ``psi_total`` — per-bucket terms are the
    drill-down a monitoring dashboard wants; the total is the alarm.
    Plan: two scan+aggregate passes (bucket cardinality ``n_buckets``),
    a bucket-spine outer join, all post-aggregate frames driver-sized.
    """
    old = old.filter(F.col(score_col).isNotNull())
    new = new.filter(F.col(score_col).isNotNull())
    edges = old.agg(
        F.min(score_col).cast("double").alias("__lo"),
        F.max(score_col).cast("double").alias("__hi"),
    )

    def bucketed(df: DataFrame, out: str) -> DataFrame:
        width = F.when(
            F.col("__hi") > F.col("__lo"),
            (F.col("__hi") - F.col("__lo")) / F.lit(float(n_buckets)),
        ).otherwise(F.lit(1.0))
        b = F.floor((F.col(score_col).cast("double") - F.col("__lo")) / width)
        clamped = F.greatest(F.lit(0), F.least(b, F.lit(n_buckets - 1)))
        return (
            df.crossJoin(F.broadcast(edges))
            .groupBy(clamped.cast("int").alias("bucket"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    spark = old.sparkSession
    spine = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    cnts = (
        spine.join(bucketed(old, "n_old"), "bucket", "left")
        .join(bucketed(new, "n_new"), "bucket", "left")
        .fillna(0, ["n_old", "n_new"])
    )
    return psi_from_counts(cnts, n_buckets=n_buckets, smoothing=smoothing)


def psi_from_counts(
    cnts: DataFrame, n_buckets: int, smoothing: float = 0.5
) -> DataFrame:
    """PSI relation from an already-bucketed ``(bucket, n_old, n_new)``
    frame — the mergeable core of :func:`score_psi`. Bucket counts are
    ADDITIVE, so partial counts from shards or micro-batches sum into this
    without re-reading scores (the streaming monitor's contract)."""
    tot = cnts.agg(
        F.sum("n_old").cast("double").alias("__to"),
        F.sum("n_new").cast("double").alias("__tn"),
    )
    s = float(smoothing)
    sn = s * n_buckets
    probs = cnts.crossJoin(F.broadcast(tot)).select(
        "bucket",
        F.col("n_old").cast("bigint").alias("n_old"),
        F.col("n_new").cast("bigint").alias("n_new"),
        ((F.col("n_old") + s) / (F.col("__to") + sn)).alias("p_old"),
        ((F.col("n_new") + s) / (F.col("__tn") + sn)).alias("p_new"),
    )
    term = (F.col("p_new") - F.col("p_old")) * F.log(
        F.col("p_new") / F.col("p_old")
    )
    per_bucket = probs.withColumn("psi_term", term)
    total = per_bucket.agg(F.sum("psi_term").alias("psi_total"))
    return per_bucket.crossJoin(F.broadcast(total))


def score_buckets(
    df: DataFrame,
    score_col: str,
    lo: float,
    hi: float,
    n_buckets: int,
    out: str,
) -> DataFrame:
    """Fixed-width bucket counts of ``score_col`` against PRE-COMPUTED
    baseline edges — the per-shard / per-micro-batch half of
    :func:`psi_from_counts` (NULL scores dropped, out-of-range clamped,
    same rules as ``score_psi``)."""
    width = (hi - lo) / float(n_buckets) if hi > lo else 1.0
    b = F.floor((F.col(score_col).cast("double") - F.lit(lo)) / F.lit(width))
    clamped = F.greatest(F.lit(0), F.least(b, F.lit(n_buckets - 1)))
    return (
        df.filter(F.col(score_col).isNotNull())
        .groupBy(clamped.cast("int").alias("bucket"))
        .agg(F.count(F.lit(1)).alias(out))
    )


def embedding_cell_psi(
    old: DataFrame,
    new: DataFrame,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SEMANTIC drift between embedding snapshots: PSI over IVF cell
    occupancy — the topic-mix alarm that per-dimension mean/variance drift
    (``ext_embedding_drift``) misses when means cancel (a new topic
    cluster shifts cell mass, not necessarily any dimension's mean).

    The coarse quantizer trains on the BASELINE only (the frozen yardstick
    — re-training on the union would absorb the drift it is supposed to
    measure); both snapshots map-assign against it (Arrow UDF, centroid
    matrix in the closure, no shuffle) and reduce to ``nlist``-row cell
    counts, which feed the same mergeable :func:`psi_from_counts` core as
    score PSI. Rows-only by design (k-means has no SQL form); invariants
    in tests.
    """
    from dbt_meshify_spark.operators.similarity import (
        assign_cells,
        train_ivf_centroids,
    )

    # NULL embeddings must not reach centroid training either (the sampler
    # collects raw vectors; a NULL row is a TypeError there)
    centroids = train_ivf_centroids(
        old.filter(F.col(vec_col).isNotNull()),
        nlist=nlist,
        id_col=id_col,
        vec_col=vec_col,
    )

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            assign_cells(df.filter(F.col(vec_col).isNotNull()), centroids, vec_col)
            .groupBy(F.col("cell").alias("bucket"))
            .agg(F.count(F.lit(1)).alias(out))
        )

    spark = old.sparkSession
    spine = spark.range(nlist).select(F.col("id").cast("int").alias("bucket"))
    cnts = (
        spine.join(counts(old, "n_old"), "bucket", "left")
        .join(counts(new, "n_new"), "bucket", "left")
        .fillna(0, ["n_old", "n_new"])
    )
    return psi_from_counts(cnts, n_buckets=nlist)


def gram_novelty(
    new_docs: DataFrame,
    reference: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram NOVELTY against a reference corpus: the
    fraction of the doc's distinct n-grams absent from the reference — the
    information-gain signal of continuous curation (a crawl refresh full
    of novelty-0 documents adds nothing the standing corpus lacks, however
    high its quality scores; decontamination answers "does this overlap the
    EVAL set", novelty answers "does this add anything to the TRAIN set").

    Plan: the reference reduces to its DISTINCT gram set (grams only —
    reference text never shuffles); the incoming docs stage per-doc gram
    counts exactly like ``ngram_jaccard_pairs`` and LEFT-join the
    reference grams on the gram key, so seen/unseen resolves in the one
    gram-keyed shuffle and the per-doc fraction is a map-side-combined
    aggregate. No driver collection, no broadcast of anything
    corpus-sized.

    Returns ``id_col, n_grams, n_novel, novelty`` (novelty = n_novel /
    n_grams, 4dp; docs with no grams are omitted, same as the pair ops).
    """
    from dbt_meshify_spark.operators.dedup import _with_tokens, shingles_of_tokens

    ref_grams = (
        _with_tokens(reference.select(text_col), text_col)
        .select(F.explode(shingles_of_tokens(F.col("__toks"), n)).alias("gram"))
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    new_grams = (
        _with_tokens(new_docs.select(id_col, text_col), text_col)
        .select(
            F.col(id_col),
            F.explode(shingles_of_tokens(F.col("__toks"), n)).alias("gram"),
        )
    )
    return (
        new_grams.join(ref_grams, "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            F.sum(F.when(F.col("__seen").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
        )
        .withColumn("novelty", F.round(F.col("n_novel") / F.col("n_grams"), 4))
    )
