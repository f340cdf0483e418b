"""End-to-end corpus curation: the composed training-data pipeline.

One declarative DataFrame program chaining the cheap deterministic tiers in
their canonical order (C4/RefinedWeb shape):

    normalize → language-ID → quality filter → exact dedup → decontaminate

Composition is the point: every stage is a column projection or one bounded
shuffle, Catalyst fuses the projections into the scan, and the whole
pipeline is a single job with exactly two wide dependencies (the dedup
window and the decontamination gram aggregate). At 100 TB this is the
difference between five materialized passes over the corpus and one.

Every stage is SQL-expressible, so the full composition is oracle-checked
end-to-end (ext_curation_pipeline) — not just per-stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dbt_meshify_spark.operators.decontam import decontaminate
from dbt_meshify_spark.operators.dedup import exact_dedup
from dbt_meshify_spark.operators.text import language_id, normalize_text, quality_score


def curate_corpus(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    quality_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curated training subset of ``docs``; schema: input columns plus
    ``text_norm``, ``n_chars_norm``, ``lang_pred``, quality features.

    Stages (all deterministic):
    1. ``normalize_text`` — canonical lowercase/whitespace form (projection).
    2. ``language_id`` — marker-word argmax; drop ``'und'`` (projection).
    3. ``quality_score`` — composite in [0,1]; keep ``>= quality_min``
       (projection). Filters run BEFORE any shuffle, so the expensive
       stages only see survivors.
    4. ``exact_dedup`` on the normalized text, keep-lowest-id (one shuffle).
    5. ``decontaminate`` against ``eval_df`` trigrams (broadcast gram set,
       ids-only anti-join — the corpus text never shuffles).
    """
    staged = quality_score(language_id(normalize_text(docs, text_col), text_col))
    kept = staged.filter(
        (F.col("lang_pred") != "und") & (F.col("quality") >= quality_min)
    )
    deduped = exact_dedup(kept, ["text_norm"], order_by=[id_col])
    if eval_df is None:
        return deduped
    # Contamination is a per-document verdict (a doc's eval-gram overlap
    # does not depend on other docs), so compute it on the PRE-dedup
    # lineage: the expensive dedup window then appears exactly once in the
    # final plan (the anti-join's left side) instead of twice — Spark would
    # otherwise recompute the window for the overlap branch, since branch
    # reuse only kicks in at identical exchanges.
    from dbt_meshify_spark.operators.decontam import ngram_overlap

    bad = ngram_overlap(kept, eval_df, id_col=id_col, text_col=text_col).filter(
        F.col("contaminated")
    )
    return deduped.join(bad.select(id_col), id_col, "left_anti")


def curation_report(
    docs: DataFrame,
    eval_df: DataFrame | None = None,
    quality_min: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Drop-reason attribution for :func:`curate_corpus`: one row per INPUT
    document labeling the FIRST pipeline stage that rejected it —
    ``malformed | language | quality | duplicate | contaminated | kept`` —
    the audit trail a dataset card publishes ("what did each filter cost
    us") and the debugging surface for threshold tuning.

    Same stage math and order as the pipeline; attribution is first-fail,
    so a contaminated near-copy reports ``duplicate`` (stage 4 precedes
    stage 5), and contamination is only evaluated for dedup survivors —
    exactly the work the real pipeline performs. Plan shape: the staged
    projection runs once; dedup ranks and contamination verdicts are
    ids-only marker frames left-joined back, so the corpus text appears in
    one scan and the report costs the pipeline's own two wide deps plus
    keys-only joins.
    """
    # staged is referenced by three branches (markers, dedup rank,
    # contamination) and its regex-heavy projection is worth sharing —
    # persist() keeps the recompute LINEAGE (an evicted/lost block is
    # rebuilt, unlike localCheckpoint's unrecoverable executor-local
    # blocks) while caching the common subtree (measured 3x on the report
    # query vs recomputing per branch)
    from pyspark.storagelevel import StorageLevel

    staged = quality_score(
        language_id(normalize_text(docs, text_col), text_col)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    malformed = F.col("lang_pred").isNull() | F.col("quality").isNull()
    kept_cond = (
        (F.col("lang_pred") != "und") & (F.col("quality") >= quality_min)
    )
    kept = staged.filter(~malformed & kept_cond)
    w = Window.partitionBy("text_norm").orderBy(id_col)
    # ids-only pin (optimization r14): the dedup-rank window has TWO
    # consumers (duplicate markers and the rn=1 survivor filter) —
    # unpinned, the text_norm-keyed Exchange+Sort+Window executed once
    # per branch. The pin carries (id, rn) only, never text.
    ranked = (
        kept.select(id_col, "text_norm")
        .withColumn("rn", F.row_number().over(w))
        .select(id_col, "rn")
        .localCheckpoint(eager=False)
    )
    dup_ids = ranked.filter(F.col("rn") > 1).select(
        id_col, F.lit(True).alias("__dup")
    )
    markers = staged.select(id_col, "lang_pred", "quality").join(
        dup_ids, id_col, "left"
    )
    if eval_df is not None:
        from dbt_meshify_spark.operators.decontam import ngram_overlap

        survivors = kept.join(
            ranked.filter(F.col("rn") == 1).select(id_col), id_col
        )
        bad = (
            ngram_overlap(survivors, eval_df, id_col=id_col, text_col=text_col)
            .filter(F.col("contaminated"))
            .select(id_col, F.lit(True).alias("__bad"))
        )
        markers = markers.join(bad, id_col, "left")
    else:
        markers = markers.withColumn("__bad", F.lit(None).cast("boolean"))
    reason = (
        F.when(malformed, F.lit("malformed"))
        .when(F.col("lang_pred") == "und", F.lit("language"))
        .when(F.col("quality") < quality_min, F.lit("quality"))
        .when(F.col("__dup"), F.lit("duplicate"))
        .when(F.col("__bad"), F.lit("contaminated"))
        .otherwise(F.lit("kept"))
    )
    return markers.select(
        F.col(id_col), reason.alias("drop_reason"), "lang_pred", "quality"
    )


def curation_funnel(report: DataFrame) -> DataFrame:
    """Stage-level counts of a :func:`curation_report` frame — the funnel
    summary row a dataset card embeds."""
    return report.groupBy("drop_reason").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


def training_build_frames(docs: DataFrame, pin_scored: bool = False):
    """The flagship training-data build's shared staging — ONE definition
    consumed by both ``ext_training_data_build`` (the declared query) and
    the dataset-card stage-timing table, so the card can never drift from
    the pipeline it documents.

    Returns ``(kept, scored, sharded)``:

    - ``kept``: curation survivors (normalize -> lang-ID -> quality ->
      exact dedup -> decontaminate vs the held-out 1/20 eval slice),
      localCheckpoint-pinned — BOTH the DSIR branch and the size join
      consume it, and unpinned the full curation plan (dedup window +
      decontam anti-join) would execute once per consumer;
    - ``scored``: DSIR importance weights toward the ``en`` slice,
      rounded to 4 dp with the ``+ 0.0`` -0.0 guard (the ordering the
      budget fill uses — keep the round HERE so every consumer fills the
      budget identically);
    - ``sharded``: best-first fill to a 60k-char budget (two-phase
      running total) + deterministic 8-way shard assignment.
    """
    from dbt_meshify_spark.operators.dsir import dsir_log_weights
    from dbt_meshify_spark.operators.sampling import (
        select_to_token_budget,
        shard_assignment,
    )

    eval_df = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    kept = (
        curate_corpus(train, eval_df)
        .select("doc_id", "text", "n_chars_norm")
        .localCheckpoint(eager=False)
    )
    scored = dsir_log_weights(
        kept.join(docs.select("doc_id", "lang"), "doc_id").withColumn(
            "is_target", F.col("lang") == "en"
        ),
        "is_target",
        num_buckets=1024,
    ).withColumn("dsir_logw", F.round("dsir_logw", 4) + F.lit(0.0))
    if pin_scored:
        # the dataset-card times each stage with a count() action; unpinned,
        # the stage-3 count re-executes the whole DSIR lineage and folds
        # stage 2's wall into stage 3's row. The declared query leaves this
        # off (one action, Catalyst reuses nothing across separate runs).
        scored = scored.localCheckpoint(eager=False)
    sized = kept.select("doc_id", "n_chars_norm").join(scored, "doc_id")
    picked = select_to_token_budget(
        sized,
        budget=60_000,
        token_col="n_chars_norm",
        order_by=[F.col("dsir_logw").desc(), F.col("doc_id").asc()],
    )
    sharded = shard_assignment(picked, ["doc_id"], n_shards=8)
    return kept, scored, sharded
