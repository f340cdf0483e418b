"""Benchmark decontamination: word n-gram overlap between a training corpus
and an evaluation set.

The reference (dbt-meshify) has no decontamination surface — this is a
north-star extension per BASELINE.json ("LLM-data-pipeline operators ...
designed for 100 TB scale"), following the published n-gram decontamination
recipe (GPT-3 appendix C / Gopher appendix A): a training document is
*contaminated* when at least ``min_overlap`` of its distinct word n-grams
also appear anywhere in the evaluation set.

Scale design (100 TB posture):
- The eval side is a benchmark suite — thousands of documents, at most a few
  million distinct grams — so its distinct-gram set is **broadcast**; the
  100 TB train side is never shuffled on text. Each train partition streams
  once through shingle -> explode -> broadcast hash join.
- The only shuffle is the per-document (id) count aggregation, which is
  partial-aggregated map-side (counts, not grams, cross the wire).
- Shingling is the same pure-array JVM path as dedup (no Python per row);
  token arrays are staged as real columns first (see
  ``dedup.shingles_of_tokens`` for the lambda-CSE pitfall).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_meshify_spark.operators.dedup import _with_tokens, shingles_of_tokens


def eval_gram_set(eval_df: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Distinct word n-grams of the evaluation set (one column ``gram``).

    Small by construction (benchmarks, not corpora); callers broadcast it.
    """
    return (
        _with_tokens(eval_df.select(text_col), text_col)
        .select(F.explode(shingles_of_tokens(F.col("__toks"), n)).alias("gram"))
        .distinct()
    )


def ngram_overlap(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: float = 0.2,
) -> DataFrame:
    """Per-train-document eval-overlap fraction and contamination flag.

    Returns ``id_col, n_grams, matched, overlap, contaminated`` where
    ``overlap = matched / n_grams`` over the document's *distinct* n-grams
    (distinctness makes the metric insensitive to within-doc repetition).
    Documents with fewer than ``n`` tokens have ``n_grams = 0`` and count as
    clean (overlap 0.0).
    """
    evals = F.broadcast(eval_gram_set(eval_df, text_col, n).withColumn("__hit", F.lit(1)))
    grams = (
        _with_tokens(train_df.select(id_col, text_col), text_col)
        .withColumn("__grams", shingles_of_tokens(F.col("__toks"), n))
        .select(
            F.col(id_col),
            F.size("__grams").cast("long").alias("n_grams"),
            F.explode_outer("__grams").alias("gram"),
        )
    )
    agg = (
        grams.join(evals, "gram", "left")
        .groupBy(id_col, "n_grams")
        .agg(F.coalesce(F.sum("__hit"), F.lit(0)).cast("long").alias("matched"))
    )
    overlap = F.when(
        F.col("n_grams") > 0, F.col("matched").cast("double") / F.col("n_grams")
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        "n_grams",
        "matched",
        F.round(overlap, 4).alias("overlap"),
        (overlap >= F.lit(min_overlap)).alias("contaminated"),
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_overlap: float = 0.2,
) -> DataFrame:
    """Drop contaminated training documents; schema of ``train_df`` kept.

    Implemented as an anti-join on the contaminated id set (ids only cross
    the shuffle, never text payloads).
    """
    bad = ngram_overlap(train_df, eval_df, id_col, text_col, n, min_overlap).filter(
        F.col("contaminated")
    )
    return train_df.join(bad.select(id_col), id_col, "left_anti")


def contaminated_spans(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 13,
) -> DataFrame:
    """Maximal eval-overlapping token spans per training document — the
    surgical tier of decontamination: instead of dropping a whole document
    whose gram overlap crosses a threshold, locate the exact regions that
    appear verbatim in the eval set (the published exact-substring
    decontamination recipe uses 13-gram spans).

    Same machinery as internal substring dedup (``dedup.merge_span_hits``):
    eval shingles broadcast as an 8-byte hash set, train shingle positions
    probe it, overlapping hits merge into maximal spans. The train corpus
    never shuffles on text. Returns ``id_col, span_start, span_end
    (exclusive, 1-based token indices), n_shingles``.
    """
    from dbt_meshify_spark.operators.dedup import merge_span_hits

    evals = F.broadcast(
        eval_gram_set(eval_df, text_col, span_tokens)
        .select(F.xxhash64("gram").alias("__gh"))
        .distinct()
    )
    pos = (
        _with_tokens(train_df.select(id_col, text_col), text_col)
        .withColumn(
            "__grams",
            shingles_of_tokens(F.col("__toks"), span_tokens, distinct=False),
        )
        .select(F.col(id_col), F.posexplode("__grams").alias("__p", "__gram"))
        .select(
            F.col(id_col),
            (F.col("__p") + 1).cast("bigint").alias("start_tok"),
            F.xxhash64("__gram").alias("__gh"),
        )
    )
    hits = pos.join(evals, "__gh").select(id_col, "start_tok")
    return merge_span_hits(hits, id_col, span_tokens)


def remove_contaminated_spans(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    span_tokens: int = 13,
) -> DataFrame:
    """Cut every eval-overlapping span out of the training text (keep the
    document, lose the leaked benchmark content) — the removal counterpart
    of :func:`decontaminate`'s drop policy. Returns
    ``id_col, clean_text, n_tokens_kept, n_tokens_removed``.
    """
    from dbt_meshify_spark.operators.dedup import cut_spans_from_text

    spans = contaminated_spans(train_df, eval_df, id_col, text_col, span_tokens)
    return cut_spans_from_text(train_df, spans, id_col=id_col, text_col=text_col)


def semantic_contamination(
    corpus: DataFrame,
    eval_vecs: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic (embedding-level) benchmark decontamination: flag corpus
    items whose max cosine against ANY eval-set vector clears
    ``threshold`` — the paraphrase/translation leakage tier that n-gram
    decontamination (:func:`decontaminate`) structurally misses (reworded
    eval questions share no 13-gram).

    Returns every corpus row's verdict — ``id, max_eval_cos,
    contaminated`` — so the gate COUNTS its rejects (join back and filter
    on the flag to drop, mirroring the lexical tier's contract).

    Scale shape: the eval side is bounded by construction (benchmarks are
    thousands of rows, not billions) and broadcasts pre-normalized; the
    corpus streams through the join and the only shuffle carries
    ``(id, cos)`` scalar pairs into the per-id max — vectors never enter
    an Exchange. At extreme eval sizes swap the candidate generator for
    the persisted IVF index over the EVAL set (``ivf_index(eval)`` +
    ``ivf_probe_index(corpus)``) and keep this per-id max/verdict tail:
    the quadratic fan-out disappears into nprobe cell probes.
    """
    from dbt_meshify_spark.operators.similarity import _dot, _unit, spread

    c = spread(corpus).select(
        F.col(id_col).alias("__cid"), _unit(F.col(vec_col)).alias("cv")
    )
    e = eval_vecs.select(
        F.col(id_col).alias("__eid"), _unit(F.col(vec_col)).alias("ev")
    )
    sims = c.crossJoin(F.broadcast(e)).select(
        "__cid", _dot(F.col("cv"), F.col("ev")).alias("cos")
    )
    verdict = sims.groupBy("__cid").agg(
        F.round(F.max("cos"), 4).alias("max_eval_cos")
    )
    return verdict.select(
        F.col("__cid").alias(id_col),
        "max_eval_cos",
        (F.col("max_eval_cos") >= F.lit(float(threshold))).alias("contaminated"),
    )
