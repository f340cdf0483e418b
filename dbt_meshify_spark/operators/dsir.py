"""DSIR — Data Selection via Importance Resampling (N4/N9/N10).

Selects raw-corpus documents that look like a TARGET distribution (e.g. a
curated reference set) by importance weighting in a hashed n-gram feature
space, following the published DSIR recipe (Xie et al., 2023): fit unigram
bucket distributions p_target and p_raw over hashed bigram buckets, score
each document with sum over its bigrams of log(p_target(b)/p_raw(b)), then
resample proportionally to the weight with a deterministic Gumbel top-k.

Everything is aggregates + equi-joins, so the whole pipeline is
shuffle-efficient and oracle-checkable end-to-end:

- the corpus is tokenized ONCE; bigrams are derived inside the token array
  (``zip_with`` over two slices — a pure projection, no positional
  self-join) and reduced immediately to per-(doc, bucket) term frequencies;
- bucket hashing is the repo's md5-prefix form (first 8 hex digits as an
  integer, mod ``num_buckets``), replayable digit-by-digit in any SQL
  engine — the same discipline as ``sampling._md5_uniform``;
- the two bucket-count distributions have AT MOST ``num_buckets`` rows — a
  construction-bounded frame, so the scoring join broadcasts the log-ratio
  table (unlike the bigram LM in ``operators/lm.py``, whose model scales
  with the corpus and must not be broadcast-hinted);
- resampling is Efraimidis–Spirakis-adjacent: Gumbel keys
  ``logw + (-ln(-ln(u)))`` with md5-derived uniforms make the top-k an
  exact sample from softmax(logw) WITHOUT replacement, no RNG state, and
  Spark plans the k-row selection as TakeOrderedAndProject (per-partition
  heap; no global sort).

Plan shape at 100 TB: one tokenize scan, one (doc, bucket) partial-agg
shuffle, one bounded-side broadcast join, one per-doc combine — the corpus
text never shuffles. No reference analog (dbt-meshify has no data plane).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_meshify_spark.operators.lm import _bigrams
from dbt_meshify_spark.operators.sampling import _md5_uniform


def _bucket(gram: Column, num_buckets: int) -> Column:
    """Hash a gram to [0, num_buckets) via the md5-prefix integer form."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
        % F.lit(num_buckets)
    )


def dsir_log_weights(
    df: DataFrame,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_buckets: int = 1024,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR log importance weight over hashed bigram buckets.

    ``target_col`` is a boolean column on ``df`` marking the target
    (reference) slice; the raw distribution is fit on ALL rows, the target
    distribution on the marked subset — the standard in-corpus DSIR setup
    (a separate reference corpus can be unioned in with the flag set).
    Both distributions get add-``smoothing`` smoothing over the
    ``num_buckets``-cell feature space.

    Returns ``(id_col, target_col, n_bigrams, dsir_logw)`` for EVERY input
    row; documents with < 2 tokens have no features and score 0.0 (the
    ratio of two identical uniform priors), not NULL — they are neither
    favored nor penalized.
    """
    toks = df.select(
        F.col(id_col),
        F.col(target_col).alias("__tgt"),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__t"),
    ).filter(F.size("__t") >= 2)

    # one tokenize pass: per-(doc, bucket) tf is the base relation for BOTH
    # distribution fitting and scoring (the lm.py discipline). PINNED
    # (optimization r14): tf has three consuming subtrees in the final
    # plan (the bucket histogram feeds both `tot` and `ratio`, and the
    # scoring join reads tf again) — unpinned, the corpus
    # tokenize+explode+bucket+aggregate executed once per subtree, the
    # same finding the r13 LM-ladder pins fixed. Eager, matching the LM
    # ladder's interleaved A/B (eager beat lazy on every LM tier).
    tf = (
        toks.select(
            F.col(id_col),
            F.col("__tgt"),
            F.explode(_bigrams("__t")).alias("__g"),
        )
        .select(
            F.col(id_col), F.col("__tgt"), _bucket(F.col("__g"), num_buckets).alias("b")
        )
        .groupBy(id_col, "__tgt", "b")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    cnt = tf.groupBy("b").agg(
        F.sum(F.when(F.col("__tgt"), F.col("tf")).otherwise(F.lit(0))).alias("ct"),
        F.sum("tf").alias("cr"),
    )
    tot = cnt.agg(
        F.sum("ct").cast("double").alias("tt"), F.sum("cr").cast("double").alias("tr")
    )
    s = float(smoothing)
    sb = s * num_buckets
    ratio = cnt.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct").cast("double") + s) / (F.col("tt") + sb))
            - F.log((F.col("cr").cast("double") + s) / (F.col("tr") + sb))
        ).alias("lr"),
    )
    # ratio is construction-bounded at num_buckets rows — broadcast is the
    # correct plan regardless of corpus size
    dw = (
        tf.join(F.broadcast(ratio), "b")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("bigint").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("lr")).alias("dsir_logw"),
        )
    )
    # featureless docs (< 2 tokens) come back at 0.0 — keys-only left join
    return (
        df.select(id_col, target_col)
        .join(dw, id_col, "left")
        .select(
            F.col(id_col),
            F.col(target_col),
            F.coalesce(F.col("n_bigrams"), F.lit(0)).cast("bigint").alias("n_bigrams"),
            F.coalesce(F.col("dsir_logw"), F.lit(0.0)).alias("dsir_logw"),
        )
    )


def dsir_resample_k(
    scored: DataFrame,
    k: int,
    id_cols: list[str],
    logw_col: str = "dsir_logw",
    seed: str = "dsir0",
) -> DataFrame:
    """Gumbel top-k resampling: draw ``k`` documents WITHOUT replacement
    with probability proportional to ``exp(logw)`` (softmax over the
    corpus), deterministically.

    The Gumbel-max trick: ``key = logw + g`` with ``g = -ln(-ln(u))`` and
    ``u`` an md5-derived uniform makes argmax(key) an exact softmax draw;
    taking the top k yields a weighted sample without replacement. Working
    in the log domain sidesteps the overflow that ``exp(logw)`` feeding a
    u^(1/w) rank (``weighted_sample_k``) would hit on wide weight ranges.

    Cross-engine note: callers that oracle-check should pass a ROUNDED
    ``logw_col`` — the Gumbel term is engine-replayable (same md5 uniform),
    but an unrounded distributed log-sum differs in summation order across
    engines. Appends ``draw_rank``; the top-k is TakeOrderedAndProject, the
    rank window runs over the k-row result only.
    """
    u = _md5_uniform(id_cols, seed)
    g = -F.log(-F.log(u))
    keyed = scored.withColumn("__gk", F.col(logw_col) + g)
    order = [F.col("__gk").desc()] + [F.col(c).asc() for c in id_cols]
    topk = keyed.orderBy(*order).limit(k)
    rank_w = Window.orderBy(*order)
    return (
        topk.withColumn("draw_rank", F.row_number().over(rank_w))
        .drop("__gk")
    )
