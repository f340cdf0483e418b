"""Skew-resistant per-key operators: salted top-k and salted count-distinct.

Why these exist: a plain ``row_number() OVER (PARTITION BY key ...)`` or
``COUNT(DISTINCT x) GROUP BY key`` shuffles EVERY row of a key into one task.
At 100 TB a hot key (one event_type carrying half the events, one user behind
a bot) turns that task into the job's critical path, or an OOM. Both
operators here bound the per-task input instead:

- ``topk_per_key``: combiner-style. Each input partition keeps its own local
  top-k per key first, so the final per-key shuffle moves at most
  ``k * num_input_partitions`` rows per key — independent of the key's row
  count. Algebraically exact: a row outside some partition's local top-k
  cannot be in the global top-k.
- ``count_distinct_salted``: the first shuffle keys on ``(key,
  hash(value) % buckets)``, splitting a hot key across ``buckets`` tasks;
  distinct values land in exactly one bucket, so summing per-bucket distinct
  counts is exact.

The reference has no analog (it never executes data-plane queries); these
extend SURVEY.md §2.6's 100 TB posture (BASELINE.json north star), same
family as operators/dedup.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_PID = "_skew_pid"
_RN = "_skew_rn"


def topk_per_key(
    df: DataFrame,
    keys: list[str],
    order_cols: list[Column],
    k: int,
    rank_col: str = "rn",
) -> DataFrame:
    """Exact top-k rows per key, skew-safe.

    ``order_cols`` must define a TOTAL order (include a unique tie-break
    column) or the result is nondeterministic — same contract as a bare
    ``row_number``. Two window passes: local per (key, input-partition),
    then global per key over the pruned ≤ k·P survivors.
    """
    local = Window.partitionBy(*keys, _PID).orderBy(*order_cols)
    pruned = (
        df.withColumn(_PID, F.spark_partition_id())
        .withColumn(_RN, F.row_number().over(local))
        .filter(F.col(_RN) <= k)
        .drop(_PID, _RN)
    )
    final = Window.partitionBy(*keys).orderBy(*order_cols)
    return pruned.withColumn(rank_col, F.row_number().over(final)).filter(
        F.col(rank_col) <= k
    )


def count_distinct_salted(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    buckets: int = 64,
    out_col: str | None = None,
) -> DataFrame:
    """Exact ``COUNT(DISTINCT value_col)`` per key, skew-safe.

    NULLs are excluded, matching SQL COUNT(DISTINCT) semantics.
    """
    out = out_col or f"n_distinct_{value_col}"
    salt = F.pmod(F.xxhash64(F.col(value_col)), F.lit(buckets)).alias("_salt")
    per_bucket = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, salt)
        .agg(F.countDistinct(value_col).alias("_pcd"))
    )
    return per_bucket.groupBy(*keys).agg(F.sum("_pcd").alias(out))


def skew_report(
    df: DataFrame, cols: list[str], k: int = 5
) -> DataFrame:
    """Heavy-hitter audit for prospective join/partition keys: for each
    column, the top-``k`` values by row count with their share of the
    relation — the 30-second diagnosis of "which key will straggle this
    join at 100 TB". One combiner-friendly aggregate per column, each
    top-k planned as TakeOrderedAndProject; the total rides a 1-row
    broadcast. NULL is reported like any other value (NULL skew is the
    most common real-world straggler).

    Returns ``column, value (string), n, share, rank``.
    """
    total = df.agg(F.count(F.lit(1)).cast("double").alias("__t"))
    outs = []
    for c in cols:
        cnt = (
            df.groupBy(F.col(c).cast("string").alias("value"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .orderBy(F.col("n").desc(), F.col("value").asc_nulls_first())
            .limit(k)
        )
        w = Window.orderBy(F.col("n").desc(), F.col("value").asc_nulls_first())
        outs.append(
            cnt.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(c).alias("column"),
                "value",
                "n",
                F.round(F.col("n") / F.col("__t"), 4).alias("share"),
                "rank",
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


def concentration_report(
    df: DataFrame, key_col: str, weight_col: str
) -> DataFrame:
    """Corpus concentration audit: Gini coefficient and normalized
    Herfindahl–Hirschman index of ``weight_col`` mass across ``key_col``
    (sources, domains, languages) — the dataset-card diversity numbers
    that flag a "web-scale" corpus that is actually 80% one crawl.

    Gini uses the sorted-rank identity ``G = 2·Σᵢ i·xᵢ / (n·Σx) −
    (n+1)/n`` over weights ranked ascending (ties broken by key for
    determinism); HHI is ``Σ sᵢ² `` over mass shares, normalized to [0,1]
    by ``(hhi − 1/n)/(1 − 1/n)`` (0 = perfectly uniform, 1 = single key).

    Scale shape: one combiner-friendly aggregate reduces the corpus to a
    key-cardinality frame (sources/domains are thousands, not billions);
    the rank window and final fold run on that tiny frame. NULL weights
    count as zero mass; returns one row.
    """
    per_key = df.groupBy(key_col).agg(
        F.sum(F.coalesce(F.col(weight_col), F.lit(0))).cast("double").alias("w")
    )
    w_rank = Window.orderBy(F.col("w").asc(), F.col(key_col).asc())
    ranked = per_key.select("w", F.row_number().over(w_rank).alias("i"))
    # HHI as sum(w^2)/sum(w)^2 (algebraically = sum of squared shares):
    # with integral weights both factors are exact in double, so the
    # rounded result is bit-identical across engines regardless of
    # aggregation order.
    return ranked.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("w").cast("double").alias("total_weight"),
        F.round(
            F.lit(2.0) * F.sum(F.col("i") * F.col("w")) / (F.count(F.lit(1)) * F.sum("w"))
            - (F.count(F.lit(1)) + F.lit(1.0)) / F.count(F.lit(1)),
            4,
        ).alias("gini"),
        F.round(
            (
                F.sum(F.col("w") * F.col("w")) / (F.sum("w") * F.sum("w"))
                - F.lit(1.0) / F.count(F.lit(1))
            )
            / (F.lit(1.0) - F.lit(1.0) / F.count(F.lit(1))),
            4,
        ).alias("hhi_norm"),
    )
