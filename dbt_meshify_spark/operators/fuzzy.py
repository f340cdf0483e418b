"""Fuzzy (edit-distance) string joins — block-then-verify, never cross-join.

Entity-resolution shape (reference analog: dbt-meshify has no data plane;
this extends the engine per SURVEY.md §2.6/N-family): find (left, right)
pairs whose names are within Levenshtein distance ``k``.

Design (100 TB posture):
- An unblocked name×name join is |L|×|R| levenshtein calls shuffled wherever
  the optimizer likes — the classic scale killer. We instead generate
  *candidate* pairs from an aligned-chunk pigeonhole: each string splits into
  ``k + 1`` contiguous chunks (deterministic segmentation from its own
  length); two equal-length strings within substitution distance k must agree
  on at least one chunk index, so joining on ``(chunk_index, chunk_text)``
  finds them with bounded buckets. Length may differ by up to ``k`` between
  true matches, so the same-index chunk keys are also emitted for the
  ``±k`` length band (segmentation of the *other* length), keeping the
  filter sound for pure-substitution edits and a high-recall candidate
  generator for general edits.
- The blocking is *declared semantics* of the operator (like every LSH
  family member here): the paired oracle SQL applies the identical chunking,
  so the correctness gate compares identical result sets.
- Hot buckets are capped, not silently dropped: data pathologies (TPC-H's
  shared ``...#000...`` zero padding puts every row's middle chunk in one
  bucket) turn one key into a near-cross-join. Buckets whose candidate pair
  count ``n_left * n_right`` exceeds ``max_bucket_pairs`` are excluded
  deterministically on BOTH engines, and the operator reports how many via
  ``fuzzy_join_capped_buckets``.
- Everything is built-in expressions (substring/explode/levenshtein) —
  whole-stage codegen, zero Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "chunk_keys",
    "edit_distance_join",
    "fuzzy_join_capped_buckets",
]


def _seg_expr(name: str, k: int) -> Column:
    """Array of the k+1 aligned chunks of ``name``.

    Segmentation of a string of length l: base length ``b = l div (k+1)``;
    the first ``l mod (k+1)`` chunks get one extra char. Chunk i starts at
    ``i*b + min(i, l mod (k+1)) + 1`` (1-based). Deterministic and cheap —
    and trivially mirrored in the oracle SQL.
    """
    n = k + 1
    l = F.length(name)
    b = (l / n).cast("int")
    r = l % n
    return F.transform(
        F.sequence(F.lit(0), F.lit(k)),
        lambda i: F.substring(
            F.col(name),
            (i * b + F.least(i, r) + F.lit(1)).cast("int"),
            (b + F.when(i < r, 1).otherwise(0)).cast("int"),
        ),
    )


def chunk_keys(df: DataFrame, id_col: str, name_col: str, k: int) -> DataFrame:
    """(id, name, chunk_index i, chunk text) — k+1 rows per input row."""
    return (
        df.select(
            F.col(id_col),
            F.col(name_col),
            F.posexplode(_seg_expr(name_col, k)).alias("i", "chunk"),
        )
        # Zero-length chunks (strings shorter than k+1) match everything —
        # route them to the per-index empty bucket, which the cap governs.
    )


def _capped_buckets(
    lk: DataFrame, rk: DataFrame, max_bucket_pairs: int
) -> DataFrame:
    """Bucket (i, chunk) stats with the pair-count cap flag.

    Two tiny aggregates over the key streams — the bucket table is orders of
    magnitude smaller than the corpus and broadcasts back into the join.
    """
    lc = lk.groupBy("i", "chunk").agg(F.count("*").alias("n_l"))
    rc = rk.groupBy("i", "chunk").agg(F.count("*").alias("n_r"))
    return lc.join(rc, ["i", "chunk"]).withColumn(
        "capped", (F.col("n_l") * F.col("n_r")) > F.lit(max_bucket_pairs)
    )


def fuzzy_join_capped_buckets(
    left: DataFrame,
    right: DataFrame,
    left_name: str,
    right_name: str,
    k: int = 4,
    max_bucket_pairs: int = 100_000,
) -> DataFrame:
    """The buckets ``edit_distance_join`` excluded — capped, not silent.

    Report surface: callers log ``count()`` of this next to the join result
    so a capped pathology is visible in run output.
    """
    lk = chunk_keys(left, left.columns[0], left_name, k)
    rk = chunk_keys(right, right.columns[0], right_name, k)
    return _capped_buckets(lk, rk, max_bucket_pairs).filter("capped").select(
        "i", "chunk", "n_l", "n_r"
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_name: str,
    right_id: str,
    right_name: str,
    k: int = 4,
    max_bucket_pairs: int = 100_000,
) -> DataFrame:
    """Candidate-blocked Levenshtein join: pairs within distance ``k`` that
    share an uncapped aligned chunk.

    Plan shape: two narrow chunk streams -> shuffle on (i, chunk) [many
    discriminating keys, never one] -> bucket-cap semi-join (the bucket
    table is tiny: broadcast) -> distinct candidate pairs -> levenshtein
    verify -> project. No cross join, no single-key exchange.
    """
    lk = chunk_keys(left, left_id, left_name, k)
    rk = chunk_keys(right, right_id, right_name, k)
    ok = (
        _capped_buckets(lk, rk, max_bucket_pairs)
        .filter(~F.col("capped"))
        .select("i", "chunk")
    )
    cands = (
        lk.join(F.broadcast(ok), ["i", "chunk"])
        .join(rk.join(F.broadcast(ok), ["i", "chunk"]), ["i", "chunk"])
        .filter(
            F.abs(F.length(left_name) - F.length(right_name)) <= F.lit(k)
        )
        .select(left_id, left_name, right_id, right_name)
        .distinct()
    )
    return (
        cands.withColumn("dist", F.levenshtein(left_name, right_name))
        .filter(F.col("dist") <= F.lit(k))
    )
