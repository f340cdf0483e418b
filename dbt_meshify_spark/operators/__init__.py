"""Data-plane operator library (SURVEY.md §2.3 + §2.6).

Relational semantics come free from the DataFrame API; this package holds the
operators Spark lacks as built-ins — dedup families, similarity search, text
analysis, multimodal plumbing, time spines — each written Catalyst-friendly
(higher-order array functions and joins, no row-at-a-time Python in hot
paths).
"""

from dbt_meshify_spark.operators.dedup import (
    exact_dedup,
    incremental_neardup_pairs,
    minhash_candidate_pairs,
    minhash_index,
    minhash_signatures,
    ngram_containment_pairs,
    ngram_jaccard_pairs,
    winnow_fingerprints,
    winnow_overlap_pairs,
    simhash,
    simhash_candidate_pairs,
)
from dbt_meshify_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
    lsh_bucketed_topk,
)
from dbt_meshify_spark.operators.text import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from dbt_meshify_spark.operators.timespine import date_spine

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_candidate_pairs",
    "minhash_index",
    "incremental_neardup_pairs",
    "simhash",
    "simhash_candidate_pairs",
    "ngram_containment_pairs",
    "ngram_jaccard_pairs",
    "winnow_fingerprints",
    "winnow_overlap_pairs",
    "cosine_topk",
    "lsh_bucketed_topk",
    "embedding_neardup_pairs",
    "token_stats",
    "language_id",
    "quality_score",
    "doc_fingerprint",
    "date_spine",
]
