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

from pyspark.sql import DataFrame
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
