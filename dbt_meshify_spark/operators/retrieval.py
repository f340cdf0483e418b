"""Hybrid retrieval (N3/N4): reciprocal-rank fusion of a lexical (BM25) and
a semantic (cosine) ranking — the standard RAG retrieval stack.

RRF (Cormack et al. 2009): ``score(d) = Σ_r 1/(k + rank_r(d))`` over the
rankings that contain ``d``; documents absent from a ranking simply
contribute nothing for it. ``k = 60`` is the published default and damps
the head of each list so neither ranker dominates.

Plan shape at 100 TB: each ranking is produced by its own scale-path
operator (``text.bm25_scores`` never shuffles the full token stream;
``similarity.cosine_topk``/LSH/IVF bound the pair space), and the fusion
itself is a FULL OUTER equi-join of two (doc, rank) frames — both already
reduced to candidate lists, orders of magnitude smaller than the corpus —
followed by one top-k. The corpus text and embeddings never meet in a join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rrf_fuse(
    lexical: DataFrame,
    semantic: DataFrame,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
    top_n: int | None = None,
) -> DataFrame:
    """Fuse two (id, rank) frames with reciprocal-rank fusion.

    Inputs carry one row per candidate with its 1-based rank in that
    ranking. Output: id, lex_rank, sem_rank (NULL when absent from that
    list), ``rrf_score``, and the fused ``fused_rank``; optionally truncated
    to ``top_n``. Ties in rrf_score break on the id — deterministic.
    """
    lex = lexical.select(F.col(id_col), F.col(rank_col).alias("lex_rank"))
    sem = semantic.select(F.col(id_col), F.col(rank_col).alias("sem_rank"))
    fused = lex.join(sem, id_col, "full_outer").withColumn(
        "rrf_score",
        F.round(
            F.coalesce(1.0 / (F.lit(k) + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (F.lit(k) + F.col("sem_rank")), F.lit(0.0)),
            6,
        ),
    )
    w = Window.orderBy(F.col("rrf_score").desc(), F.col(id_col).asc())
    # the fused frame is candidate-sized (≤ |list1| + |list2|, thousands at
    # most) — the global rank window over it is bounded, not corpus-scale
    fused = fused.withColumn("fused_rank", F.row_number().over(w))
    if top_n is not None:
        fused = fused.filter(F.col("fused_rank") <= top_n)
    return fused.select(
        id_col, "lex_rank", "sem_rank", "rrf_score", "fused_rank"
    )


def rank_by(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    top_n: int | None = None,
) -> DataFrame:
    """Attach a dense 1-based ``rank`` by descending score (id tiebreak) —
    the adapter that turns a scored frame (bm25, cos_sim, quality) into an
    RRF input. The frame is expected to be candidate-sized; for corpus-sized
    inputs cut with a top-k operator first."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    ranked = df.withColumn("rank", F.row_number().over(w))
    if top_n is not None:
        ranked = ranked.filter(F.col("rank") <= top_n)
    return ranked
