"""Model-based quality filtering: a logistic classifier over cheap text
features (the FineWeb-Edu posture scaled down to what this container holds).

Division of labor — same as the IVF quantizer and BPE trainer:
- **Training is driver-side on a bounded deterministic sample.** Web-scale
  quality classifiers train on thousands of labeled examples, not the
  corpus; full-batch gradient descent in float64 numpy with a fixed
  iteration count is bit-deterministic run-to-run.
- **Scoring is pure column arithmetic.** The learned weights become
  literals in a sigmoid expression — whole-stage codegen, no UDF, no
  shuffle; at 100 TB the classifier adds zero cost beyond the scan it
  shares with the rest of the curation pipeline.

Labels default to a heuristic teacher (``quality_score >= threshold``), i.e.
the smooth model distills the rule tier; callers with real labels pass their
own labeled frame.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_meshify_spark.operators.text import _occurrences

FEATURE_NAMES = ["len_norm", "punct_density", "stop_ratio", "tok_len_norm"]


def feature_cols(text_col: str = "text") -> dict[str, Column]:
    """The classifier's feature map, shared verbatim between training-sample
    extraction and corpus-wide scoring (skew here would be train/serve skew).
    All bounded to [0, 1]; same primitives as text.py::quality_score."""
    text = F.col(text_col)
    toks = F.split(F.trim(text), r"\s+")
    n_toks = F.greatest(F.size(toks), F.lit(1))
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    stop_hits = sum(
        [_occurrences(text, w) for w in ("a", "and", "of")],
        _occurrences(text, "the"),
    )
    mean_tok_len = (n_chars - (F.size(toks) - 1)) / n_toks
    return {
        "len_norm": F.least(n_chars / F.lit(500.0), F.lit(1.0)),
        "punct_density": F.least(punct / F.greatest(n_chars, F.lit(1)) * 10.0, F.lit(1.0)),
        "stop_ratio": F.least(stop_hits / n_toks * 5.0, F.lit(1.0)),
        "tok_len_norm": F.least(mean_tok_len / F.lit(10.0), F.lit(1.0)),
    }


def train_quality_classifier(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    teacher_threshold: float = 0.6,
    sample_max: int = 4096,
    iters: int = 300,
    lr: float = 0.5,
) -> list[float]:
    """Learn logistic weights ``[bias, w_len, w_punct, w_stop, w_tok]``.

    One distributed job: hash-mod sample → features + teacher label computed
    Spark-side (so train features match serve features exactly) → collect
    (bounded: sample_max rows × 5 doubles) → full-batch GD in numpy.
    """
    from dbt_meshify_spark.operators.text import quality_score

    n = docs.count()
    mod = max(1, n // max(sample_max, 1))
    feats = feature_cols(text_col)
    sample = (
        quality_score(
            docs.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0),
            text_col,
        )
        .select(
            F.col(id_col).alias("_id"),
            *[c.alias(name) for name, c in feats.items()],
            (F.col("quality") >= teacher_threshold).cast("double").alias("_y"),
        )
        .collect()
    )
    sample.sort(key=lambda r: r._id)
    x = np.asarray([[1.0] + [r[f] for f in FEATURE_NAMES] for r in sample])
    y = np.asarray([r._y for r in sample])
    w = np.zeros(x.shape[1])
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w)))
        w -= lr * (x.T @ (p - y)) / len(y)
    return [float(v) for v in w]


def score_quality_classifier(
    docs: DataFrame,
    weights: list[float],
    text_col: str = "text",
    out_col: str = "clf_score",
) -> DataFrame:
    """Apply the classifier corpus-wide: sigmoid(w·x) as a codegen'd column
    expression (weights are literals — no UDF, no broadcast, no shuffle)."""
    feats = feature_cols(text_col)
    z = F.lit(weights[0])
    for wi, name in zip(weights[1:], FEATURE_NAMES):
        z = z + F.lit(wi) * feats[name]
    return docs.withColumn(out_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-z)))


# ---------------------------------------------------------------------------
# NB-posterior tier (round 10): corpus-trained linear classifier whose
# TRAINING and inference both replay in the DuckDB oracle. The logistic
# tier above is the accuracy path (distilled, driver-trained, codegen
# sigmoid scoring — rows-only); this integer tier is the hash-checked one:
# per-term Laplace posterior P(positive | term) in integer ten-thousandths
# (w_units = floor(10000 * (pos_c+1) / (pos_c+neg_c+2))), document score =
# round(sum(tf*w_units) / (n_known * 10000), 4) — integer counts and ONE
# final division, so no libm (ln/exp) cross-engine ulp drift anywhere.
# Scale shape: training reduces the corpus to the Zipf-bounded term table
# (top-max_vocab by occurrences); inference is one tokenize pass + a term
# equi-join + one per-doc aggregate. Unknown terms skip (standard OOV),
# tracked via n_known.
# ---------------------------------------------------------------------------

from dbt_meshify_spark.operators.dedup import tokens_col


def train_nb_weights(
    df: DataFrame,
    label_col: str,
    text_col: str = "text",
    max_vocab: int | None = 20_000,
) -> DataFrame:
    """Per-term integer posterior weights from a labeled corpus.

    ``label_col`` is boolean (true = positive class). Returns
    ``(term, pos_c, neg_c, w_units)`` — occurrence counts per class and
    the Laplace posterior in ten-thousandths. One tokenize pass, one
    map-side-combined (term) shuffle; ``max_vocab`` keeps the top-``n``
    terms by total occurrences (ties broken by term — deterministic), the
    bounded-broadcast knob.
    """
    toks = df.select(
        F.col(label_col).cast("boolean").alias("__pos"),
        F.explode(tokens_col(F.col(text_col))).alias("term"),
    ).filter(F.col("term") != "")
    # when/otherwise, not a bare cast: a NULL label must count NEGATIVE on
    # both engines (SQL CASE WHEN NULL falls to ELSE; ~NULL would be a
    # skipped NULL in Spark's sum and diverge)
    counts = toks.groupBy("term").agg(
        F.sum(F.when(F.col("__pos"), 1).otherwise(0))
        .cast("bigint")
        .alias("pos_c"),
        F.sum(F.when(F.col("__pos"), 0).otherwise(1))
        .cast("bigint")
        .alias("neg_c"),
    )
    if max_vocab is not None:
        counts = (
            counts.orderBy(
                (F.col("pos_c") + F.col("neg_c")).desc(),
                F.col("term").asc_nulls_first(),
            )
            .limit(int(max_vocab))
        )
    w = F.floor(
        (F.col("pos_c") + F.lit(1))
        * F.lit(10000)
        / (F.col("pos_c") + F.col("neg_c") + F.lit(2))
    ).cast("bigint")
    return counts.select("term", "pos_c", "neg_c", w.alias("w_units"))


def classify_documents(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """Score every document with the trained weights: tf-weighted mean
    posterior of its KNOWN terms, integer-exact until the one final
    division. Returns ``(id_col, n_tokens, n_known, score, label)``;
    ``label`` derives from the ROUNDED score (the SURVEY §2.7 flag
    discipline). Docs with no known terms score NULL and label false
    (unscorable, surfaced not dropped).
    """
    occ = df.select(
        F.col(id_col), F.explode(tokens_col(F.col(text_col))).alias("term")
    ).filter(F.col("term") != "")
    tf = occ.groupBy(id_col, "term").agg(
        F.count("*").cast("bigint").alias("tf")
    )
    joined = tf.join(weights.select("term", "w_units"), "term", "left")
    agg = joined.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_tokens"),
        F.coalesce(
            F.sum(F.when(F.col("w_units").isNotNull(), F.col("tf"))), F.lit(0)
        )
        .cast("bigint")
        .alias("n_known"),
        F.coalesce(F.sum(F.col("tf") * F.col("w_units")), F.lit(0))
        .cast("bigint")
        .alias("__num"),
    )
    score = F.when(
        F.col("n_known") > 0,
        F.round(
            F.col("__num").cast("double")
            / (F.col("n_known").cast("double") * F.lit(10000.0)),
            4,
        )
        + F.lit(0.0),
    )
    return agg.select(
        id_col,
        "n_tokens",
        "n_known",
        score.alias("score"),
        F.coalesce(score >= F.lit(float(threshold)), F.lit(False)).alias(
            "label"
        ),
    )
