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
