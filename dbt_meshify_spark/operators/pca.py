"""Distributed second-moment statistics + PCA over an embedding column
(N3/N10): covariance via per-partition GEMM partials, eigendecomposition on
the (d x d) driver-side result, projection as a broadcast matrix multiply.

The curation uses: embedding whitening before cosine thresholds, SemDeDup-
style dimensionality reduction, drift monitoring between corpus snapshots
(compare covariance spectra), and compact ANN indexes (project to top-k
components before bucketing).

Plan shape at 100 TB: ONE pass over the vectors for the moments. Each Arrow
batch reduces to a (d*d + d + 1)-float partial — count, sum, X^T X — via
numpy GEMM inside ``mapInPandas`` (the vectorized path; a per-pair SQL
explode would shuffle N*d^2 rows). Partials aggregate with a standard
codegen'd groupBy((i,j)).sum shuffle whose cardinality is d^2, independent
of corpus size. The eigen-solve happens on the d x d matrix driver-side
(bounded, same posture as IVF centroid training), and the projection ships
the k x d matrix back inside an Arrow-batched pandas UDF closure — the
corpus never shuffles at any point. ``pca_project`` is exactly TWO corpus
passes: moments, then projection (mean/count/d all come out of the moments
collect — no extra first()/aggregate jobs).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dbt_meshify_spark.operators.util import spread

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("sxx", T.DoubleType()),  # sum of x_i * x_j
        T.StructField("sx_i", T.DoubleType()),  # sum of x_i (on j == 0 rows)
        T.StructField("n", T.LongType()),  # row count (on i == j == 0 rows)
    ]
)


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """Per-Arrow-batch (count, sum, X^T X) partials as (i, j, …) rows.

    NULL vectors are dropped (a null embedding carries no moment); a ragged
    vector (length differing within a batch) raises a clear error instead of
    numpy's inhomogeneous-shape crash.
    """
    import numpy as np
    import pandas as pd

    def gemm(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            lens = pdf[vec_col].map(len)
            if lens.nunique() != 1:
                raise ValueError(
                    f"ragged embedding column: lengths {sorted(lens.unique())}"
                )
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            d = x.shape[1]
            sxx = x.T @ x  # d x d GEMM — the whole batch in one BLAS call
            sx = x.sum(axis=0)
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            out = pd.DataFrame(
                {
                    "i": ii.ravel().astype("int32"),
                    "j": jj.ravel().astype("int32"),
                    "sxx": sxx.ravel(),
                    "sx_i": 0.0,
                    "n": 0,
                }
            )
            out.loc[out["j"] == 0, "sx_i"] = sx[
                out.loc[out["j"] == 0, "i"].to_numpy()
            ]
            out.loc[(out["i"] == 0) & (out["j"] == 0), "n"] = len(x)
            yield out

    return spread(df.select(vec_col)).mapInPandas(gemm, _PARTIAL_SCHEMA)


def _moment_agg(df: DataFrame, vec_col: str) -> DataFrame:
    """The d^2-cardinality aggregate of the GEMM partials."""
    return _moment_partials(df, vec_col).groupBy("i", "j").agg(
        F.sum("sxx").alias("sxx"),
        F.sum("sx_i").alias("sx_i"),
        F.sum("n").alias("n"),
    )


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Exact covariance matrix of the embedding column as (i, j, cov) rows,
    cov_ij = E[x_i x_j] - E[x_i] E[x_j] (population covariance).

    One corpus pass (GEMM partials), one d^2-cardinality aggregate.
    Returns d^2 rows — driver-collectable for any realistic d.
    """
    agg = _moment_agg(df, vec_col)
    # total count and per-dimension means live on the j == 0 rows; broadcast
    # them back over the d^2 frame (both sides are d-scale, not corpus-scale)
    n_total = agg.filter((F.col("i") == 0) & (F.col("j") == 0)).select(
        F.col("n").alias("n_total")
    )
    means = agg.filter(F.col("j") == 0).select(
        F.col("i").alias("mi"), F.col("sx_i").alias("sum_i")
    )
    out = (
        agg.crossJoin(F.broadcast(n_total))
        .join(F.broadcast(means.select(F.col("mi").alias("i"), F.col("sum_i").alias("sum_a"))), "i")
        .join(F.broadcast(means.select(F.col("mi").alias("j"), F.col("sum_i").alias("sum_b"))), "j")
        .select(
            "i",
            "j",
            (
                F.col("sxx") / F.col("n_total")
                - (F.col("sum_a") / F.col("n_total"))
                * (F.col("sum_b") / F.col("n_total"))
            ).alias("cov"),
        )
    )
    return out


def _collect_moments(df: DataFrame, vec_col: str):
    """Driver-side (n, mean (d,), cov (d,d)) from ONE corpus pass; d is
    recovered from the collected d^2 rows. Raises on an empty/all-NULL
    input (there is no basis to solve for)."""
    import numpy as np

    rows = _moment_agg(df, vec_col).collect()
    if not rows:
        raise ValueError("pca_project: no non-null embeddings in input")
    d = max(r["i"] for r in rows) + 1
    sxx = np.zeros((d, d))
    sums = np.zeros(d)
    n = 0
    for r in rows:
        sxx[r["i"], r["j"]] = r["sxx"]
        if r["j"] == 0:
            sums[r["i"]] = r["sx_i"]
        if r["i"] == 0 and r["j"] == 0:
            n = r["n"]
    if n == 0:
        raise ValueError("pca_project: no non-null embeddings in input")
    mean = sums / n
    cov = sxx / n - np.outer(mean, mean)
    return n, mean, cov


def _principal_axes(cov, k: int):
    """Eigen-solve the covariance matrix; deterministic sign fix."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    vals, vecs = vals[order], vecs[:, order]
    # sign convention: largest-|component| of each axis is positive, ties
    # broken by lowest index — projections are reproducible across runs
    for idx in range(vecs.shape[1]):
        a = vecs[:, idx]
        lead = np.argmax(np.abs(np.round(a, 12)))
        if a[lead] < 0:
            vecs[:, idx] = -a
    return vals, vecs


def pca_project(
    df: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Project every vector onto the top-``k`` principal components.

    Exactly two corpus passes: (1) the one-pass moments above, collected at
    d^2 rows (count, means, and covariance all fall out of the same
    aggregate); (2) an Arrow-batched projection with the k x d axis matrix
    in the UDF closure — per batch one GEMM, no shuffle. NULL embeddings are
    excluded from both the basis and the output. Returns
    (id, components array<double>, explained k-variance fraction column).
    """
    import numpy as np
    import pandas as pd

    n, mean, cov = _collect_moments(df, vec_col)
    vals, vecs = _principal_axes(cov, k)
    total_var = float(np.clip(np.diag(cov), 0.0, None).sum())
    explained = float(np.sum(vals) / total_var) if total_var > 0 else 1.0
    w = vecs.T  # k x d
    out_schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("components", T.ArrayType(T.DoubleType())),
        ]
    )

    def project(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            pdf = pdf[pdf[vec_col].notna()]
            if not len(pdf):
                continue
            x = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            z = (x - mean) @ w.T
            yield pd.DataFrame(
                {"__id": pdf[id_col].values, "components": list(z)}
            )

    projected = (
        spread(df.select(id_col, vec_col))
        .mapInPandas(project, out_schema)
        .withColumnRenamed("__id", id_col)
        .withColumn("explained_var", F.lit(round(explained, 4)))
    )
    return projected
