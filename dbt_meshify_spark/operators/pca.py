"""Distributed second-moment statistics + PCA over an embedding column
(N3/N10): covariance via per-partition GEMM partials, eigendecomposition on
the (d x d) driver-side result, projection as a broadcast matrix multiply.

The curation uses: embedding whitening before cosine thresholds, SemDeDup-
style dimensionality reduction, drift monitoring between corpus snapshots
(compare covariance spectra), and compact ANN indexes (project to top-k
components before bucketing).

Plan shape at 100 TB: ONE pass over the vectors. Each Arrow batch reduces
to a (d*d + d + 1)-float partial — count, sum, X^T X — via numpy GEMM
inside ``mapInPandas`` (the vectorized path; a per-pair SQL explode would
shuffle N*d^2 rows). Partials aggregate with a standard codegen'd
groupBy((i,j)).sum shuffle whose cardinality is d^2, independent of corpus
size. The eigen-solve happens on the d x d matrix driver-side (bounded,
same posture as IVF centroid training), and the projection ships the k x d
matrix back inside an Arrow-batched pandas UDF closure — the corpus never
shuffles at any point.
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
    """Per-Arrow-batch (count, sum, X^T X) partials as (i, j, …) rows."""
    import numpy as np
    import pandas as pd

    def gemm(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if not len(pdf):
                continue
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


def embedding_covariance(
    df: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Exact covariance matrix of the embedding column as (i, j, cov) rows,
    cov_ij = E[x_i x_j] - E[x_i] E[x_j] (population covariance).

    One corpus pass (GEMM partials), one d^2-cardinality aggregate.
    Returns d^2 rows — driver-collectable for any realistic d.
    """
    partials = _moment_partials(df, vec_col)
    agg = partials.groupBy("i", "j").agg(
        F.sum("sxx").alias("sxx"),
        F.sum("sx_i").alias("sx_i"),
        F.sum("n").alias("n"),
    )
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


def _principal_axes(cov_rows, d: int, k: int):
    """Eigen-solve the collected covariance rows; deterministic sign fix."""
    import numpy as np

    c = np.zeros((d, d))
    for r in cov_rows:
        c[r["i"], r["j"]] = r["cov"]
    vals, vecs = np.linalg.eigh(c)  # ascending
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

    Two jobs: (1) the one-pass covariance above, collected at d^2 rows;
    (2) an Arrow-batched projection with the k x d axis matrix in the UDF
    closure — per batch one GEMM, no shuffle. Returns
    (id, components array<double>, explained k-variance fraction column).
    """
    import numpy as np
    import pandas as pd

    d = len(df.select(vec_col).first()[0])
    cov_rows = embedding_covariance(df, vec_col).collect()
    vals, vecs = _principal_axes(cov_rows, d, k)
    total_var = sum(max(r["cov"], 0.0) for r in cov_rows if r["i"] == r["j"])
    explained = float(np.sum(vals) / total_var) if total_var > 0 else 1.0
    mean = np.zeros(d)
    # recover means from the covariance pass? cheaper to recompute: one
    # narrow aggregate over the corpus (d accumulators, codegen'd)
    sums = df.select(
        *[F.sum(F.element_at(F.col(vec_col), i + 1)).alias(f"s{i}") for i in range(d)],
        F.count(F.lit(1)).alias("n"),
    ).first()
    n = sums["n"]
    for i in range(d):
        mean[i] = (sums[f"s{i}"] or 0.0) / max(n, 1)
    w = vecs.T  # k x d
    out_schema = T.StructType(
        [
            T.StructField("__id", T.LongType()),
            T.StructField("components", T.ArrayType(T.DoubleType())),
        ]
    )

    def project(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
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
