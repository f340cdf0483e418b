"""Similarity search over embedding columns (N3).

- ``cosine_topk``: exact brute-force baseline. Correct at any scale but
  O(|Q|x|C|); use for verification and small query sets.
- ``lsh_bucketed_topk``: random-hyperplane LSH blocking — the scale path.
  Candidates come from shared sign-pattern buckets (one shuffle), so cost is
  O(sum of bucket^2) instead of |Q|x|C|.
- ``embedding_neardup_pairs``: all-pairs cosine >= threshold via the same
  bucketing.

Dense vector arithmetic (signature projection, pair scoring, IVF
assignment) runs through Arrow-batched pandas_udfs with closed-over numpy
matrices: Spark's array HOFs (``zip_with``/``aggregate``) evaluate
INTERPRETED — fine for the O(n) normalization projections kept here, ~10x
too slow on anything O(pairs) or O(n x planes) — and literal matrices in
the expression tree make whole-stage codegen compile time dominate
(measured; see ``_signs_udf``/``_assign_udf``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbt_meshify_spark.operators.util import spread

_SEED = 42


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _unit(vec: Column) -> Column:
    """L2-normalized copy of ``vec`` (double).

    Cosine pipelines normalize each side ONCE before any pair join: computed
    per-pair, the two norms are O(dims) work repeated |A|x|B| times —
    pre-normalizing moves them to the O(n) projection and the per-pair cost
    drops to the dot product alone (measured 2x on the all-pairs path).
    """
    v = _as_double(vec)
    n = _norm(v) + F.lit(1e-12)
    return F.transform(v, lambda x: x / n)


def cosine_similarity(a: Column, b: Column) -> Column:
    a, b = _as_double(a), _as_double(b)
    return _dot(a, b) / (_norm(a) * _norm(b) + F.lit(1e-12))


def cosine_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    The query side is expected to be small (it's broadcast); the corpus side
    streams. Returns: query_id, neighbor_id, cos_sim, rank.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), _unit(F.col(vec_col)).alias("qv")
    )
    # spread the streamed side: a broadcast join's output inherits its
    # partitioning, and the per-pair cosine (interpreted HOF arithmetic) is
    # the dominant cost — it must run on every core. Both sides are unit
    # vectors (see _unit), so the per-pair work is the dot product alone.
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), _unit(F.col(vec_col)).alias("cv")
    )
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", _dot(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"), "rank")
    )


def hard_negatives(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query vector,
    the top-k most cosine-similar corpus vectors with a DIFFERENT label —
    the negatives that sit closest to the decision boundary and carry the
    most gradient signal.

    Same shape as :func:`cosine_topk` (small query side broadcast, corpus
    streams, both sides pre-normalized once) with the label-mismatch
    predicate folded into the join condition so disagreeing pairs are
    dropped BEFORE the per-pair dot product — at 100 TB the filter removes
    ~1/|labels| of the pair work before it happens, and no extra shuffle is
    introduced (the only exchange is the per-query top-k window, keyed on
    query_id over k·|Q| candidate rows). Returns: query_id, query_label,
    neighbor_id, neighbor_label, cos_sim, rank.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("query_label"),
        _unit(F.col(vec_col)).alias("qv"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
        _unit(F.col(vec_col)).alias("cv"),
    )
    sims = c.join(
        F.broadcast(q), F.col("query_label") != F.col("neighbor_label")
    ).withColumn("cos_sim", _dot(F.col("qv"), F.col("cv")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
            "rank",
        )
    )


def quantize_embeddings(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: ``scale = max|x|/127``,
    ``q_i = floor(x_i/scale + 0.5)`` (explicit half-up — ``round()`` rounding
    modes differ across engines, ``floor(x+0.5)`` does not).

    Returns ``id_col, scale, q`` with ``q`` an ``array<tinyint>`` — a 4x
    (fp32) / 8x (fp64) memory cut, which at 100 TB is the difference between
    an ANN corpus that fits in cluster RAM and one that spills. Pure
    projection: no shuffle, fully codegen'd; reconstruction error is bounded
    by scale/2 per element (asserted in tests).
    """
    v = _as_double(F.col(vec_col))
    staged = df.select(F.col(id_col), v.alias("__v")).withColumn(
        "scale",
        F.greatest(
            F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x))),
            F.lit(1e-12),
        )
        / F.lit(127.0),
    )
    return staged.select(
        F.col(id_col),
        F.col("scale"),
        F.transform(
            F.col("__v"), lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("byte")
        ).alias("q"),
    )


def dequantize_embeddings(
    df: DataFrame, q_col: str = "q", scale_col: str = "scale", out_col: str = "embedding"
) -> DataFrame:
    """Inverse of ``quantize_embeddings``: ``x_i ≈ q_i * scale``."""
    return df.withColumn(
        out_col,
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )


def _cos_pairs_udf():
    """Arrow-batched cosine over candidate PAIRS: numpy einsum on the stacked
    batch instead of a per-row HOF fold (interpreted, ~5x slower measured).

    Used on the candidate-pair paths — LSH near-dup/ANN, IVF — where the
    pair set is pre-pruned and vectors re-join by id. numpy's SIMD
    summation order differs from a sequential fold in the last ulp; the
    oracle-checked consumers compare at 4dp, where this data is
    order-insensitive (driver rounds prove it). The exact all-pairs tier
    (``embedding_neardup_exact``) no longer routes here: it scores against
    a closure-held matrix so the O(n^2) pair join moves ids only.
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        # float64 widening happens HERE, after the Arrow transfer: callers
        # pass the stored float32 arrays untouched, halving the bytes moved
        # through the pair join + Arrow batches; widening float32->float64
        # is exact, so results are bit-identical to casting before the join.
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1) + 1e-12
        return pd.Series(num / den)

    # non-deterministic marking (r14, guide §4.4): the function IS
    # deterministic, but the optimizer pushes a threshold filter that
    # references the UDF-computed column below its Project and then
    # re-evaluates the UDF above it for the output — two ArrowEvalPython
    # nodes per scoring pass (every candidate pair paid the Arrow cosine
    # twice on the near-dup path). Marking it non-deterministic forbids
    # the duplication; every consumer applies it in a single Project and
    # filters/ranks the materialized attribute, so results are unchanged.
    return cos.asNondeterministic()


def _plane_matrix(num_planes: int, dims: int, seed: int) -> list[list[float]]:
    """The deterministic hyperplane matrix shared by the Spark signature UDF
    and the DuckDB oracle literal (queries/extensions.py renders the SAME
    ``random.Random(seed).gauss`` draw)."""
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dims)] for _ in range(num_planes)]


def _signs_udf(planes: list[list[float]]):
    """Sign bits of <vec, r_p> for every plane, as an Arrow-batched UDF.

    Three plan shapes were measured for this projection at sf0.1 (2k rows x
    64 planes x 64 dims):
    - literal-matrix codegen: compile time dominated (22.4s cold);
    - plane matrix as broadcast DATA + nested ``transform``/``aggregate``
      HOFs: no compile blowup, but HOF lambdas evaluate INTERPRETED —
      ~8k tree-walked expr evals per row made the signature step ~8-10s of
      every LSH query;
    - this form: numpy with the plane matrix in the task closure, ~0.1s.

    FP parity with the DuckDB oracle is preserved by construction: the
    accumulation loops over dims SEQUENTIALLY (acc = acc + v[d]*p[d], each
    elementwise IEEE mult-then-add), the exact left-fold order of DuckDB's
    ``list_reduce`` replay — no einsum/pairwise-summation reordering on the
    sign-determining sum. Rows whose length differs from the plane dims get
    an all-zero signature (the zip_with null-padding semantics of the HOF
    form); NaN sums take sign 1 (Spark's NaN-is-largest comparison).
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes, dtype=np.float64)  # (num_planes, dims)
    n_planes, dims = P.shape

    @pandas_udf("array<int>")
    def signs(vs: pd.Series) -> pd.Series:
        arr = vs.to_numpy()
        res: list = [None] * len(arr)
        by_len: dict[int, list[int]] = {}
        for i, v in enumerate(arr):
            key = -1 if v is None else len(v)
            by_len.setdefault(key, []).append(i)
        for length, idxs in by_len.items():
            if length != dims:
                for i in idxs:
                    res[i] = [0] * n_planes
                continue
            M = np.stack([np.asarray(arr[i], dtype=np.float64) for i in idxs])
            acc = np.zeros((len(idxs), n_planes))
            for d in range(dims):
                acc = acc + M[:, d : d + 1] * P[None, :, d]
            sg = np.where(np.isnan(acc), 1, (acc >= 0)).astype(np.int32)
            for j, i in enumerate(idxs):
                res[i] = sg[j].tolist()
        return pd.Series(res)

    return signs


def lsh_bucketed_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = _SEED,
) -> DataFrame:
    """Approximate top-k: random-hyperplane signature, banded buckets,
    exact cosine within candidate buckets.

    With ``bands`` bands of ``num_planes/bands`` bits, near-identical vectors
    collide in >=1 band w.h.p. Each side computes signatures as a projection;
    the single shuffle is the (band_idx, band_key) join. Recall is tunable
    via num_planes/bands (more bands => higher recall, more candidates).
    """
    sims = _lsh_scored_pairs(
        queries, corpus, id_col, vec_col, dims, num_planes, bands, seed
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"), "rank")
    )


def _lsh_scored_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    num_planes: int,
    bands: int,
    seed: int,
    pair_filter=None,
) -> DataFrame:
    """Shared LSH core: banded candidate generation + exact cosine scoring,
    WITHOUT ranking — ``lsh_bucketed_topk`` adds the per-query row_number
    window; threshold consumers (``embedding_neardup_pairs``) filter
    directly and skip that sort entirely (measured ~3s of the near-dup
    job at sf0.1 for a rank nobody read)."""
    assert num_planes % bands == 0
    width = num_planes // bands
    sig_udf = _signs_udf(_plane_matrix(num_planes, dims, seed))

    def banded(df: DataFrame, prefix: str) -> DataFrame:
        # ids + band keys ONLY: the banding shuffle and candidate dedup must
        # not carry vector payloads (at 64 dims that's ~0.5 KB/row through
        # two shuffles — measured 3x the whole job's cost); vectors re-join
        # after dedup instead.
        # raw (float32) vectors into the Arrow UDF — widening happens in
        # numpy, exactly; no _as_double projection doubling the batch bytes
        base = spread(df).select(
            F.col(id_col).alias(f"{prefix}_id"), F.col(vec_col).alias("__vec")
        )
        staged = base.withColumn("__sig", sig_udf(F.col("__vec")))
        band_keys = F.array(
            *[
                F.xxhash64(F.slice(F.col("__sig"), i * width + 1, width).cast("string"))
                for i in range(bands)
            ]
        )
        return staged.select(
            f"{prefix}_id",
            F.posexplode(band_keys).alias("band_idx", "band_key"),
        )

    qb = banded(queries, "query")
    if queries is corpus:
        # self-LSH (the near-dup tier): stage the banded signature frame
        # ONCE behind a lazy pin — unpinned, both self-join sides re-ran
        # the full parquet scan + Arrow signature UDF + posexplode
        # (2 corpus passes and 2 Python-boundary crossings for one
        # signature set). The pin is (id, band_idx, band_key) — ids and
        # two longs per band, never vectors — so it stays metadata-sized
        # at 100 TB. The neighbor side is a rename of the pin (fresh
        # aliases keep the self-join unambiguous).
        qb = qb.localCheckpoint(eager=False)
        cb = qb.select(
            F.col("query_id").alias("neighbor_id"),
            F.col("band_idx").alias("__nb_idx"),
            F.col("band_key").alias("__nb_key"),
        )
        join_cond = (
            (qb["band_idx"] == cb["__nb_idx"])
            & (qb["band_key"] == cb["__nb_key"])
            & (F.col("query_id") != F.col("neighbor_id"))
        )
    else:
        cb = banded(corpus, "neighbor")
        join_cond = (
            (qb.band_idx == cb.band_idx)
            & (qb.band_key == cb.band_key)
            & (F.col("query_id") != F.col("neighbor_id"))
        )
    cand = (
        qb.join(cb, join_cond)
        .select("query_id", "neighbor_id")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    if pair_filter is not None:
        # keys-only candidate pruning (e.g. cross-label only) BEFORE the
        # vector payloads re-join and the Arrow cosine runs
        cand = pair_filter(cand)
    qv = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec")
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("neighbor_vec")
    )
    # no broadcast hints: the query side broadcasts naturally under the
    # threshold; a 100 TB corpus side must be allowed to shuffle-join
    return cand.join(qv, "query_id").join(cv, "neighbor_id").withColumn(
        "cos_sim", _cos_pairs_udf()(F.col("query_vec"), F.col("neighbor_vec"))
    )


def embedding_neardup_exact(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 100_000,
) -> DataFrame:
    """All pairs with cosine >= threshold, exact O(n^2) — the verification
    baseline for the LSH-blocked path. Returns id_a, id_b (id_a < id_b),
    cos_sim (4dp).

    Plan (round 6 rework): the nested-loop pair join enumerates IDS ONLY
    (the repo-wide never-carry-arrays-through-pair-joins rule — the
    earlier form rode both 64-dim vectors through the join and shipped
    ~2 GB through Arrow at sf0.1's 2M pairs, making its wall time breathe
    ~2x with host contention, the round-4/5 bench-flag source); the
    (id, vector) matrix rides the scoring UDF's closure ONCE per task and
    pairs gather rows by position — Arrow moves 16-byte id pairs in and
    thresholded survivors out, ~60x less traffic, same einsum kernel and
    therefore bit-identical scores. The closure matrix is bounded IN CODE:
    this tier is the named VERIFICATION baseline, only ever run on slices,
    and inputs over ``max_rows`` raise ``ValueError`` instead of becoming a
    silent driver-memory bottleneck. The guard is a single bounded job: the
    matrix collect itself runs under ``limit(max_rows + 1)`` and the length
    check follows — no separate count pre-job, no check-then-collect window
    for a shifting source (a source that still mutates between this collect
    and the pair enumeration is caught by the NaN-id guard in the scoring
    UDF). The blocked-GEMM twin `embedding_neardup_gemm` is the no-collect
    exact form, and LSH/IVF are the scale paths. Both join sides spread so
    the O(n^2) enumeration parallelizes regardless of which side the
    planner streams."""
    src = df.filter(F.col(vec_col).isNotNull())
    # the slice-only contract, enforced: limit(max_rows + 1) bounds the
    # collect itself (a plain count() pre-check would both scan the full
    # 100 TB corpus this guard exists to reject AND race the collect)
    rows = (
        src.select(F.col(id_col), _as_double(F.col(vec_col)).alias("v"))
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"embedding_neardup_exact is the O(n^2) verification baseline "
            f"and collects the (id, vector) matrix driver-side; input "
            f"exceeds max_rows={max_rows}. Use embedding_neardup_gemm "
            f"(exact, no collect) or the LSH/IVF paths at corpus scale."
        )
    ids = [r[0] for r in rows]
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = (
        np.linalg.norm(mat, axis=1) if len(rows) else np.zeros(0)
    )
    index = {i: k for k, i in enumerate(ids)}
    id_t = src.schema[id_col].dataType.simpleString()

    a = spread(src).select(F.col(id_col).alias("id_a"))
    b = spread(src).select(F.col(id_col).alias("id_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))

    def score(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            ia = pdf["id_a"].map(index)
            ib = pdf["id_b"].map(index)
            if ia.isna().any() or ib.isna().any():
                missing = set(pdf.loc[ia.isna(), "id_a"]) | set(
                    pdf.loc[ib.isna(), "id_b"]
                )
                raise ValueError(
                    "embedding_neardup_exact: pair ids absent from the "
                    f"collected matrix (nondeterministic source?): "
                    f"{sorted(missing)[:5]}"
                )
            ia = ia.to_numpy()
            ib = ib.to_numpy()
            num = np.einsum("ij,ij->i", mat[ia], mat[ib])
            cs = num / (norms[ia] * norms[ib] + 1e-12)
            keep = cs >= threshold
            if keep.any():
                out = pdf.loc[keep, ["id_a", "id_b"]].copy()
                out["cos_sim"] = cs[keep]
                yield out

    return pairs.mapInPandas(
        score, f"id_a {id_t}, id_b {id_t}, cos_sim double"
    ).select("id_a", "id_b", (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"))


def _blockify(
    df: DataFrame, nblocks: int, id_col: str, vec_col: str
) -> DataFrame:
    """Pack rows into ``nblocks`` L2-normalized matrix blocks.

    One hash shuffle; each block row carries (ids, row-major matrix, nrow).
    Block size must fit an Arrow batch — nblocks scales with corpus size so
    a block stays ~10-50k rows regardless of total n.
    """
    tagged = df.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(nblocks)).alias("blk"),
    )
    schema = (
        "blk long, ids array<long>, mat array<double>, nrow int"
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.array(pdf["v"].tolist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
        return pd.DataFrame(
            {
                "blk": [key[0]],
                "ids": [pdf["id"].tolist()],
                "mat": [m.ravel().tolist()],
                "nrow": [len(pdf)],
            }
        )

    return tagged.groupBy("blk").applyInPandas(pack, schema)


def embedding_neardup_gemm(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nblocks: int = 8,
) -> DataFrame:
    """All pairs with cosine >= threshold via distributed block GEMM — the
    BLAS form of ``embedding_neardup_exact`` (identical result set).

    Plan: blockify (one shuffle) -> upper-triangle block-pair join
    (nblocks^2/2 tasks, each a numpy matmul over Arrow-shipped blocks) ->
    thresholded pair emission. The O(n^2 * dims) inner loop runs in BLAS
    instead of per-element codegen — the one place Python-in-the-plan wins
    outright (SURVEY.md UD5 posture): a 20k x 20k x 1024 block product is a
    single dgemm call. At 100 TB the exact all-pairs tier is only ever run
    INSIDE candidate blocks (LSH/IVF first); this operator is that tier's
    engine, with nblocks sized so each block fits executor memory.
    """
    blocks = _blockify(df, nblocks, id_col, vec_col)
    a = blocks.select(
        F.col("blk").alias("blk_a"),
        F.col("ids").alias("ids_a"),
        F.col("mat").alias("mat_a"),
        F.col("nrow").alias("n_a"),
    )
    b = blocks.select(
        F.col("blk").alias("blk_b"),
        F.col("ids").alias("ids_b"),
        F.col("mat").alias("mat_b"),
        F.col("nrow").alias("n_b"),
    )
    pairs = a.join(b, F.col("blk_a") <= F.col("blk_b")).withColumn(
        "same", F.col("blk_a") == F.col("blk_b")
    )

    def mult(it):
        for pdf in it:
            outs = []
            for r in pdf.itertuples():
                ma = np.asarray(r.mat_a).reshape(r.n_a, -1)
                mb = np.asarray(r.mat_b).reshape(r.n_b, -1)
                sims = ma @ mb.T
                ii, jj = np.nonzero(sims >= threshold)
                if len(ii) == 0:
                    continue
                id_a = np.asarray(r.ids_a)[ii]
                id_b = np.asarray(r.ids_b)[jj]
                vals = sims[ii, jj]
                if r.same:
                    keep = id_a < id_b
                    id_a, id_b, vals = id_a[keep], id_b[keep], vals[keep]
                else:
                    # cross-block: orient each pair (smaller id first)
                    lo = np.minimum(id_a, id_b)
                    id_b = np.maximum(id_a, id_b)
                    id_a = lo
                outs.append(
                    pd.DataFrame({"id_a": id_a, "id_b": id_b, "cos_sim": vals})
                )
            if outs:
                yield pd.concat(outs)

    return pairs.mapInPandas(
        mult, "id_a long, id_b long, cos_sim double"
    ).select("id_a", "id_b", (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"))


def cosine_topk_gemm(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nblocks: int = 8,
) -> DataFrame:
    """Exact top-k cosine neighbors via block GEMM (identical result set to
    ``cosine_topk``). Query blocks x corpus blocks; per-task numpy matmul
    emits each task's local top-k, and a final window keeps the global k —
    the partial-topk-then-merge shape that bounds shuffle volume to
    O(|Q| * k * nblocks) instead of |Q| x |C|."""
    qb = _blockify(queries, max(1, nblocks // 4), id_col, vec_col).select(
        F.col("ids").alias("ids_q"), F.col("mat").alias("mat_q"), F.col("nrow").alias("n_q")
    )
    cb = _blockify(corpus, nblocks, id_col, vec_col).select(
        F.col("ids").alias("ids_c"), F.col("mat").alias("mat_c"), F.col("nrow").alias("n_c")
    )
    pairs = qb.crossJoin(cb)

    def mult(it):
        for pdf in it:
            outs = []
            for r in pdf.itertuples():
                mq = np.asarray(r.mat_q).reshape(r.n_q, -1)
                mc = np.asarray(r.mat_c).reshape(r.n_c, -1)
                sims = mq @ mc.T
                iq = np.asarray(r.ids_q)
                ic = np.asarray(r.ids_c)
                # self-match mask, then per-query local top-k
                kk = min(k, sims.shape[1])
                for row in range(sims.shape[0]):
                    s = sims[row].copy()
                    s[ic == iq[row]] = -np.inf
                    idx = np.argpartition(-s, kk - 1)[:kk]
                    outs.append(
                        pd.DataFrame(
                            {
                                "query_id": iq[row],
                                "neighbor_id": ic[idx],
                                "cos_sim": s[idx],
                            }
                        )
                    )
            if outs:
                yield pd.concat(outs)

    local = pairs.mapInPandas(
        mult, "query_id long, neighbor_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
            "rank",
        )
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup-shape semantic deduplication: k-means-cluster the embedding
    space, find near-identical groups (cosine >= threshold) WITHIN each
    cluster, keep the minimum id per group.

    Composition of the engine's own tiers: ``train_ivf_centroids`` (bounded
    driver-side Lloyd — the faiss posture), Arrow-batched cluster
    assignment, per-cluster block GEMM (the dgemm tier of
    ``embedding_neardup_gemm``, keyed by cluster instead of hash), and
    ``operators.dedup.connected_components`` min-label resolution. The
    quadratic pair search never crosses a cluster boundary — the property
    that turns O(n^2) into O(sum cluster^2) and makes semantic dedup
    tractable at corpus scale (SemDeDup, Abbas et al. 2023, public method).

    Returns ``df`` minus dropped duplicates, plus ``sem_cluster``.
    Rows-only check (k-means has no SQL form); invariants are unit-tested:
    every dropped id has a kept same-cluster witness at >= threshold.
    """
    from dbt_meshify_spark.operators.dedup import connected_components

    centroids = train_ivf_centroids(
        df, nlist=n_clusters, id_col=id_col, vec_col=vec_col
    )
    assigned = df.withColumn("sem_cluster", _assign_udf(centroids)(F.col(vec_col)))

    # per-cluster matrix pack -> same-block matmul only (pairs cannot cross
    # clusters by construction)
    tagged = assigned.select(
        F.col(id_col).alias("id"),
        _as_double(F.col(vec_col)).alias("v"),
        F.col("sem_cluster").alias("blk"),
    )

    def pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        m = np.array(pdf["v"].tolist(), dtype=np.float64)
        m /= np.linalg.norm(m, axis=1, keepdims=True) + 1e-12
        return pd.DataFrame(
            {
                "blk": [key[0]],
                "ids": [pdf["id"].tolist()],
                "mat": [m.ravel().tolist()],
                "nrow": [len(pdf)],
            }
        )

    blocks = tagged.groupBy("blk").applyInPandas(
        pack, "blk long, ids array<long>, mat array<double>, nrow int"
    )

    def pairs_in_cluster(it):
        for pdf in it:
            outs = []
            for r in pdf.itertuples():
                m = np.asarray(r.mat).reshape(r.nrow, -1)
                sims = m @ m.T
                ii, jj = np.nonzero(sims >= threshold)
                keep = ii < jj
                if not keep.any():
                    continue
                ids = np.asarray(r.ids)
                outs.append(
                    pd.DataFrame(
                        {"id_a": ids[ii[keep]], "id_b": ids[jj[keep]]}
                    )
                )
            if outs:
                yield pd.concat(outs)

    dup_pairs = blocks.mapInPandas(pairs_in_cluster, "id_a long, id_b long")
    comps = connected_components(dup_pairs)
    dropped = (
        comps.filter(F.col("id") != F.col("component")).select(F.col("id"))
    )
    return assigned.join(
        dropped.withColumnRenamed("id", id_col), id_col, "left_anti"
    )


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = _SEED,
) -> DataFrame:
    """All pairs with cosine >= threshold, LSH-blocked (near-dup by
    embedding). Returns id_a, id_b (id_a < id_b), cos_sim.

    Blocking efficiency is threshold-regime-dependent: at production near-dup
    thresholds (>=0.9, angle < 26°) narrow bands prune hard and candidates
    << n^2. At the test corpus's forced 0.4 threshold (its max pairwise cos
    is ~0.51) wide-recall banding admits ~all pairs — the demo pays exact
    cost plus banding overhead; the plan shape, not this SF's wall-clock, is
    the scale story."""
    sims = _lsh_scored_pairs(
        df, df, id_col, vec_col, dims, num_planes, bands, seed,
        # orientation filter on the ids-only candidate frame (r14): a
        # self-LSH emits every unordered pair in BOTH orientations, and
        # the old post-scoring `query_id < neighbor_id` filter threw one
        # of them away AFTER paying the vector re-join + Arrow cosine
        # for it. Filtering candidates first halves the scored pairs;
        # the surviving rows and their scores are byte-identical.
        pair_filter=lambda cand: cand.filter(
            F.col("query_id") < F.col("neighbor_id")
        ),
    )
    return (
        sims.filter(F.col("cos_sim") >= threshold)
        .select(
            F.col("query_id").alias("id_a"),
            F.col("neighbor_id").alias("id_b"),
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
        )
    )


def _assign_udf(centroids: list[list[float]]):
    """argmax_i dot(vec, centroid_i) as an Arrow-batched Pandas UDF.

    Why not a literal-matrix column expression: every Lloyd round embeds
    fresh centroid literals, so Catalyst recompiles a ~nlist*dims-literal
    codegen unit per round (~6 s each, measured — it tripled the whole IVF
    query). A vectorized numpy matmul over Arrow batches has no compile
    cost and is the intended fast path for dense linear algebra.
    """
    from pyspark.sql.functions import pandas_udf

    cm = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("int")
    def assign(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        return pd.Series(np.ascontiguousarray(m @ cm.T).argmax(axis=1))

    return assign


def _probe_udf(centroids: list[list[float]], nprobe: int):
    """Indices of the ``nprobe`` nearest centroids per query vector."""
    from pyspark.sql.functions import pandas_udf

    cm = np.asarray(centroids, dtype=np.float64)

    @pandas_udf("array<int>")
    def probe(v: pd.Series) -> pd.Series:
        m = np.stack(v.to_numpy())
        sims = m @ cm.T
        # stable argsort on (-sim, idx): deterministic under ties
        order = np.argsort(-sims, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order))

    return probe


def train_ivf_centroids(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 8,
    sample_per_list: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Spherical k-means coarse quantizer for IVF, trained on a bounded
    deterministic sample — the standard IVF posture (faiss trains on
    ~max(nlist*39, 2^15) samples, not the corpus).

    One distributed job: a hash-mod filter keeps ~``nlist*sample_per_list``
    vectors (deterministic — no partition-order dependence), which collect
    to the driver (nlist*sample_per_list*dims doubles, bounded regardless
    of corpus size). Lloyd rounds then run in numpy. At 100 TB this is the
    difference between 1 scan and ``iters+1`` scans.
    """
    target = nlist * sample_per_list
    n = corpus.count()
    mod = max(1, n // max(target, 1))
    # raw vectors only — normalization happens in numpy below, so this scan
    # compiles no higher-order-function codegen unit (measured ~2 s saved)
    sample = (
        corpus.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .select(F.col(id_col).alias("_vid"), F.col(vec_col).alias("_v"))
        .collect()
    )
    # deterministic order regardless of partitioning
    sample.sort(key=lambda r: r._vid)
    x = np.asarray([list(r._v) for r in sample], dtype=np.float64)
    x /= np.linalg.norm(x, axis=1, keepdims=True) + 1e-12
    if len(x) < nlist:
        raise ValueError(
            f"corpus too small for nlist={nlist}: sampled {len(x)} vectors"
        )
    # init: nlist sample rows with the smallest (xxhash-like) rank — use a
    # deterministic stride over the sorted sample for spatial spread
    idx = np.linspace(0, len(x) - 1, nlist).round().astype(int)
    centroids = x[idx].copy()
    for _ in range(iters):
        assign = (x @ centroids.T).argmax(axis=1)
        for i in range(nlist):
            members = x[assign == i]
            if len(members) == 0:
                continue  # empty cluster keeps its centroid
            m = members.mean(axis=0)
            centroids[i] = m / (np.linalg.norm(m) + 1e-12)
    return [list(map(float, c)) for c in centroids]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    nlist: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF index (the other scale
    path next to lsh_bucketed_topk): a spherical-k-means coarse quantizer
    partitions the corpus into ``nlist`` cells; each query probes its
    ``nprobe`` nearest cells and scores exactly inside them.

    Plan shape: centroid assignment is map-only on both sides (literal
    matrix, no shuffle); the candidate join is a single equi-join on the
    cell id touching ~nprobe/nlist of the corpus per query. At 100 TB,
    raise nlist so cells stay executor-sized and let AQE's skew split
    handle hot cells (cluster sizes are data-dependent).
    """
    centroids = train_ivf_centroids(
        corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
    )
    assign = _assign_udf(centroids)
    probe = _probe_udf(centroids, nprobe)

    # raw (un-normalized) vectors throughout: per-row positive scaling
    # changes neither the argmax cell assignment nor the per-query probe
    # order, and the Arrow cosine normalizes inside the batch — so no HOF
    # normalization pass compiles at all
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("_cell", assign(F.col("cv")))

    q = spread(queries).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("_cell", F.explode(probe(F.col("qv"))))

    sims = (
        q.join(c, "_cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", _cos_pairs_udf()(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"), "rank",
        )
    )


def assign_cells(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "cell",
) -> DataFrame:
    """Label every row with its nearest-centroid cell id (map-only; the
    centroid matrix rides in the Arrow UDF closure, so no shuffle and no
    per-call codegen). The public face of the IVF coarse quantizer for
    consumers beyond ANN — diversity sampling, semantic sharding, cluster
    profiling."""
    assign = _assign_udf(centroids)
    return df.withColumn(out_col, assign(_as_double(F.col(vec_col))))


def ivf_index(
    corpus: DataFrame,
    nlist: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Build a PERSISTABLE IVF ANN index: returns ``(centroids, cells)`` —
    ``centroids`` is the ``nlist``-row ``(cell, centroid)`` coarse
    quantizer, ``cells`` is the corpus labeled ``(id, cell, vec)``.

    The continuous-similarity-serving shape (embedding analog of
    ``dedup.minhash_index``): a 100 TB embedding corpus is trained and
    cell-assigned ONCE — both frames written to parquet, ``cells`` ideally
    partitioned by ``cell`` so probes prune at the scan — and every query
    batch probes the stored index via :func:`ivf_probe_index`. The corpus
    vectors are never re-read, never re-assigned per batch, and centroid
    training (the driver-side Lloyd rounds) never re-runs.
    """
    centroids = train_ivf_centroids(
        corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
    )
    spark = corpus.sparkSession
    cent_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)],
        "cell int, centroid array<double>",
    )
    cells = spread(corpus).select(
        F.col(id_col),
        _as_double(F.col(vec_col)).alias("vec"),
    ).withColumn("cell", _assign_udf(centroids)(F.col("vec")))
    return cent_df, cells


#: Scratch root for persisted IVF indexes (the embedding analog of
#: ``sources.bucketing.DEFAULT_BUCKET_DIR``).
DEFAULT_IVF_DIR = "/tmp/dbt_meshify_spark_ivf"


def ensure_ivf_index(
    spark,
    corpus: DataFrame,
    cache_key: str,
    nlist: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: str | None = None,
    base_dir: str = DEFAULT_IVF_DIR,
) -> tuple[DataFrame, DataFrame]:
    """Persisted :func:`ivf_index` keyed on ``cache_key``: train + assign
    ONCE, parquet round-trip, reuse across sessions — the deployment shape
    the docstring above describes, made concrete. ``cells`` is written
    ``partitionBy("cell")`` so :func:`ivf_probe_index`'s equi-join prunes
    the scan to the probed cells (DPP; plan-guarded).

    Reuse is gated on BOTH halves' ``_SUCCESS`` markers AND the source
    fingerprint (the shared ``ensure_cached_layout`` gate): a corpus
    parquet regenerated in place rebuilds the index instead of silently
    serving stale cells. id_col/vec_col are part of the cache identity
    via the length-prefixed ``cache_slug`` — two configs reading
    different columns off the same corpus cannot collide.
    """
    import os

    from dbt_meshify_spark.sources.bucketing import cache_slug, ensure_cached_layout

    slug = cache_slug(cache_key.strip("/"), id_col, vec_col)
    d = os.path.join(base_dir, f"ivf{nlist}_i{iters}_{slug}")

    def build(layout_dir: str) -> None:
        centroids, cells = ivf_index(
            corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
        )
        centroids.write.mode("overwrite").parquet(
            os.path.join(layout_dir, "centroids")
        )
        cells.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(layout_dir, "cells")
        )

    ensure_cached_layout(d, source_path, ["centroids", "cells"], build)
    return (
        spark.read.parquet(os.path.join(d, "centroids")),
        spark.read.parquet(os.path.join(d, "cells")),
    )


def ivf_probe_index(
    queries: DataFrame,
    centroids: DataFrame,
    cells: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors of each query against a PERSISTED
    :func:`ivf_index`, without touching the corpus beyond the probed cells.

    ``centroids`` is collected (``nlist`` rows — bounded by construction)
    into the probe UDF's closure; queries explode to their ``nprobe``
    nearest cells and equi-join ``cells`` on the cell id — with a
    cell-partitioned parquet layout that join scans ~nprobe/nlist of the
    index. Per-batch cost is O(batch x probed-cell volume); the index
    build never re-runs (plan-guarded by the probe test).
    """
    q = _probe_exploded(queries, centroids, nprobe, id_col, vec_col)
    sims = (
        q.join(cells.select(F.col(id_col).alias("neighbor_id"), "vec", "cell"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", _cos_pairs_udf()(F.col("qv"), F.col("vec")))
    )
    return _probe_topk(sims, k)


def _probe_exploded(
    queries: DataFrame, centroids: DataFrame, nprobe: int, id_col: str, vec_col: str
) -> DataFrame:
    """Shared probe front half: collect the bounded centroid table into
    the probe UDF's closure and explode each query to its ``nprobe``
    nearest cell IDS. ``_probe_udf`` returns POSITIONS into the matrix;
    they map through the stored cell ids so a pruned/filtered centroid
    table (non-contiguous ids) still joins the right cells."""
    cent_rows = centroids.orderBy("cell").collect()
    cm = [list(map(float, r["centroid"])) for r in cent_rows]
    cell_ids = F.array(*[F.lit(int(r["cell"])) for r in cent_rows])
    probe = _probe_udf(cm, nprobe)
    return spread(queries).select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("__pos", F.explode(probe(F.col("qv")))).withColumn(
        "cell", F.element_at(cell_ids, F.col("__pos") + 1)
    ).drop("__pos")


def _probe_topk(sims: DataFrame, k: int) -> DataFrame:
    """Shared probe back half: per-query windowed top-k with the
    deterministic (cos_sim DESC, neighbor_id ASC) tiebreak."""
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "neighbor_id",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"), "rank",
        )
    )


def _cos_pairs_q8_udf():
    """Arrow-batched cosine where the NEIGHBOR side arrives int8-quantized:
    dequantize-in-UDF (``q * scale`` row-wise) then the same einsum kernel
    as :func:`_cos_pairs_udf`. The join and Arrow batches move
    ``array<tinyint>`` + one double — 4x (fp32) / 8x (fp64) less traffic
    than raw vectors, the bandwidth half of the quantized-index story; the
    fp64 widening and GEMM cost are unchanged."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, q: pd.Series, scale: pd.Series) -> pd.Series:
        ma = np.stack(a.to_numpy()).astype(np.float64)
        mb = np.stack(q.to_numpy()).astype(np.float64)
        mb *= scale.to_numpy(dtype=np.float64)[:, None]
        num = np.einsum("ij,ij->i", ma, mb)
        den = np.linalg.norm(ma, axis=1) * np.linalg.norm(mb, axis=1) + 1e-12
        return pd.Series(num / den)

    return cos


def ivf_quantize_cells(
    cells: DataFrame, id_col: str = "vec_id", vec_col: str = "vec"
) -> DataFrame:
    """Int8-quantize an :func:`ivf_index` ``cells`` frame in place:
    ``(id, cell, vec)`` becomes ``(id, cell, scale, q)`` with ``q`` an
    ``array<tinyint>`` (:func:`quantize_embeddings` per-vector symmetric
    scheme). Pure projection — the cell assignment is untouched, so the
    quantized index probes identically to the fp index modulo the bounded
    per-element reconstruction error."""
    v = _as_double(F.col(vec_col))
    staged = cells.select(F.col(id_col), F.col("cell"), v.alias("__v")).withColumn(
        "scale",
        F.greatest(
            F.array_max(F.transform(F.col("__v"), lambda x: F.abs(x))),
            F.lit(1e-12),
        )
        / F.lit(127.0),
    )
    return staged.select(
        F.col(id_col),
        F.col("cell"),
        F.col("scale"),
        F.transform(
            F.col("__v"),
            lambda x: F.floor(x / F.col("scale") + F.lit(0.5)).cast("byte"),
        ).alias("q"),
    )


def ivf_probe_index_q8(
    queries: DataFrame,
    centroids: DataFrame,
    qcells: DataFrame,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """:func:`ivf_probe_index` against an INT8-QUANTIZED cells table
    (:func:`ivf_quantize_cells` / :func:`ensure_ivf_index_q8`) — the
    memory half of the 100 TB ANN story: the stored index is 4x (fp32) /
    8x (fp64) smaller, the probe join and Arrow batches move int8 arrays,
    and dequantization happens inside the scoring UDF right before the
    einsum. Same probe plan as the fp path (centroids in the UDF closure,
    explode to nprobe cells, DPP-pruned equi-join on the cell id,
    windowed top-k); scores differ from fp32 only by the bounded
    quantization error (recall-vs-fp32 asserted in tests). Shares
    :func:`_probe_exploded` / :func:`_probe_topk` with the fp path, so
    the two plans stay identical by construction.
    """
    qf = _probe_exploded(queries, centroids, nprobe, id_col, vec_col)
    sims = (
        qf.join(
            qcells.select(
                F.col(id_col).alias("neighbor_id"), "cell", "scale", "q"
            ),
            "cell",
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim",
            _cos_pairs_q8_udf()(F.col("qv"), F.col("q"), F.col("scale")),
        )
    )
    return _probe_topk(sims, k)


def ensure_ivf_index_q8(
    spark,
    corpus: DataFrame,
    cache_key: str,
    nlist: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    source_path: str | None = None,
    base_dir: str = DEFAULT_IVF_DIR,
) -> tuple[DataFrame, DataFrame]:
    """Persisted QUANTIZED :func:`ivf_index`: train + assign + int8-quantize
    ONCE, parquet round-trip, reuse across sessions. Identical staleness
    discipline to :func:`ensure_ivf_index` (``_SUCCESS`` markers + source
    fingerprint; id/vec columns folded into the slug); the stored ``cells``
    half carries ``(id, cell, scale, q:array<tinyint>)`` — the on-disk
    index is 4-8x smaller than the fp twin, which at 100 TB is the
    difference between an index that serves from page cache and one that
    doesn't. Returns ``(centroids, qcells)`` for
    :func:`ivf_probe_index_q8`."""
    import os

    from dbt_meshify_spark.sources.bucketing import cache_slug, ensure_cached_layout

    slug = cache_slug(cache_key.strip("/"), id_col, vec_col)
    d = os.path.join(base_dir, f"ivfq8_{nlist}_i{iters}_{slug}")

    def build(layout_dir: str) -> None:
        centroids, cells = ivf_index(
            corpus, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
        )
        qcells = ivf_quantize_cells(cells, id_col=id_col, vec_col="vec")
        centroids.write.mode("overwrite").parquet(
            os.path.join(layout_dir, "centroids")
        )
        qcells.write.mode("overwrite").partitionBy("cell").parquet(
            os.path.join(layout_dir, "cells")
        )

    ensure_cached_layout(d, source_path, ["centroids", "cells"], build)
    return (
        spark.read.parquet(os.path.join(d, "centroids")),
        spark.read.parquet(os.path.join(d, "cells")),
    )


def hard_negatives_lsh(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    dims: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    seed: int = _SEED,
) -> DataFrame:
    """Scale path of :func:`hard_negatives`: candidates come from shared LSH
    band buckets instead of the full |Q|x|C| scan, the label-mismatch
    filter runs on the keys-only candidate frame BEFORE vectors re-join and
    the Arrow cosine scores — so at 100 TB both the pair volume (banded)
    and the per-pair work (cross-label only) are pruned ahead of the
    expensive steps. Approximate by construction (bucket recall), rows-only
    check + recall-vs-exact test like the other LSH tiers.
    """
    sims = _lsh_scored_pairs(
        queries, corpus, id_col, vec_col, dims, num_planes, bands, seed,
        pair_filter=_label_mismatch_filter(queries, corpus, id_col, label_col),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "query_label",
            "neighbor_id",
            "neighbor_label",
            (F.round("cos_sim", 4) + F.lit(0.0)).alias("cos_sim"),
            "rank",
        )
    )


def _label_mismatch_filter(
    queries: DataFrame, corpus: DataFrame, id_col: str, label_col: str
):
    """Candidate-frame filter: join keys-only label projections and keep
    cross-label pairs. Runs on (query_id, neighbor_id) rows before any
    vector payload moves."""
    ql = queries.select(
        F.col(id_col).alias("query_id"), F.col(label_col).alias("query_label")
    )
    cl = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("neighbor_label"),
    )

    def apply(cand: DataFrame) -> DataFrame:
        return (
            cand.join(ql, "query_id")
            .join(cl, "neighbor_id")
            .filter(F.col("query_label") != F.col("neighbor_label"))
        )

    return apply


def bitext_mine(
    src: DataFrame,
    tgt: DataFrame,
    k: int = 4,
    margin_threshold: float = 1.0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
    candidates_bwd: DataFrame | None = None,
) -> DataFrame:
    """Margin-based parallel-pair mining between two embedding corpora —
    the LASER/CCMatrix recipe (Artetxe & Schwenk 2019) for harvesting
    translation pairs / cross-modal alignments from unaligned corpora.

    For each candidate pair the raw cosine is normalized by the mean
    cosine of each endpoint's k nearest neighbors:
    ``margin(x,y) = cos(x,y) / ((avg_knn(x) + avg_knn(y)) / 2)`` — the
    "ratio" margin. This demotes hubness: a vector that is merely close
    to EVERYTHING scores high raw cosine but margin ≈ 1 against all of
    them. A pair is emitted only when each side is the other's best
    margin partner (mutual top-1) and the margin clears the threshold.

    Scale shape: candidate generation is pluggable IN BOTH DIRECTIONS —
    the default exact tier runs :func:`cosine_topk` both ways (fine when
    one side broadcasts); at 100 TB pass ``candidates`` (src→tgt) from
    the LSH/IVF tier (``lsh_bucketed_topk`` / ``ivf_topk`` — same output
    columns) and either pass ``candidates_bwd`` (tgt→src, same schema:
    query_id is the TGT id) or let the backward kNN means be derived
    from the forward frame by re-ranking it per ``neighbor_id`` — so no
    corpus-wide exact scorer ever runs when candidates are supplied.
    The margin/mutual logic — equi-joins and two windows over the |X|·k
    candidate frame, never the corpus — is unchanged. Cross-engine
    determinism: margins are ratios of integer-exact sums of the
    4dp-rounded cosines (scaled ×10⁴), so ranking needs no float
    tolerance anywhere.

    Returns: src_id, tgt_id, cos_sim, margin (both rounded 4dp).
    """
    fwd = (
        candidates
        if candidates is not None
        else cosine_topk(src, tgt, k=k, id_col=id_col, vec_col=vec_col)
    )
    # pinned (r14): each kNN frame is consumed by TWO subtrees (the
    # candidate union AND its endpoint's kNN-mean aggregate; three for
    # fwd when bwd is derived from it) — unpinned, the exact cosine_topk
    # scorer (an all-pairs broadcast join + per-pair dot) executed once
    # PER CONSUMER (16 parquet scans / 32 Windows in the before-plan).
    # The pins are candidate-tier: |X|*k rows of (ids, cos, rank), never
    # vectors — metadata-sized at 100 TB.
    fwd = fwd.localCheckpoint(eager=False)
    if candidates_bwd is not None:
        bwd = candidates_bwd
    elif candidates is not None:
        # derive the backward kNN frame from the forward candidates:
        # re-rank the same (src, tgt, cos) rows per tgt endpoint. This
        # keeps the whole recipe on the candidate tier (no exact
        # corpus-wide scorer) at the cost of the backward mean being
        # computed over the forward tier's recall.
        w_bwd = Window.partitionBy("neighbor_id").orderBy(
            F.col("cos_sim").desc(), F.col("query_id").asc()
        )
        bwd = (
            fwd.withColumn("rank", F.row_number().over(w_bwd))
            .filter(F.col("rank") <= k)
            .select(
                F.col("neighbor_id").alias("query_id"),
                F.col("query_id").alias("neighbor_id"),
                "cos_sim",
                "rank",
            )
        )
    else:
        bwd = cosine_topk(tgt, src, k=k, id_col=id_col, vec_col=vec_col)
    bwd = bwd.localCheckpoint(eager=False)
    c_int = F.round(F.col("cos_sim") * 10000).alias("c_int")
    fx = fwd.select(
        F.col("query_id").alias("src_id"), F.col("neighbor_id").alias("tgt_id"), c_int
    )
    bx = bwd.select(
        F.col("neighbor_id").alias("src_id"), F.col("query_id").alias("tgt_id"), c_int
    )
    cands = fx.unionByName(bx).distinct()
    a_src = fwd.groupBy(F.col("query_id").alias("src_id")).agg(
        F.sum(F.round(F.col("cos_sim") * 10000)).alias("a_src"),
        F.count(F.lit(1)).cast("double").alias("n_src"),
    )
    a_tgt = bwd.groupBy(F.col("query_id").alias("tgt_id")).agg(
        F.sum(F.round(F.col("cos_sim") * 10000)).alias("a_tgt"),
        F.count(F.lit(1)).cast("double").alias("n_tgt"),
    )
    scored = (
        cands.join(a_src, "src_id")
        .join(a_tgt, "tgt_id")
        .withColumn(
            "margin",
            F.lit(2.0) * F.col("c_int")
            / (F.col("a_src") / F.col("n_src") + F.col("a_tgt") / F.col("n_tgt")),
        )
    )
    w_src = Window.partitionBy("src_id").orderBy(
        F.col("margin").desc(), F.col("tgt_id").asc()
    )
    w_tgt = Window.partitionBy("tgt_id").orderBy(
        F.col("margin").desc(), F.col("src_id").asc()
    )
    return (
        scored.withColumn("r_src", F.row_number().over(w_src))
        .withColumn("r_tgt", F.row_number().over(w_tgt))
        .filter(
            (F.col("r_src") == 1)
            & (F.col("r_tgt") == 1)
            & (F.col("margin") >= F.lit(float(margin_threshold)))
        )
        .select(
            "src_id",
            "tgt_id",
            (F.col("c_int") / 10000).alias("cos_sim"),
            F.round("margin", 4).alias("margin"),
        )
    )
