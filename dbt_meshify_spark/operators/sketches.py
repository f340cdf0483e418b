"""Deterministic mergeable sketches: count-min frequency estimation and
Bloom-filter membership (A4 approx tier / N-decontam prefilter).

The existing sketch query (``ext_approx_sketches``: HLL++ +
``percentile_approx``) is rows-only by design — those sketches' internals
differ per engine. These two close that verification gap: the hash
functions are the repo's md5-prefix integer form (first 8 hex digits as an
integer — ``sampling._md5_uniform`` / ``dsir._bucket`` discipline), so every
sketch CELL and every membership FLAG is bit-reproducible in any SQL engine
and the DuckDB oracle replays the sketch itself, not just its contract.

No reference analog (dbt-meshify has no data plane); the published recipes
are Cormode–Muthukrishnan (count-min, 2005) and Bloom (1970) as used by
CCNet/Dolma-style dedup+decontamination pipelines.

Scale design (100 TB posture):

- **Count-min**: the sketch is a ``depth × width`` counter table —
  construction-bounded at ``depth*width`` rows (default 4×1024 = 4096)
  REGARDLESS of corpus size or key cardinality, and mergeable by cell-wise
  sum (streaming / per-shard build then union-groupBy). Build is one pass:
  explode each key to ``depth`` (row, bucket) cells, partial-aggregated
  map-side so at most ``depth*width`` rows per partition cross the wire.
  Estimation joins the probe side against the broadcast sketch — ``depth``
  broadcast hash joins on precomputed bucket columns, NO explode and NO
  re-group, so probing adds zero shuffles.
- **Bloom**: the filter is a distinct-position set bounded at ``num_bits``
  rows (default 8192) regardless of how many grams were inserted — the
  constant-size broadcast alternative to shipping the full eval gram set
  (``decontam.eval_gram_set`` broadcasts O(distinct grams); this broadcasts
  O(bits)). Membership is ``num_hashes`` broadcast left joins on the gram's
  precomputed positions — map-side, text never shuffles; the only exchange
  in the end-to-end audit is the final per-doc scalar aggregation. False
  positives are deterministic given the hash seeds; the audit emits
  ``bloom_matched - exact_matched`` per doc so the FP cost is measured, not
  assumed (expected rate ``(1 - exp(-k*n/m))^k``). At 100 TB the intended
  deployment is bloom-prefilter → exact-verify only the flagged docs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbt_meshify_spark.operators.dedup import _with_tokens, shingles_of_tokens
from dbt_meshify_spark.operators.sampling import hex8_int


def _md5_mod(col: Column, salt: str, mod: int) -> Column:
    """``int(md5(salt|value)[:8], 16) % mod`` — the engine-portable hash
    (``sampling.hex8_int`` core; replayable in DuckDB via
    ``queries.extensions._hex8_sum``). The salt makes the ``depth`` /
    ``num_hashes`` functions distinct; a null value hashes to null
    (F.concat, not concat_ws — sketch callers filter or group nulls
    explicitly).
    """
    return hex8_int(F.md5(F.concat(F.lit(salt + "|"), col))) % F.lit(mod)


def cms_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Build a count-min sketch over ``df[key_col]`` occurrences.

    Returns ``(r, b, c)`` — at most ``depth * width`` rows by construction
    (mergeable across shards by ``groupBy(r, b).sum(c)``). One pass, one
    partial-aggregated shuffle of (r, b) cells.
    """
    cells = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).cast("int").alias("r"),
                        _md5_mod(F.col(key_col), f"{prefix}{i}", width).alias("b"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return cells.groupBy(
        F.col("rb.r").alias("r"), F.col("rb.b").alias("b")
    ).agg(F.count("*").alias("c"))


def cms_estimate(
    probe: DataFrame,
    sketch: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
    prefix: str = "cms",
    out_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for every probe row: ``min`` over the
    ``depth`` counters (the count-min estimate — always >= true count).

    ``depth`` broadcast joins against per-row slices of the bounded sketch;
    no explode, no re-group — probing is map-side.
    """
    out = probe
    ests = []
    for i in range(depth):
        bi, ci = f"__b{i}", f"__c{i}"
        out = out.withColumn(bi, _md5_mod(F.col(key_col), f"{prefix}{i}", width))
        row_i = sketch.filter(F.col("r") == i).select(
            F.col("b").alias(bi), F.col("c").alias(ci)
        )
        out = out.join(F.broadcast(row_i), bi, "left")
        ests.append(F.coalesce(F.col(ci), F.lit(0)))
    est = F.least(*ests) if depth > 1 else ests[0]
    return out.withColumn(out_col, est.cast("bigint")).drop(
        *[c for i in range(depth) for c in (f"__b{i}", f"__c{i}")]
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold_frac: float = 0.005,
    depth: int = 4,
    width: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Keys whose count-min estimate reaches ``threshold_frac`` of total
    occurrences, with the exact count alongside for the audit.

    Returns ``(key_col, cms_est, true_count, overcount)`` — ``overcount =
    cms_est - true_count >= 0`` always (count-min never undercounts), and
    ``cms_est <= true_count + e/width * N`` with probability
    ``1 - exp(-depth)`` per the standard bound. The candidate set is the
    distinct-key table (Heaps-sublinear for token keys — the same posture as
    the token_stats family).

    The sketch is MATERIALIZED driver-side (the IVF-centroid posture,
    similarity.py: a construction-bounded collect of <= depth*width rows)
    so the ``depth`` probe joins hit a local relation instead of
    re-executing the build pipeline per slice — the corpus is scanned once
    for the sketch and once for the exact audit, never ``depth`` times.
    The grand total falls out of the materialized sketch for free (row 0's
    cells sum to N), so it costs no third pass.
    """
    # pinned (r14, the _kept_gram_index discipline): `df` feeds TWO jobs —
    # the sketch-build collect (runs at construction) and the exact-count
    # audit (runs at action time) — so an expensive upstream derivation
    # (e.g. the tokenize+explode the declared query passes in) executed
    # once per job. The sketch collect materializes the pin; the audit
    # reads it back. Occurrence-sized (one key column), documented in
    # SCALE.md with the LM staging pins.
    df = df.localCheckpoint(eager=False)
    cells = cms_sketch(df, key_col, depth, width, prefix).collect()
    return heavy_hitters_from_cells(
        cells, df, key_col, threshold_frac, depth, width, prefix
    )


def heavy_hitters_from_cells(
    cells: list,
    truth_src: DataFrame,
    key_col: str,
    threshold_frac: float = 0.005,
    depth: int = 4,
    width: int = 1024,
    prefix: str = "cms",
) -> DataFrame:
    """Shared report tail for the batch and streaming CMS builds: probe the
    materialized cell list (<= depth*width rows) against the exact counts of
    ``truth_src[key_col]``. The grand total falls out of the cells (row 0
    sums to N) — no extra corpus pass."""
    spark = truth_src.sparkSession
    sketch = spark.createDataFrame(
        [(r.r, r.b, r.c) for r in cells], "r int, b bigint, c bigint"
    )
    total = float(sum(r.c for r in cells if r.r == 0))
    truth = truth_src.groupBy(key_col).agg(
        F.count("*").cast("bigint").alias("true_count")
    )
    est = cms_estimate(truth, sketch, key_col, depth, width, prefix)
    return est.filter(
        F.col("cms_est") >= F.lit(total * float(threshold_frac))
    ).select(
        key_col,
        "cms_est",
        "true_count",
        (F.col("cms_est") - F.col("true_count")).cast("bigint").alias("overcount"),
    )


def bloom_positions(
    keys: DataFrame,
    key_col: str,
    num_bits: int = 8192,
    num_hashes: int = 3,
    prefix: str = "bl",
) -> DataFrame:
    """Distinct set-bit positions of a Bloom filter over ``keys[key_col]``.

    At most ``num_bits`` rows by construction — a constant-size relation no
    matter how many keys were inserted; callers broadcast it. Mergeable
    across shards by distinct-union.
    """
    return (
        keys.select(
            F.explode(
                F.array(
                    *[
                        _md5_mod(F.col(key_col), f"{prefix}{j}", num_bits)
                        for j in range(num_hashes)
                    ]
                )
            ).alias("p")
        )
        .distinct()
    )


def bloom_member(
    df: DataFrame,
    key_col: str,
    positions: DataFrame,
    num_bits: int = 8192,
    num_hashes: int = 3,
    prefix: str = "bl",
    out_col: str = "bloom_hit",
) -> DataFrame:
    """Flag each row whose key's ``num_hashes`` positions are ALL set.

    ``num_hashes`` broadcast left joins on precomputed position columns —
    map-side, no explode/re-group, the key column never shuffles. No false
    negatives; false positives deterministic given the salts.
    """
    out = df
    hits = []
    for j in range(num_hashes):
        pj, mj = f"__p{j}", f"__m{j}"
        out = out.withColumn(pj, _md5_mod(F.col(key_col), f"{prefix}{j}", num_bits))
        pos_j = positions.select(F.col("p").alias(pj), F.lit(1).alias(mj))
        out = out.join(F.broadcast(pos_j), pj, "left")
        hits.append(F.col(mj).isNotNull())
    flag = hits[0]
    for h in hits[1:]:
        flag = flag & h
    return out.withColumn(out_col, flag).drop(
        *[c for j in range(num_hashes) for c in (f"__p{j}", f"__m{j}")]
    )


def bloom_decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_bits: int = 8192,
    num_hashes: int = 3,
    min_overlap: float = 0.2,
) -> DataFrame:
    """Bloom-prefiltered n-gram decontamination audit vs the exact join.

    Per train document (with >= 1 distinct word ``n``-gram — the
    ``decontam.ngram_overlap`` gram semantics): ``n_grams``,
    ``bloom_matched`` (grams the filter flags), ``exact_matched`` (grams
    truly in the eval set), ``false_pos = bloom_matched - exact_matched``
    (never negative — Bloom has no false negatives), ``bloom_overlap``
    (rounded), and ``contaminated_bloom`` on the ROUNDED overlap (the
    SURVEY §2.7 flag discipline). The Bloom flag is a superset of the exact
    flag at equal thresholds — the safe direction for decontamination.
    """
    from dbt_meshify_spark.operators.decontam import eval_gram_set

    evals = eval_gram_set(eval_df, text_col, n)
    # materialize the bounded position set driver-side (<= num_bits rows by
    # construction — the IVF-centroid collect posture): the num_hashes
    # membership joins then hit a LOCAL relation instead of re-executing
    # the eval tokenize->distinct pipeline once per hash function
    spark = train_df.sparkSession
    pos_rows = bloom_positions(evals, "gram", num_bits, num_hashes).collect()
    pos = spark.createDataFrame([(r.p,) for r in pos_rows], "p bigint")
    grams = (
        _with_tokens(train_df.select(id_col, text_col), text_col)
        .withColumn("__grams", shingles_of_tokens(F.col("__toks"), n))
        .select(F.col(id_col), F.explode("__grams").alias("gram"))
    )
    flagged = bloom_member(grams, "gram", pos, num_bits, num_hashes)
    flagged = flagged.join(
        F.broadcast(evals.withColumn("__ex", F.lit(1))), "gram", "left"
    )
    agg = flagged.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_grams"),
        F.sum(F.col("bloom_hit").cast("int")).cast("bigint").alias("bloom_matched"),
        F.coalesce(F.sum("__ex"), F.lit(0)).cast("bigint").alias("exact_matched"),
    )
    overlap = F.round(
        F.col("bloom_matched").cast("double") / F.col("n_grams"), 4
    ) + F.lit(0.0)
    return agg.select(
        F.col(id_col),
        "n_grams",
        "bloom_matched",
        "exact_matched",
        (F.col("bloom_matched") - F.col("exact_matched"))
        .cast("bigint")
        .alias("false_pos"),
        overlap.alias("bloom_overlap"),
        (overlap >= F.lit(float(min_overlap))).alias("contaminated_bloom"),
    )


def _md5_hex8(col: Column, salt: str) -> Column:
    """Full 32-bit integer value of the first 8 md5 hex digits (no mod) —
    the uniform the KMV estimator divides by (``sampling.hex8_int`` core;
    null values hash to null and KMV filters them up front)."""
    return hex8_int(F.md5(F.concat(F.lit(salt + "|"), col.cast("string"))))


def kmv_cardinality(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    k: int = 256,
    prefix: str = "kmv",
) -> DataFrame:
    """K-minimum-values distinct-count sketch per key — the hash-checked
    cardinality tier (the DataSketches theta/KMV family; Bar-Yossef et
    al., 2002), completing the deterministic sketch trio with CMS
    (frequency) and Bloom (membership). ``ext_approx_sketches``' HLL++
    stays the production mapping note; KMV is the variant whose every
    retained hash an independent SQL engine reproduces.

    Estimator: with ``d`` distinct values hashed uniformly into (0, 1),
    the k-th smallest hash ``u_k`` ~= k/d, so ``est = (k-1)/u_k``
    (unbiased form); when a key holds fewer than ``k`` distinct values the
    sketch IS the exact set and the estimate is exact. State is ``k``
    8-byte hashes per key — mergeable by union + re-take-k-smallest.

    Plan shape: one distinct (key, hash) partial-agg shuffle, then the
    skew-safe ``topk_per_key`` combiner (each input partition contributes
    <= k survivors per key before the per-key shuffle — a hot key moves
    k*P rows, never its full mass). Returns per key: ``n_exact`` (audit),
    ``n_kept``, ``kmv_est``, ``rel_err``.
    """
    from dbt_meshify_spark.operators.skew import topk_per_key

    # NULL values are excluded up front, matching COUNT(DISTINCT) semantics
    # on the audit side — and keeping the retained-hash ordering total (a
    # null hash would also rank nulls-first in Spark but nulls-last in an
    # ASC SQL replay)
    hv = _md5_hex8(F.col(value_col), prefix).alias("__hv")
    dh = df.filter(F.col(value_col).isNotNull()).select(*key_cols, hv).distinct()
    kept = topk_per_key(dh, key_cols, [F.col("__hv").asc()], k)
    sk = kept.groupBy(*key_cols).agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.max("__hv").alias("__kmax"),
    )
    exact = df.groupBy(*key_cols).agg(
        F.countDistinct(value_col).cast("bigint").alias("n_exact")
    )
    est = F.when(
        F.col("n_kept") < F.lit(int(k)), F.col("n_kept").cast("double")
    ).otherwise(
        F.lit(float(k - 1))
        / ((F.col("__kmax").cast("double") + F.lit(0.5)) / F.lit(float(16**8)))
    )
    est_r = F.round(est, 4) + F.lit(0.0)
    rel = F.round(
        F.abs(est - F.col("n_exact").cast("double"))
        / F.col("n_exact").cast("double"),
        4,
    ) + F.lit(0.0)
    return exact.join(sk, key_cols).select(
        *key_cols,
        "n_exact",
        "n_kept",
        est_r.alias("kmv_est"),
        rel.alias("rel_err"),
    )


def _grid_bucket(col: Column, lo: float, hi: float, width: int) -> Column:
    """Canonical grid-bucket expression — ONE copy because the operation
    order is load-bearing for cross-engine IEEE parity (oracles write
    ``CAST(LEAST(width-1.0, GREATEST(0.0, FLOOR((v - lo) / span * width)))
    AS INT)`` with identical order). The clamp runs in the DOUBLE domain
    BEFORE the INT cast: casting the unclamped value would saturate in
    Spark's non-ANSI cast but raise in an ANSI oracle for outliers beyond
    the int range, so neither engine may cast first. (Spark's floor(double)
    returns LONG and saturates on extreme doubles — harmless, because the
    clamp maps anything past the grid edge to the edge bucket either way.)

    NaN and NULL are pinned to a NULL bucket HERE, not left to call-site
    filters: Spark's GREATEST/LEAST ignore NULL and propagate NaN, so an
    unfiltered NULL lands in bucket 0 and NaN in bucket 0 — while DuckDB
    treats NaN as largest (bucket width-1) — a silent cross-engine mismatch
    if any future caller forgets the upstream ``v IS NOT NULL AND NOT
    isnan(v)`` filter (every current caller filters, so this branch is dead
    today; it exists so the invariant doesn't depend on every call site).
    The SQL twin is ``CASE WHEN v IS NULL OR isnan(v) THEN NULL ELSE
    <grid expr> END`` — current oracles instead filter in their data CTE,
    which is equivalent.
    """
    span = float(hi) - float(lo)
    b = F.least(
        F.lit(float(int(width) - 1)),
        F.greatest(
            F.lit(0.0),
            F.floor(
                (col - F.lit(float(lo))) / F.lit(span) * F.lit(int(width))
            ).cast("double"),
        ),
    ).cast("int")
    bad = col.isNull() | F.isnan(col.cast("double"))
    return F.when(bad, F.lit(None).cast("int")).otherwise(b)


def _grid_estimate(lo: float, hi: float, width: int) -> Column:
    """Canonical rank-interpolation expression over (b, c, cum, r) columns
    — ``lo + (b + (r - cum_before)/c) * span / width`` in this exact order
    on both engines (the weighted and unweighted tiers and both oracles
    share it)."""
    span = float(hi) - float(lo)
    frac = (F.col("r") - (F.col("cum") - F.col("c"))).cast("double") / F.col(
        "c"
    ).cast("double")
    return (
        F.lit(float(lo))
        + (F.col("b").cast("double") + frac) * F.lit(span) / F.lit(int(width))
    )


def quantile_sketch_cells(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    width: int = 128,
) -> DataFrame:
    """Fixed-grid quantile sketch per key: bucket counts over a ``width``-
    cell uniform grid spanning ``[lo, hi)`` — the quantile member of the
    deterministic sketch family (CMS frequency, Bloom membership, KMV
    cardinality). Unlike t-digest / ``percentile_approx`` (rows-only —
    centroid internals differ per engine) the state is pure integer
    arithmetic, so every CELL and the interpolated estimate itself replay
    in an independent SQL engine.

    Returns ``(key_cols..., b, c)`` — at most ``width`` cells per key BY
    CONSTRUCTION regardless of row count, mergeable across shards /
    micro-batches by ``groupBy(key, b).sum(c)`` (integer cell sums are
    order-free). Out-of-range values clamp into the edge buckets (the
    estimate then saturates at the grid edge — callers choose the grid
    from domain knowledge, the same contract as bounded_contribution's
    ``[lo, hi]``). NULL and NaN values are excluded (Spark's non-ANSI
    CAST(floor(NaN)) would bucket silently while an ANSI oracle raises —
    oracles must mirror the NaN exclusion).

    Scale shape (100 TB posture): ONE partial-aggregated shuffle of
    (key, bucket) cells — at most ``width`` rows per key per input
    partition cross the wire, never the value mass. Accuracy is a grid
    resolution of ``(hi - lo) / width`` worst-case per estimate — rank
    error <= the largest single-bucket mass, the classic fixed-histogram
    bound; widen ``width`` (state is O(width), not O(n)) to tighten.
    """
    b = _grid_bucket(F.col(value_col), lo, hi, width)
    return (
        df.filter(
            F.col(value_col).isNotNull()
            & ~F.isnan(F.col(value_col).cast("double"))
        )
        .groupBy(*key_cols, b.alias("b"))
        .agg(F.count("*").cast("bigint").alias("c"))
    )


def quantile_sketch_report(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    width: int = 128,
) -> DataFrame:
    """Per-(key, q) quantile estimates from the fixed-grid sketch, with the
    EXACT rank-``ceil(q*n)`` value alongside as the audit (a discrete
    quantile is an actual data value — no interpolation, so it is
    engine-exact where interpolated exact quantiles sit on half-ulp
    boundaries, the SURVEY §2.7 hazard).

    Estimator: target rank ``r = ceil(q * n)``; the estimate walks the
    cumulative cell counts to the bucket holding rank ``r`` and linearly
    interpolates within it:
    ``est = lo + (b + (r - cum_before) / c) * span / width``
    (every operation in this exact order on both engines — IEEE doubles
    are then bit-identical). The cumulative walk is a window over <= width
    cells per key (bounded partitions, never a data-sized sort); the audit
    rank-select is ONE value-ordered window per key joined against the
    (key, q, r) targets — the only data-sized shuffle, and it exists only
    for the audit columns, not the sketch path.

    Returns ``(key_cols..., q, n, est_q, true_q, abs_err)``.
    """
    data = df.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
    )
    cells = quantile_sketch_cells(data, key_cols, value_col, lo, hi, width)
    return quantile_report_from_cells(
        cells, data, key_cols, value_col, qs, lo, hi, width
    )


def quantile_report_from_cells(
    cells: DataFrame,
    data: DataFrame,
    key_cols: list[str],
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    width: int = 128,
) -> DataFrame:
    """Shared report tail for the batch and streaming quantile-sketch
    builds (the ``heavy_hitters_from_cells`` discipline): estimate from an
    already-materialized/merged cell table, exact rank audit from
    ``data``. ``data`` must be pre-filtered to non-null values (the batch
    wrapper and the streaming twin's corpus view both are)."""
    from pyspark.sql.window import Window

    spark = data.sparkSession
    wcum = Window.partitionBy(*key_cols).orderBy("b")
    cum = cells.withColumn("cum", F.sum("c").over(wcum))
    tot = cells.groupBy(*key_cols).agg(F.sum("c").cast("bigint").alias("n"))
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    # greatest(1, …): rank 0 (q = 0.0) must resolve to the minimum, not
    # vanish — the hit filter (cum - c) < r matches no bucket at r = 0
    targets = tot.crossJoin(F.broadcast(qdf)).withColumn(
        "r",
        F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("n"))).cast("bigint"),
    )
    hit = cum.join(targets, key_cols).filter(
        (F.col("cum") >= F.col("r")) & ((F.col("cum") - F.col("c")) < F.col("r"))
    )
    est = _grid_estimate(lo, hi, width)
    est_df = hit.select(*key_cols, "q", "n", "r", est.alias("__est"))
    # exact audit: the value at rank r per key (ties in the value order
    # cannot change the emitted VALUE, so row_number is deterministic here)
    wv = Window.partitionBy(*key_cols).orderBy(F.col("__v").asc())
    ranked = data.select(*key_cols, F.col(value_col).alias("__v")).withColumn(
        "r", F.row_number().over(wv).cast("bigint")
    )
    out = est_df.join(ranked, [*key_cols, "r"])
    est_r = F.round(F.col("__est"), 4) + F.lit(0.0)
    err_r = F.round(F.abs(F.col("__est") - F.col("__v")), 4) + F.lit(0.0)
    return out.select(
        *key_cols,
        "q",
        "n",
        est_r.alias("est_q"),
        (F.round(F.col("__v"), 4) + F.lit(0.0)).alias("true_q"),
        err_r.alias("abs_err"),
    )


def weighted_quantile_report(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    weight_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    width: int = 128,
) -> DataFrame:
    """WEIGHTED fixed-grid quantiles: "below which value does fraction q of
    the total WEIGHT sit" — the token-mass question a budget planner asks
    (e.g. the document length under which half the corpus's tokens live,
    which the unweighted row percentile badly misstates when long docs
    carry most of the mass). Same grid state as the count sketch, cells
    summing INTEGER weights instead of rows, so everything stays
    engine-exact: rank ``r = ceil(q * W)`` over the bigint weight total,
    the same pinned-order interpolation, and the exact audit = the first
    value whose cumulative weight reaches ``r`` (an actual data value).

    Plan shape matches :func:`quantile_sketch_report`: one (key, bucket)
    partial-agg shuffle of <= width integer cells per key (mergeable by
    cell sum), bounded cumulative window, broadcast (q, r) targets; the
    exact audit is the only data-sized window and rides the same key
    family. Rows with NULL or non-positive weight are excluded (zero
    weight cannot hold a quantile; negative weight breaks monotonicity);
    fractional weights quantize by CEIL into integer units — exact for
    integer weights, and every positive weight counts at least 1 (a bare
    cast would silently truncate sub-1 weights to nothing).

    Returns ``(key_cols..., q, total_w, est_q, true_q, abs_err)``.
    """
    data = df.filter(
        F.col(value_col).isNotNull()
        & ~F.isnan(F.col(value_col).cast("double"))
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col) > 0)
    ).select(
        *key_cols,
        F.col(value_col).cast("double").alias("__v"),
        F.ceil(F.col(weight_col)).cast("bigint").alias("__w"),
    )
    b = _grid_bucket(F.col("__v"), lo, hi, width)
    cells = data.groupBy(*key_cols, b.alias("b")).agg(
        F.sum("__w").cast("bigint").alias("c")
    )
    return weighted_quantile_from_cells(
        cells, data, key_cols, qs, lo, hi, width
    )


def weighted_quantile_from_cells(
    cells: DataFrame,
    data: DataFrame,
    key_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    width: int = 128,
) -> DataFrame:
    """Shared report tail for the batch and streaming weighted-quantile
    builds (the quantile_report_from_cells discipline): estimate from an
    already-materialized/merged integer weight-cell table; the exact
    crossing-value audit reads ``data``, which must already carry the
    normalized ``__v`` (double value) / ``__w`` (positive bigint weight)
    columns the batch wrapper and the streaming twin both produce."""
    from pyspark.sql.window import Window

    spark = data.sparkSession
    span = float(hi) - float(lo)
    wcum = Window.partitionBy(*key_cols).orderBy("b")
    cum = cells.withColumn("cum", F.sum("c").over(wcum))
    tot = cells.groupBy(*key_cols).agg(
        F.sum("c").cast("bigint").alias("total_w")
    )
    qdf = spark.createDataFrame([(float(q),) for q in qs], "q double")
    # greatest(1, …): the q = 0.0 rank-0 guard (quantile_report_from_cells
    # discipline)
    targets = tot.crossJoin(F.broadcast(qdf)).withColumn(
        "r",
        F.greatest(F.lit(1), F.ceil(F.col("q") * F.col("total_w"))).cast(
            "bigint"
        ),
    )
    hit = cum.join(targets, key_cols).filter(
        (F.col("cum") >= F.col("r")) & ((F.col("cum") - F.col("c")) < F.col("r"))
    )
    est = _grid_estimate(lo, hi, width)
    est_df = hit.select(*key_cols, "q", "total_w", "r", est.alias("__est"))
    # exact audit: the first value (in value order) whose cumulative weight
    # reaches rank r. Tie values: the cumulative weight at the LAST row of
    # a tie run is order-independent, and any row of the run yields the
    # same __v, so a (value, weight-irrelevant) tie cannot flip the audit —
    # but the within-run cum is order-sensitive, so the window orders by
    # (__v, __w) and the pick takes MIN(__v) over qualifying rows instead
    # of trusting a row_number.
    wv = Window.partitionBy(*key_cols).orderBy(
        F.col("__v").asc(), F.col("__w").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = data.withColumn("cw", F.sum("__w").over(wv))
    picked = (
        ranked.join(
            est_df.select(*key_cols, "q", "r"), key_cols
        )
        .filter(F.col("cw") >= F.col("r"))
        .groupBy(*key_cols, "q")
        .agg(F.min("__v").alias("__tv"))
    )
    out = est_df.join(picked, [*key_cols, "q"])
    est_r = F.round(F.col("__est"), 4) + F.lit(0.0)
    err_r = F.round(F.abs(F.col("__est") - F.col("__tv")), 4) + F.lit(0.0)
    return out.select(
        *key_cols,
        "q",
        "total_w",
        est_r.alias("est_q"),
        (F.round(F.col("__tv"), 4) + F.lit(0.0)).alias("true_q"),
        err_r.alias("abs_err"),
    )
