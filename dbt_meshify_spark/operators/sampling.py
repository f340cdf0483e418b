"""Deterministic sampling, dataset mixing, and training-shard assignment.

The operators a large-scale training-data pipeline needs between "corpus" and
"training run": reproducible sampling (no RNG state — membership is a pure
function of the row key), per-stratum rates, weighted source mixing with
up/down-sampling, and shard assignment for writing a globally-shuffled
training set. No analog exists in the reference (dbt-meshify governs models,
it never samples data) — these extend the data plane per SURVEY.md §2.6.

Scale design (100 TB posture):
- Membership tests are narrow JVM-side projections over ``md5`` — no shuffle,
  no RNG seeds to coordinate across executors, and re-running the job on the
  same corpus selects the same rows (critical for reproducible training sets
  and for incremental top-ups: a rate increase strictly grows the sample, see
  ``deterministic_sample``).
- Hash-mod shard assignment (``shard_assignment``) is shuffle-free; the
  sorted-shard writer (``write_training_shards``) uses ``repartitionByRange``
  on the hash key — Spark samples range boundaries and does ONE shuffle, the
  same machinery as a distributed sort, then writes one file per shard. The
  hash key makes the "sort" a global shuffle of the corpus, which is exactly
  what a training reader wants (no curriculum bias from source locality).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HEX_WIDTH = 8  # threshold resolution: 16^-8 ~ 6e-10 rate granularity


def _rate_threshold(rate: float) -> str:
    """Hex threshold t such that P[md5(key) < t] = rate for uniform md5."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return format(int(rate * (16**_HEX_WIDTH)), f"0{_HEX_WIDTH}x")


def _sample_key(key_cols: list[str], seed: str) -> Column:
    """md5 over the seed-prefixed row key; lowercase hex in [0, 16^32)."""
    parts = [F.lit(f"{seed}|")] + [F.col(c).cast("string") for c in key_cols]
    return F.md5(F.concat_ws("", *parts))


def hex8_int(md5_col: Column) -> Column:
    """Integer value of the first 8 hex digits of an md5 column — the ONE
    hash core shared by the sampling uniforms and the sketch tier
    (operators/sketches.py); a SQL oracle replays it digit-by-digit via
    ``queries.extensions._hex8_sum``. Null md5 input yields null — callers
    own their null policy (``_sample_key`` maps null keys to the bare-seed
    hash via concat_ws; the sketches' salted concat keeps nulls null)."""
    return F.conv(F.substring(md5_col, 1, 8), 16, 10).cast("long")


def deterministic_sample(
    df: DataFrame, key_cols: list[str], rate: float, seed: str = "s0"
) -> DataFrame:
    """Keep rows whose md5(seed|key) falls below the rate threshold.

    Membership is a pure function of (seed, key): re-runs are identical, and
    samples NEST — the rate-0.1 sample is a strict subset of the rate-0.5
    sample for the same seed, so growing a training set never discards
    already-selected (and possibly already-tokenized) documents.
    """
    if rate >= 1.0:
        return df
    return df.filter(_sample_key(key_cols, seed) < _rate_threshold(rate))


def keep_top_fraction(
    df: DataFrame,
    score_col: str,
    fraction: float,
    id_col: str,
    exact: bool = True,
    relative_error: float = 0.01,
) -> DataFrame:
    """Keep the best ``fraction`` of rows by ``score_col`` — the
    quantile-threshold selection step of model-scored curation (keep the
    top-scoring X% of documents).

    ``exact=True`` ranks with ``percent_rank`` over a TOTAL order
    (score desc, id asc — deterministic under ties) and keeps
    ``pr <= fraction``; that is a global sort, the verification tier. At
    100 TB use ``exact=False``: ``approxQuantile`` computes the score
    threshold in one mergeable-sketch pass and the filter pushes down —
    no global sort, boundary fuzz bounded by ``relative_error``.
    """
    if exact:
        w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
        return df.withColumn("pr", F.percent_rank().over(w)).filter(
            F.col("pr") <= fraction
        )
    thresh = df.approxQuantile(score_col, [1.0 - fraction], relative_error)[0]
    return df.filter(F.col(score_col) >= thresh)


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    fractions: list[tuple[str, float]] | None = None,
    id_col: str = "doc_id",
    seed: str = "s0",
) -> DataFrame:
    """Train/val/test assignment that can NEVER leak near-duplicates across
    splits: the md5-threshold draw keys on the near-dup CLUSTER label, so
    every member of a duplicate cluster lands in the same split — splitting
    on doc_id alone puts a train doc's near-copy in the test set and
    silently inflates eval (the classic contamination bug group-aware
    splitting exists to prevent).

    ``fractions`` is an ordered [(label, fraction)] list summing to 1 (the
    last label takes the remainder). Returns ``id_col, cluster_id, split``.
    Scale shape: cluster resolution is the same keys-only
    ``connected_components`` pass dedup uses; the split itself is a pure
    md5 projection on the cluster label — deterministic, shuffle-free, and
    stable under corpus growth for unchanged clusters.
    """
    from dbt_meshify_spark.operators.dedup import dedup_clusters

    fractions = fractions or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    labels = [lab for lab, _ in fractions]
    clustered = dedup_clusters(df.select(id_col), pairs, id_col=id_col)
    key = F.md5(F.concat_ws("", F.lit(f"{seed}|"), F.col("cluster_id").cast("string")))
    expr: Column = F.lit(labels[-1])
    cum = 0.0
    branches = []
    for lab, frac in fractions[:-1]:
        cum += frac
        branches.append((lab, _rate_threshold(cum)))
    for lab, thresh in reversed(branches):
        expr = F.when(key < thresh, F.lit(lab)).otherwise(expr)
    return clustered.select(F.col(id_col), "cluster_id", expr.alias("split"))


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    rates: dict[str, float],
    key_cols: list[str],
    default_rate: float = 0.0,
    seed: str = "s0",
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language rates).

    One narrow filter — no groupBy, no shuffle: the per-stratum threshold is
    a CASE expression folded into the scan, so Catalyst pushes the whole
    predicate down and strata never need to be co-located.
    """
    thresh: Column = F.lit(_rate_threshold(default_rate))
    for value, rate in sorted(rates.items()):
        thresh = F.when(
            F.col(stratum_col) == value, F.lit(_rate_threshold(rate))
        ).otherwise(thresh)
    return df.filter(_sample_key(key_cols, seed) < thresh)


def mixture_copies(
    df: DataFrame,
    source_col: str,
    weights: dict[str, float],
    key_cols: list[str],
    seed: str = "s0",
) -> DataFrame:
    """Weighted dataset mixture: adds ``n_copies`` — how many epochs of this
    row the mixture takes (0 drops it, >1 up-samples).

    weight w -> n_copies = floor(w) + (md5(seed|key) < frac(w)), so the
    EXPECTED copy count equals w exactly while staying deterministic per row.
    Down-weighting (w < 1) is the stratified sample above; up-weighting
    (w > 1, e.g. a small high-quality source repeated 2.5x per epoch) never
    duplicates rows physically here — the training writer explodes
    ``n_copies`` at shard-write time so the duplication cost lands in the
    final shuffle, not in every intermediate stage.
    """
    base: Column = F.lit(0)
    frac_thresh: Column = F.lit(_rate_threshold(0.0))
    for value, w in sorted(weights.items()):
        if w < 0:
            raise ValueError(f"negative weight for {value!r}")
        whole, frac = int(w), w - int(w)
        base = F.when(F.col(source_col) == value, F.lit(whole)).otherwise(base)
        frac_thresh = F.when(
            F.col(source_col) == value, F.lit(_rate_threshold(frac))
        ).otherwise(frac_thresh)
    extra = (_sample_key(key_cols, seed) < frac_thresh).cast("int")
    return df.withColumn("n_copies", (base + extra).cast("int")).filter(
        F.col("n_copies") > 0
    )


def shard_assignment(
    df: DataFrame, key_cols: list[str], n_shards: int, seed: str = "s0"
) -> DataFrame:
    """Adds ``shard_id`` in [0, n_shards): fold of the md5 key's first 4 hex
    digits, mod n_shards. Pure projection — shuffle-free; rows land in a
    pseudo-random shard independent of their source/order (a global shuffle
    when the shards are later read in any order).
    """
    h = F.conv(F.substring(_sample_key(key_cols, seed), 1, 4), 16, 10).cast("int")
    return df.withColumn("shard_id", (h % n_shards).cast("int"))


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    n_shards: int = 64,
    seed: str = "s0",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget packs
    (training sequences), preserving document boundaries.

    Docs are sharded by md5 hash (shuffle key), then packed greedily in
    md5-key order within each shard: a doc joins the current pack unless
    that would exceed ``budget``, in which case it opens a new pack. A doc
    larger than the budget gets a pack alone, flagged ``oversize`` (callers
    split or truncate those upstream). Deterministic: same corpus + seed =>
    same packs.

    Returns one row per doc: ``id_col, tokens, shard_id, pack_id, pack_pos,
    oversize`` (``pack_id`` is shard-local; (shard_id, pack_id) is global).

    Scale design: packing is inherently sequential, so it is parallelized by
    sharding — one shuffle on shard_id, then an Arrow-batched applyInPandas
    runs the per-shard greedy scan (each shard is 1/n_shards of the corpus
    METADATA: id + token count only, never text — at 100 TB with 1e11 docs
    and n_shards=1e5, a shard's metadata is a few MB of Arrow). The packed
    assignment joins back to payloads by id afterwards.
    """
    import pandas as pd

    meta = shard_assignment(
        df.select(
            F.col(id_col), F.col(token_col).cast("long").alias("__tokens")
        ),
        [id_col],
        n_shards,
        seed,
    ).withColumn("__key", _sample_key([id_col], seed))

    out_schema = (
        f"{id_col} long, tokens long, shard_id int, pack_id long, "
        "pack_pos int, oversize boolean"
    )

    def pack(pdf: "pd.DataFrame") -> "pd.DataFrame":
        pdf = pdf.sort_values("__key", kind="mergesort").reset_index(drop=True)
        pack_ids, positions, oversize = [], [], []
        cur_pack, cur_tokens, cur_pos = 0, 0, 0
        for t in pdf["__tokens"]:
            t = int(t)
            if cur_pos > 0 and cur_tokens + t > budget:
                cur_pack += 1
                cur_tokens, cur_pos = 0, 0
            pack_ids.append(cur_pack)
            positions.append(cur_pos)
            oversize.append(t > budget)
            cur_tokens += t
            cur_pos += 1
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "tokens": pdf["__tokens"],
                "shard_id": pdf["shard_id"],
                "pack_id": pack_ids,
                "pack_pos": positions,
                "oversize": oversize,
            }
        )

    return meta.groupBy("shard_id").applyInPandas(pack, out_schema)


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    key_cols: list[str],
    seed: str = "s0",
    copies_col: str | None = None,
) -> None:
    """Write a globally-shuffled training set as ``n_shards`` sorted shards.

    ``repartitionByRange`` on the md5 sort key = Spark's distributed-sort
    shuffle (sampled range boundaries, one Exchange); each output partition
    is one contiguous hash range, so concatenating shards 0..n-1 replays the
    corpus in md5 order — a deterministic global shuffle. When ``copies_col``
    is given (from ``mixture_copies``), rows are exploded to that many copies
    here, each copy re-keyed so duplicates spread across different shards
    instead of clumping adjacently.
    """
    key = _sample_key(key_cols, seed)
    if copies_col is not None:
        df = df.withColumn(
            "_copy", F.explode(F.sequence(F.lit(1), F.col(copies_col)))
        )
        key = F.md5(F.concat_ws("", key, F.col("_copy").cast("string")))
        df = df.withColumn("_shuffle_key", key).drop("_copy")
    else:
        df = df.withColumn("_shuffle_key", key)
    (
        df.repartitionByRange(n_shards, F.col("_shuffle_key"))
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
        .write.mode("overwrite")
        .parquet(path)
    )


def sample_exact_k(
    df: DataFrame,
    k: int,
    by: list[str],
    key_cols: list[str],
    seed: str = "s0",
) -> DataFrame:
    """Exactly ``min(k, group size)`` rows per group, deterministically.

    The fraction-based samplers above cannot promise exact counts; this is
    the quota path (k eval docs per language, k examples per source). Rows
    rank by ``md5(seed|key)`` — a pure function of the row, so re-runs and
    different partitionings pick the SAME rows, and changing ``seed`` draws
    an independent quota. Skew-safe via skew.py::topk_per_key (local prune
    to ≤ k per input partition before the per-group window ranks survivors —
    a hot group never funnels its full membership through one task).
    """
    from dbt_meshify_spark.operators.skew import topk_per_key

    rank_key = _sample_key(key_cols, seed)
    return topk_per_key(df, by, [rank_key.asc()] + [F.col(c).asc() for c in key_cols], k).drop("rn")


def diverse_sample(
    emb: DataFrame,
    k: int,
    nlist: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "s0",
    iters: int = 4,
) -> DataFrame:
    """Coverage-aware subset selection: partition the embedding space into
    ``nlist`` IVF cells (spherical k-means, bounded driver-side training)
    and draw a deterministic ``ceil(k/nlist)`` quota from each, so every
    region of the space is represented instead of the densest mode
    dominating — the cheap distributed stand-in for k-center/facility-
    location selection, which is inherently sequential.

    Uniform-per-cell quotas are the point: a proportional draw reproduces
    the corpus density (what deterministic_sample already does); equal
    quotas oversample sparse regions, which is what "diverse" buys. Output
    is ``(id_col, cell)`` keys only — assignment is map-only, the quota
    draw is md5-ranked (re-run-stable, partitioning-independent) and
    skew-safe; at 100 TB the only shuffle is the per-cell top-quota prune.
    """
    import math

    from dbt_meshify_spark.operators.similarity import (
        assign_cells,
        train_ivf_centroids,
    )

    centroids = train_ivf_centroids(
        emb, nlist=nlist, iters=iters, id_col=id_col, vec_col=vec_col
    )
    cells = assign_cells(emb, centroids, vec_col=vec_col).select(
        F.col(id_col), F.col("cell")
    )
    quota = max(1, math.ceil(k / nlist))
    return sample_exact_k(cells, quota, by=["cell"], key_cols=[id_col], seed=seed)


def temperature_weights(
    df: DataFrame, source_col: str, alpha: float = 0.5
) -> dict[str, float]:
    """Temperature-based mixture weights (the multilingual/multi-source
    mixing rule of T5/PaLM-style training): sampling probability
    ``q_s ∝ n_s^alpha`` flattened toward uniform as ``alpha -> 0``, turned
    into per-row copy weights ``w_s = q_s * N / n_s`` so the mixture's
    expected TOTAL size stays N while small sources are up-sampled and
    dominant ones down-sampled.

    One aggregate job; the collect is bounded by the number of sources
    (dozens), the same bounded-collect posture as IVF centroid training.
    Feed the result straight into :func:`mixture_copies`.
    """
    counts = {
        r[0]: r[1]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1))).collect()
    }
    return temperature_weights_from_counts(counts, alpha)


def temperature_weights_from_counts(
    counts: dict[str, int], alpha: float = 0.5
) -> dict[str, float]:
    """Pure math of :func:`temperature_weights` (property-tested): per-source
    copy weight ``w_s = (n_s^alpha / Z) * N / n_s``."""
    if alpha < 0:
        raise ValueError(f"alpha must be >= 0, got {alpha}")
    n_total = sum(counts.values())
    z = sum(n**alpha for _, n in sorted(counts.items()))
    return {s: (n**alpha) / z * n_total / n for s, n in sorted(counts.items())}


def epoch_budget_plan(
    df: DataFrame,
    group_cols: list[str],
    token_budget: int,
    max_epochs: int = 4,
    token_col: str = "n_chars",
    rounds: int = 3,
) -> DataFrame:
    """Epoch-aware token-budget allocation under a repetition cap — the
    data-constrained mixing planner (Muennighoff et al., "Scaling
    Data-Constrained Language Models"): each group targets an EQUAL share
    of ``token_budget`` (the equal-representation posture that up-samples
    small high-quality sources), but no group may exceed ``max_epochs``
    passes over its own data; the share a capped group cannot absorb
    water-fills into the still-uncapped groups over ``rounds`` fixed
    redistribution rounds.

    Everything is INTEGER arithmetic (BIGINT sums, integer-division
    shares, LEAST caps), so the plan is bit-identical across engines and
    the oracle replays the rounds as unrolled CTEs — no float in the
    allocation path; the per-round flooring residue (< |pool| tokens per
    round) is deliberate and deterministic. Scale shape: one
    group-cardinality aggregate, then per round one 1-row totals
    aggregate broadcast back — the allocation frame never exceeds group
    cardinality, and nothing shuffles the corpus again.

    Returns one row per group: ``*group_cols, n_tokens, cap_tokens,
    alloc_tokens, epochs (alloc/n, 4dp), budget_frac (alloc/budget,
    4dp)``; groups with ``n_tokens = 0`` allocate 0.
    """
    if int(max_epochs) < 1:
        raise ValueError(f"max_epochs must be >= 1, got {max_epochs}")
    sizes = df.groupBy(*group_cols).agg(
        F.sum(F.col(token_col)).cast("bigint").alias("n_tokens")
    )
    # localCheckpoint pins the corpus aggregate AND each round's frame:
    # every round references its predecessor TWICE (totals + projection),
    # so unpinned lineage doubles per round — 2^rounds corpus scans, and
    # Spark's ReuseExchange does NOT dedup them (alias renumbering defeats
    # subplan equality; measured 8 FileScans at rounds=3). With the pins
    # the corpus aggregates exactly once (the graph-loop discipline).
    alloc = sizes.select(
        *group_cols,
        "n_tokens",
        (F.col("n_tokens") * F.lit(int(max_epochs))).alias("cap_tokens"),
        F.lit(0).cast("bigint").alias("alloc_tokens"),
    ).localCheckpoint(eager=False)
    for _ in range(int(rounds)):
        totals = alloc.agg(
            F.coalesce(F.sum("alloc_tokens"), F.lit(0)).alias("__used"),
            F.coalesce(
                F.sum(
                    F.when(F.col("alloc_tokens") < F.col("cap_tokens"), 1)
                ),
                F.lit(0),
            ).alias("__pool"),
        )
        # the oracle's CASE WHEN, verbatim: pool open, group uncapped,
        # budget remaining; greatest() keeps the DIV total under ANSI even
        # though the pool>0 guard means the branch is never taken at pool=0
        share = F.when(
            (F.col("__pool") > 0)
            & (F.col("alloc_tokens") < F.col("cap_tokens"))
            & (F.lit(int(token_budget)) - F.col("__used") > 0),
            F.expr(f"({int(token_budget)} - __used) DIV greatest(__pool, 1)"),
        ).otherwise(F.lit(0))
        alloc = (
            alloc.crossJoin(F.broadcast(totals))
            .select(
                *group_cols,
                "n_tokens",
                "cap_tokens",
                F.least(
                    F.col("alloc_tokens") + share, F.col("cap_tokens")
                ).alias("alloc_tokens"),
            )
            .localCheckpoint(eager=False)
        )
    return alloc.select(
        *group_cols,
        "n_tokens",
        "cap_tokens",
        "alloc_tokens",
        F.when(
            F.col("n_tokens") > 0,
            F.round(
                F.col("alloc_tokens").cast("double")
                / F.col("n_tokens").cast("double"),
                4,
            )
            + F.lit(0.0),
        )
        .otherwise(F.lit(0.0))
        .alias("epochs"),
        (
            F.round(
                F.col("alloc_tokens").cast("double") / F.lit(float(token_budget)),
                4,
            )
            + F.lit(0.0)
        ).alias("budget_frac"),
    )


def cap_per_key(
    df: DataFrame,
    key_col: str,
    max_rows: int,
    order_by: list[Column],
) -> DataFrame:
    """Keep at most ``max_rows`` rows per ``key_col`` value, best-first by
    ``order_by`` — the per-domain document cap of web-scale curation (no
    single domain may dominate the corpus).

    ``order_by`` is REQUIRED and must be a total order within each key
    (include a unique tiebreaker): ranking by arbitrary physical row order
    would keep a different subset on every run, violating the repo's
    determinism posture.

    One hash shuffle on the key; appends ``rank_in_key``. A pathologically
    hot key concentrates its rows on one task, but the window is a streaming
    rank (no buffering beyond the sort run) and the output is bounded at
    ``max_rows`` per key; for million-row hot keys pre-thin with
    ``deterministic_sample`` before the exact rank, the same two-tier
    posture as ``sample_exact_k``.
    """
    if not order_by:
        raise ValueError("cap_per_key requires an explicit total order_by")
    w = Window.partitionBy(key_col).orderBy(*order_by)
    return (
        df.withColumn("rank_in_key", F.row_number().over(w))
        .filter(F.col("rank_in_key") <= max_rows)
    )


def select_to_token_budget(
    df: DataFrame,
    budget: int,
    token_col: str = "n_tokens",
    order_by: list[Column] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Select the best-first prefix of the corpus whose cumulative token
    count fits ``budget`` — "give me the top-quality 50B tokens", the final
    gate before a training run.

    The naive form is ``SUM(tokens) OVER (ORDER BY ...)`` — a single-task
    global window that serializes the whole corpus through one executor.
    This is the distributed two-phase form of that running total:

    1. ``repartitionByRange`` on the priority order (one shuffle, the same
       machinery as a distributed sort);
    2. per-partition running totals via a window PARTITIONed on
       ``spark_partition_id()`` (parallel — no global ordering clause);
    3. partition offsets = the (tiny, #partitions-row) per-partition sums,
       prefix-summed on the driver-sized frame and broadcast back.

    Every partition computes its rows' global cumulative sum independently;
    correctness does not depend on where the range sampler drew partition
    boundaries because the order key is total (callers must include a
    tiebreaker column). Appends ``cum_tokens``; rows with
    ``cum_tokens <= budget`` survive. Rows with a NULL token count are
    DROPPED first: the window SUM would skip them, handing an
    unknown-length document a free ride into a token-budgeted set.
    """
    df = df.filter(F.col(token_col).isNotNull())
    order = order_by if order_by is not None else [F.col(token_col).desc()]
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # pin the range partitioning: the running-total branch and the offsets
    # branch MUST observe identical partition boundaries, and the range
    # sampler re-runs per job otherwise
    ranged = (
        df.repartitionByRange(nparts, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("__pid").orderBy(*order)
    part = ranged.withColumn(
        "__cum_in", F.sum(F.col(token_col)).over(w_in)
    )
    totals = (
        ranged.groupBy("__pid")
        .agg(F.sum(F.col(token_col)).alias("__tot"))
    )
    w_off = Window.orderBy("__pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__pid", "__off")
    return (
        part.join(F.broadcast(offsets), "__pid")
        .withColumn(
            "cum_tokens", (F.col("__cum_in") + F.col("__off")).cast("bigint")
        )
        .filter(F.col("cum_tokens") <= budget)
        .drop("__pid", "__cum_in")
    )


def apply_mixture_recipe(
    df: DataFrame,
    recipe: DataFrame,
    cell_cols: list[str],
    token_col: str = "n_tokens",
    order_by: list[Column] | None = None,
    budget_col: str = "token_budget",
    num_partitions: int | None = None,
) -> DataFrame:
    """Execute a data-mixture recipe: fill every cell (e.g. (lang, source))
    to ITS token budget, best-first — the step that turns a planned mixture
    (``temperature_weights``, a hand-tuned recipe table) into the actual
    training corpus.

    ``recipe`` is ``(*cell_cols, budget_col)`` — one row per cell, the
    planning output, bounded by cell cardinality and broadcast. Cells
    absent from the recipe are dropped (the recipe IS the dataset
    definition); rows with NULL ``token_col`` are dropped (same
    free-rider rule as ``select_to_token_budget``).

    Scale shape: the same two-phase distributed running total as
    ``select_to_token_budget``, generalized per cell — a naive
    ``SUM OVER (PARTITION BY cell ORDER BY …)`` serializes each cell
    through one task, and at 100 TB a single cell can be terabytes. Here
    the corpus range-partitions ONCE on (cell, priority); per-partition
    windows run in parallel; the (partition × cell) totals frame is tiny
    and its per-cell prefix offsets broadcast back. Appends
    ``cum_tokens_cell``; rows with ``cum_tokens_cell <= budget`` survive.
    ``order_by`` must be a total order within each cell (unique
    tiebreaker) — the default is ``token_col desc`` which is NOT total;
    pass an explicit order for deterministic output.
    """
    df = df.filter(F.col(token_col).isNotNull())
    order = order_by if order_by is not None else [F.col(token_col).desc()]
    cells = [F.col(c) for c in cell_cols]
    nparts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    # pin the range boundaries: the running-total branch and the offsets
    # branch must observe identical partitioning (select_to_token_budget
    # discipline)
    ranged = (
        df.repartitionByRange(nparts, *cells, *order)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_in = Window.partitionBy("__pid", *cell_cols).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    part = ranged.withColumn("__cum_in", F.sum(F.col(token_col)).over(w_in))
    totals = ranged.groupBy("__pid", *cell_cols).agg(
        F.sum(F.col(token_col)).alias("__tot")
    )
    # per-cell prefix offsets over the (#partitions x #cells)-row frame
    w_off = (
        Window.partitionBy(*cell_cols)
        .orderBy("__pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_off), F.lit(0))
    ).select("__pid", *cell_cols, "__off")
    return (
        part.join(F.broadcast(offsets), ["__pid", *cell_cols])
        .withColumn(
            "cum_tokens_cell", (F.col("__cum_in") + F.col("__off")).cast("bigint")
        )
        .join(F.broadcast(recipe), cell_cols)
        .filter(F.col("cum_tokens_cell") <= F.col(budget_col))
        .drop("__pid", "__cum_in", "__off")
    )


def _md5_uniform(key_cols: list[str], seed: str) -> Column:
    """Deterministic uniform(0,1) draw from the first 8 hex digits of
    md5(seed|key) — digit-arithmetic form (no engine-specific hex parsing,
    so a SQL oracle can replay it verbatim)."""
    h = _sample_key(key_cols, seed)
    acc = hex8_int(h).cast("double")
    return (acc + F.lit(0.5)) / F.lit(float(16**8))


def weighted_sample_k(
    df: DataFrame,
    k: int,
    weight_col: str,
    key_cols: list[str],
    seed: str = "es0",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis, 2006):
    each row draws u = uniform(0,1) deterministically from md5(seed|key) and
    ranks by ``u^(1/w)``; the top-k ranks ARE a weight-proportional sample
    without replacement.

    Everything a training-mixture builder wants: inclusion probability
    proportional to the weight column (token count, quality, freshness),
    no RNG state, and re-runs select identical rows. Rows with weight <= 0
    (or NULL) are excluded up front: a zero weight divides by zero
    (engine-dependent NULL/inf) and a negative one silently INVERTS the
    sampling toward the least-wanted rows.

    Scale shape: the rank key is a pure projection; the top-k is
    ``ORDER BY … LIMIT k`` — Spark plans TakeOrderedAndProject (per-partition
    heap + single merge of k-row partials), which never materializes a global
    sort. The final rank attach is a window over the k-row result only.

    Cross-engine note: ``u^(1/w)`` is transcendental, so two engines' pow()
    may differ in the last ulp and flip a near-tie at the k boundary; the
    key cannot be rounded (mass ties) — adjacent keys in a real corpus are
    ~1e-3 apart vs ~1e-16 of pow error, and the id tiebreak pins exact ties.
    """
    u = _md5_uniform(key_cols, seed)
    df = df.filter(F.col(weight_col) > 0)
    w = F.col(weight_col).cast("double")
    keyed = df.withColumn("es_key", F.pow(u, F.lit(1.0) / w))
    topk = keyed.orderBy(F.col("es_key").desc(), *[F.col(c) for c in key_cols]).limit(k)
    rank_w = Window.orderBy(F.col("es_key").desc(), *[F.col(c) for c in key_cols])
    return topk.withColumn("draw_rank", F.row_number().over(rank_w))
