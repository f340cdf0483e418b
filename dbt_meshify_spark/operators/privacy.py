"""Privacy accounting over behavioral/event data (N10 governance tier).

Two released-data primitives a training-data pipeline needs before user
event streams can feed features or be shared:

- **k-anonymity audit** (`k_anonymity_report` / `suppress_small_groups`):
  group the release by its quasi-identifier columns and measure
  re-identification risk — a QI group smaller than ``k`` (or backed by
  fewer than ``k`` distinct users) pins its rows to few individuals
  (Sweeney, 2002). The audit emits per-group sizes and flags; suppression
  drops the at-risk groups (the standard k-anonymization release step).
- **bounded-contribution aggregation** (`bounded_contribution_agg`): the
  differential-privacy PREPARATION primitives — per-user contribution caps
  (keep the first ``max_per_user`` events per user per group,
  deterministic (ts, event_id) order) and value clamping to ``[lo, hi]``,
  which bound the sensitivity of the released sums to
  ``max_per_user * max(|lo|, |hi|)`` per user (removing a user changes
  the sum by at most their whole contribution — ``hi - lo`` would
  understate it whenever ``lo > 0``). Noise addition is a trivial
  scalar draw on the bounded release and deliberately out of scope (no
  deterministic oracle exists for randomness); the HARD distributed part
  is the capping, which is what this implements.

Engine-portability: released sums are emitted as INTEGER hundredth-units
(``floor(clamped * 100)`` — IEEE floor is bit-deterministic and integer
sums are order-independent, so the DuckDB oracle replays exactly; a double
SUM would land on half-ulp boundaries between engines, the SURVEY §2.7
hazard).

Scale shape (100 TB posture): the audit is ONE map-side-combined groupBy
on the QI key (distinct-user counts ride the same shuffle); suppression
broadcasts nothing — it re-joins the at-risk keys (output-bounded) as an
anti-join. The contribution cap is one window over (user, group) — the
same key family the sessionize/temporal tier already shuffles on — then
two partial aggregates ((group, user) then group). No reference analog
(dbt-meshify has no data plane).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbt_meshify_spark.operators.sampling import hex8_int


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: list[str],
    user_col: str = "user_id",
    k: int = 5,
) -> DataFrame:
    """Per-QI-group size/user-count audit with the at-risk flag.

    ``at_risk`` is true when the group has fewer than ``k`` rows OR fewer
    than ``k`` distinct users (a large group from one user still
    identifies them). One partial-aggregated shuffle on the QI key.
    """
    return df.groupBy(*quasi_cols).agg(
        F.count("*").cast("bigint").alias("group_size"),
        F.countDistinct(user_col).cast("bigint").alias("n_users"),
        (
            (F.count("*") < F.lit(int(k)))
            | (F.countDistinct(user_col) < F.lit(int(k)))
        ).alias("at_risk"),
    )


def suppress_small_groups(
    df: DataFrame,
    quasi_cols: list[str],
    user_col: str = "user_id",
    k: int = 5,
) -> DataFrame:
    """The k-anonymization release: drop every row whose QI group is
    at-risk. The at-risk key set is output-bounded; the suppression is a
    keys-only anti-join (rows never shuffle on anything but the QI key).

    The anti-join is NULL-SAFE on every QI column: the audit groups NULL
    QI values like any other value (a 2-row (type, day=NULL) group is
    just as re-identifying), so a null-unsafe join would fail OPEN and
    release exactly the rows it was told to suppress.
    """
    report = k_anonymity_report(df, quasi_cols, user_col, k)
    return suppress_flagged(df, quasi_cols, report, "at_risk")


def _clamped_units(value: Column, lo: float, hi: float) -> Column:
    """Clamp to [lo, hi] and quantize to integer hundredths via IEEE floor
    — deterministic across engines, and integer sums are order-free."""
    clamped = F.least(F.greatest(value, F.lit(float(lo))), F.lit(float(hi)))
    return F.floor(clamped * F.lit(100.0)).cast("bigint")


def bounded_contribution_agg(
    df: DataFrame,
    group_cols: list[str],
    user_col: str = "user_id",
    value_col: str = "value",
    order_by: list[Column] | None = None,
    max_per_user: int = 10,
    lo: float = 0.0,
    hi: float = 100.0,
) -> DataFrame:
    """Per-group release with user-level sensitivity bounded: keep the
    first ``max_per_user`` rows per (user, group) in ``order_by`` order,
    clamp values to ``[lo, hi]``, and aggregate.

    Returns per group: ``n_users``, ``n_kept``, ``n_capped`` (rows the cap
    dropped), ``sum_units`` (integer hundredths of the clamped sum) and
    ``max_user_units`` (the largest single user's contribution — by
    construction <= ``max_per_user * max(|lo|, |hi|) * 100``, the
    user-level sensitivity the release is certified to; note ``hi - lo``
    would UNDERSTATE it whenever ``lo > 0``); values never leave integer
    space after the clamp.

    Plan (re-based round 11, skew-safe): contribution bounding EXISTS
    because of bot-grade users, so the cap itself must survive one — a
    bare row_number window over (user, group) funnels the hot pair's
    every row through a single un-splittable task (AQE cannot split a
    skewed WINDOW partition). The kept set now comes from the combiner
    two-pass ``skew.topk_per_key`` (local first-``cap`` per input
    partition, then global — at most cap·P rows of the hot pair cross the
    wire), the dropped-row count from a partial-aggregated total joined
    back (n_capped = n_rows - n_kept), both skew-immune by construction.
    Row-identical to the single-window form for the total ``order_by``
    the determinism contract requires; ext_bounded_contribution's oracle
    (ROW_NUMBER replay) is unchanged.
    """
    cap = int(max_per_user)
    if cap < 1:
        raise ValueError(f"max_per_user must be >= 1, got {max_per_user}")
    # Pin NULLS FIRST explicitly (Spark's bare asc() default) so the oracle's
    # ROW_NUMBER ORDER BY (DuckDB defaults NULLS LAST) is written to match —
    # a nullable ts/event_id must not silently flip which rows the cap keeps.
    order = order_by or [
        F.col("ts").asc_nulls_first(),
        F.col("event_id").asc_nulls_first(),
    ]
    # NULL measurements are EXCLUDED from the release, stated rather than
    # incidental: least/greatest skip NULLs on both engines, so an unfiltered
    # NULL value would silently clamp to `lo` and contribute lo*100 units.
    df = df.filter(F.col(value_col).isNotNull())
    from dbt_meshify_spark.operators.skew import topk_per_key

    totals = df.groupBy(user_col, *group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n_rows")
    )
    kept = topk_per_key(
        df, [user_col, *group_cols], order, cap, rank_col="__rn"
    )
    kept_agg = kept.groupBy(user_col, *group_cols).agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"),
        F.coalesce(F.sum(_clamped_units(F.col(value_col), lo, hi)), F.lit(0))
        .cast("bigint")
        .alias("__user_units"),
    )
    # inner join is total: cap >= 1 keeps at least one row per pair, so
    # every (user, group) in totals is in kept_agg. NULL-SAFE on every key:
    # a NULL group key (or NULL user) is a real released group on the
    # window form and in the oracle's GROUP BY — a null-rejecting
    # equi-join would silently drop it (caught by
    # test_dp_release_degenerate_groups).
    ka = kept_agg.select(
        F.col(user_col).alias("__ka_user"),
        *[F.col(g).alias(f"__ka_{g}") for g in group_cols],
        "__n",
        "__user_units",
    )
    cond = totals[user_col].eqNullSafe(ka["__ka_user"])
    for g in group_cols:
        cond = cond & totals[g].eqNullSafe(ka[f"__ka_{g}"])
    per_user = totals.join(ka, cond).drop(
        "__ka_user", *[f"__ka_{g}" for g in group_cols]
    )
    return per_user.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_users"),
        F.sum("__n").cast("bigint").alias("n_kept"),
        F.sum(F.col("__n_rows") - F.col("__n")).cast("bigint").alias("n_capped"),
        F.sum("__user_units").cast("bigint").alias("sum_units"),
        F.max("__user_units").cast("bigint").alias("max_user_units"),
    )


def l_diversity_report(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    c: int = 2,
) -> DataFrame:
    """l-diversity audit per QI group (Machanavajjhala et al., 2007) — the
    standard next screen after k-anonymity: a group can be large yet still
    leak its members' sensitive attribute if that attribute is (nearly)
    constant within the group.

    Emits, per QI group:

    - ``group_size`` / ``n_sensitive`` — rows and DISTINCT sensitive
      values (distinct l-diversity: at risk when ``n_sensitive < l``);
    - ``top_count`` / ``max_share`` — the modal sensitive value's count and
      share (an attacker's posterior if they guess the mode);
    - ``entropy`` — Shannon entropy of the sensitive distribution (entropy
      l-diversity wants ``>= ln(l)``). AUDIT-ONLY column: a sum of
      ``c*ln(c)`` doubles is partial-aggregation-order-dependent at the
      last ulp, so oracle-checked queries must select the integer-exact
      columns and leave this one out (SURVEY §2.7 float-sum hazard);
    - ``at_risk_distinct`` — ``n_sensitive < l``;
    - ``at_risk_recursive`` — recursive (c,l)-diversity in its
      INTEGER-EXACT form: at risk when ``n_sensitive < l`` or the top
      count ``r1 >= c * (r_l + ... + r_m)`` (tail = group_size minus the
      top ``l-1`` counts; count ties at the head boundary cannot change
      the head sum, so the flag is deterministic on any engine).

    Scale shape (100 TB posture): one (QI, sensitive) partial-aggregated
    shuffle to the per-value count table — Zipf-bounded like a token
    table, far smaller than the corpus — then one bounded-partition window
    (rows per QI group = distinct sensitive values) and one QI aggregate.
    Rows never shuffle on anything but the QI key family.
    """
    sv = df.groupBy(*quasi_cols, sensitive_col).agg(
        F.count("*").cast("bigint").alias("__cnt")
    )
    return l_diversity_from_counts(sv, quasi_cols, sensitive_col, l, c)


def l_diversity_from_counts(
    sv: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 3,
    c: int = 2,
) -> DataFrame:
    """Shared report tail over an already-built (QI, sensitive, __cnt)
    count table — the batch wrapper aggregates the corpus once; the
    streaming twin merges per-micro-batch count cells (integer cell sums
    are order-free, the CMS-state discipline) and hands the merged table
    here, so both paths share one oracle."""
    w = Window.partitionBy(*quasi_cols).orderBy(
        F.col("__cnt").desc(), F.col(sensitive_col).asc_nulls_first()
    )
    r = sv.withColumn("__rk", F.row_number().over(w))
    lcnt = F.col("__cnt").cast("double")
    agg = r.groupBy(*quasi_cols).agg(
        F.sum("__cnt").cast("bigint").alias("group_size"),
        F.count("*").cast("bigint").alias("n_sensitive"),
        F.max("__cnt").cast("bigint").alias("top_count"),
        F.sum(
            F.when(F.col("__rk") <= F.lit(int(l) - 1), F.col("__cnt")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("__head"),
        F.sum(lcnt * F.log(lcnt)).alias("__clogc"),
    )
    n_d = F.col("group_size").cast("double")
    return agg.select(
        *quasi_cols,
        "group_size",
        "n_sensitive",
        "top_count",
        (
            F.round(F.col("top_count").cast("double") / n_d, 4) + F.lit(0.0)
        ).alias("max_share"),
        (F.log(n_d) - F.col("__clogc") / n_d).alias("entropy"),
        (F.col("n_sensitive") < F.lit(int(l))).alias("at_risk_distinct"),
        (
            (F.col("n_sensitive") < F.lit(int(l)))
            | (
                F.col("top_count")
                >= F.lit(int(c)) * (F.col("group_size") - F.col("__head"))
            )
        ).alias("at_risk_recursive"),
    )


def suppress_flagged(
    df: DataFrame,
    quasi_cols: list[str],
    report: DataFrame,
    flag_col: str = "at_risk",
) -> DataFrame:
    """Drop every row whose QI group is flagged in ``report[flag_col]`` —
    the shared release step behind k-anonymity AND l-diversity suppression
    (pass ``k_anonymity_report``'s or ``l_diversity_report``'s output and
    name the flag). NULL-SAFE anti-join on every QI column, same rationale
    as :func:`suppress_small_groups`: a null-unsafe join fails OPEN and
    releases exactly the at-risk rows.
    """
    risky = report.filter(F.col(flag_col)).select(
        *[F.col(c).alias(f"__r_{c}") for c in quasi_cols]
    )
    cond = None
    for c in quasi_cols:
        term = df[c].eqNullSafe(risky[f"__r_{c}"])
        cond = term if cond is None else (cond & term)
    return df.join(risky, cond, "left_anti")


def geometric_noise_thresholds(eps: float, bound: int) -> list[tuple[int, int, int]]:
    """Inverse-CDF table for the TRUNCATED two-sided geometric mechanism
    (Ghosh-Roughgarden-Sundararajan 2009): ``P(Z = z) ∝ alpha^|z|`` with
    ``alpha = exp(-eps)``, support ``[-bound, bound]``.

    Returns contiguous ``(z, t_lo, t_hi)`` buckets partitioning the 32-bit
    hash space: a uniform ``u32 in [0, 2^32)`` maps to the ``z`` whose
    bucket contains it. The thresholds are INTEGERS computed once
    driver-side (a pure function of eps/bound), so both the Spark plan and
    a SQL oracle can embed the identical table and the sampled noise —
    not just its distribution — replays bit-exactly. Truncation keeps the
    table construction-bounded (2*bound+1 rows); choose ``bound`` so the
    clipped tail mass ``~alpha^bound`` is negligible (bound=40 at eps=0.5
    clips ~2e-9).
    """
    import math

    alpha = math.exp(-float(eps))
    zs = list(range(-int(bound), int(bound) + 1))
    weights = [alpha ** abs(z) for z in zs]
    total = sum(weights)
    out: list[tuple[int, int, int]] = []
    acc = 0.0
    prev = 0
    for i, (z, w) in enumerate(zip(zs, weights)):
        acc += w / total
        if z == zs[-1]:
            hi = 1 << 32
        else:
            # every bucket keeps width >= 1: float cumulative drift near
            # acc ~ 1.0 could otherwise truncate a tail bucket (e.g.
            # z = +bound-1) to zero width, skewing the truncated
            # distribution asymmetric at the tails. Lower clamp keeps hi
            # strictly above prev; upper clamp reserves one unit of hash
            # space for each remaining bucket so the chain can always
            # finish at 2^32.
            remaining = len(zs) - 1 - i
            hi = max(prev + 1, min((1 << 32) - remaining, int(acc * (1 << 32))))
        out.append((z, prev, hi))
        prev = hi
    assert all(t_hi > t_lo for _, t_lo, t_hi in out), "empty noise bucket"
    return out


def _noise_join(
    frame: DataFrame,
    key_str: Column,
    eps: float,
    bound: int,
    noise_salt: str,
    out_prefix: str,
) -> DataFrame:
    """Attach a derandomized geometric noise draw: the md5-u32 of the
    salted group key indexes the broadcast inverse-CDF table; adds column
    ``{out_prefix}_z``. ONE copy of the range-join wiring — the count and
    sum releases (and any future lattice release) must share it so the
    join condition cannot desynchronize."""
    spark = frame.sparkSession
    t = spark.createDataFrame(
        geometric_noise_thresholds(eps, bound),
        f"{out_prefix}_z int, {out_prefix}_lo bigint, {out_prefix}_hi bigint",
    )
    u32 = hex8_int(F.md5(F.concat(F.lit(noise_salt + "|"), key_str)))
    keyed = frame.withColumn(f"__u_{out_prefix}", u32)
    return keyed.join(
        F.broadcast(t),
        (F.col(f"__u_{out_prefix}") >= F.col(f"{out_prefix}_lo"))
        & (F.col(f"__u_{out_prefix}") < F.col(f"{out_prefix}_hi")),
    ).drop(f"__u_{out_prefix}", f"{out_prefix}_lo", f"{out_prefix}_hi")


def dp_noisy_user_counts(
    df: DataFrame,
    group_cols: list[str],
    user_col: str = "user_id",
    eps: float = 0.5,
    bound: int = 40,
    salt: str = "dp0",
) -> DataFrame:
    """ε-DP noisy distinct-user counts per group — the RELEASE step on top
    of the bounded-contribution preparation: per-group ``n_users`` has
    user-removal sensitivity 1, and the geometric mechanism's integer
    noise achieves exactly ε-DP for integer queries (the discrete optimal
    mechanism; the ε composes across the released groups a user can
    appear in).

    The noise draw is DERANDOMIZED the repo's md5 way: ``u32 =
    hex8_int(md5(salt|group_key))`` indexes the integer inverse-CDF table
    (:func:`geometric_noise_thresholds` — broadcast, 2*bound+1 rows), so
    the release is reproducible run-to-run and the DuckDB oracle replays
    the NOISE itself, not just its distribution. A production deployment
    swaps the salt for a secret per-release nonce (the u32 is then a
    keyed PRF of the group — same plan, secret seed) and drops the
    ``n_true`` audit column; both are emitted here because the corpus
    queries are verification artifacts.

    ``n_released`` clamps at 0 (post-processing — DP is closed under it).
    One groupBy on the release key + one broadcast range join; nothing
    else touches the corpus.
    """
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])
    g = df.groupBy(*group_cols).agg(
        F.countDistinct(user_col).cast("bigint").alias("n_true")
    )
    hit = _noise_join(g, key_str, eps, bound, salt, "z")
    return hit.select(
        *group_cols,
        "n_true",
        F.col("z_z").cast("bigint").alias("noise"),
        F.greatest(F.lit(0), F.col("n_true") + F.col("z_z"))
        .cast("bigint")
        .alias("n_released"),
    )


def dp_release(
    df: DataFrame,
    group_cols: list[str],
    user_col: str = "user_id",
    value_col: str = "value",
    max_per_user: int = 10,
    lo: float = 0.0,
    hi: float = 100.0,
    eps_count: float = 0.5,
    eps_sum: float = 0.5,
    bound: int = 40,
    salt: str = "dp0",
) -> DataFrame:
    """The FULL ε-DP release pipeline over event data: cap → clamp →
    quantize → geometric noise, composing the tier's primitives into the
    one query a release pipeline actually runs.

    - **Counts**: per-group kept-row counts have user-removal sensitivity
      ``max_per_user`` after the cap; release ``floor(n_kept /
      max_per_user)`` (sensitivity 1 — a user's removal moves the floor by
      at most one step) plus geometric noise, rescaled back. The same
      discretize-then-geometric recipe handles the sums:
    - **Sums**: ``bounded_contribution_agg`` certifies per-user sum
      sensitivity ``S = max_per_user * max(|lo|, |hi|) * 100`` integer
      units; ``floor(sum_units / S)`` then has sensitivity 1, geometric
      noise makes it ε-DP, and the release rescales to units. The
      quantization costs accuracy S (the price of an integer-exact,
      oracle-replayable mechanism — a continuous Laplace draw has no
      deterministic oracle and is documented out of scope).

    Per-group total privacy cost is ``eps_count + eps_sum`` by sequential
    composition (two lattice releases of the same group), each drawn from
    an independently salted u32 of the group key. Derandomization /
    production-nonce caveats as :func:`dp_noisy_user_counts`; ``n_kept`` /
    ``sum_units`` audit columns emitted for verification only.

    Plan shape: the bounded-contribution window + two aggregates, then TWO
    broadcast range joins against the (2*bound+1)-row noise tables —
    nothing else touches the corpus.
    """
    import math

    spark = df.sparkSession
    # The certified per-user sensitivity in INTEGER units must bound the
    # worst-case row contribution AS QUANTIZED: per-row units lie in
    # [floor(lo*100), floor(hi*100)], so the per-row magnitude bound is
    # max(|floor(lo*100)|, |floor(hi*100)|) — NOT int(max(|lo|,|hi|)*100),
    # which truncates toward zero and UNDERSTATES S for fractional negative
    # bounds (floor(-33.5) = -34: a row can contribute 34 units while the
    # truncated bound claims 33, doubling the effective epsilon).
    S = int(max_per_user) * max(
        abs(math.floor(float(lo) * 100.0)), abs(math.floor(float(hi) * 100.0))
    )
    if S < 1:
        raise ValueError(
            f"bounds [{lo}, {hi}] quantize to zero sensitivity units; "
            "widen the bounds or rescale the measurements"
        )
    base = bounded_contribution_agg(
        df,
        group_cols,
        user_col=user_col,
        value_col=value_col,
        max_per_user=max_per_user,
        lo=lo,
        hi=hi,
    )
    key_str = F.concat_ws("|", *[F.col(c).cast("string") for c in group_cols])

    cnt_step = F.lit(int(max_per_user))
    out = _noise_join(base, key_str, eps_count, bound, salt + "|cnt", "zc")
    out = _noise_join(out, key_str, eps_sum, bound, salt + "|sum", "zs")
    q_cnt = F.floor(F.col("n_kept") / cnt_step).cast("bigint")
    q_sum = F.floor(F.col("sum_units") / F.lit(S)).cast("bigint")
    return out.select(
        *group_cols,
        "n_kept",
        "sum_units",
        F.col("zc_z").cast("bigint").alias("noise_count"),
        F.col("zs_z").cast("bigint").alias("noise_sum"),
        F.greatest(F.lit(0), (q_cnt + F.col("zc_z")) * cnt_step)
        .cast("bigint")
        .alias("released_count"),
        F.greatest(F.lit(0), (q_sum + F.col("zs_z")) * F.lit(S))
        .cast("bigint")
        .alias("released_sum_units"),
    )
