"""Bigram language-model perplexity scoring (N4 quality tier).

CCNet-style corpus filtering ranks documents by LM perplexity; the cheap
deterministic tier is a bigram model with add-one smoothing trained on the
corpus itself. Everything is expressible as aggregates + equi-joins, so the
whole pipeline is shuffle-efficient and fully oracle-checkable:

- bigrams are derived INSIDE the tokens array (``zip_with`` over two slices),
  a pure projection — no positional self-join, no extra shuffle;
- the corpus is tokenized ONCE: per-doc bigram term frequencies feed both the
  global count tables (sum of tf — a combiner-friendly second aggregate over
  the already-small tf frame) and the scoring join;
- count tables scale with the corpus (they are NOT broadcast-hinted): the
  scoring join is equi-keyed on the bigram / context word, so at 100 TB both
  sides shuffle-partition on the same key and AQE may still choose broadcast
  when the model is small.

No reference analog (dbt-meshify has no text plane); the operator follows the
published CCNet recipe shape (Wenzek et al., 2020) re-expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bigrams(tokens_col: str) -> F.Column:
    """``array<string>`` of space-joined adjacent token pairs.

    Built from two slices of the SAME staged array column: callers must
    materialize the split once via ``withColumn`` first (HOF lambdas get no
    common-subexpression elimination — see operators/dedup.py).
    """
    t = F.col(tokens_col)
    n = F.size(t) - 1
    return F.zip_with(
        F.slice(t, 1, n), F.slice(t, 2, n), lambda a, b: F.concat_ws(" ", a, b)
    )


def bigram_perplexity(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document bigram NLL and perplexity under an add-one-smoothed
    bigram LM trained on ``df`` itself.

    P(w2|w1) = (C(w1 w2) + 1) / (C(w1 ·) + V) where C(w1 ·) counts w1 in
    non-final positions and V is the distinct-token vocabulary size.
    Returns ``id_col, n_bigrams, avg_nll, ppl`` (docs with < 2 tokens have no
    bigrams and are excluded). Low-perplexity docs are LM-typical; the high
    tail is the quality-filter drop candidate.
    """
    # pinned (r13): toks has two consumers (tf, vocab) and tf has two
    # (bigram_counts, scoring) — without the pins the regex tokenize ran
    # once per consumer branch (the _kept_gram_index finding)
    toks = (
        df.select(
            F.col(id_col),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__t"),
        )
        .filter(F.size("__t") >= 2)
        .localCheckpoint(eager=True)
    )

    # one tokenize pass: per-doc bigram tf is the base relation for training
    # counts AND scoring
    tf = (
        toks.select(F.col(id_col), F.explode(_bigrams("__t")).alias("bigram"))
        .groupBy(id_col, "bigram")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    bigram_counts = tf.groupBy("bigram").agg(F.sum("tf").alias("c_bi"))
    context_counts = (
        bigram_counts.withColumn("w1", F.substring_index("bigram", " ", 1))
        .groupBy("w1")
        .agg(F.sum("c_bi").alias("c_w1"))
    )
    vocab = toks.select(F.explode("__t").alias("term")).agg(
        F.countDistinct("term").cast("double").alias("__v")
    )

    # NLL is a pure function of the GRAM (every joined statistic derives
    # from the bigram string), so compute it on the MODEL-sized count
    # table and attach with ONE corpus join (optimization r14, guide
    # §2.3/§3): the corpus-sized tf frame previously rode every scoring
    # join, re-shuffling per key at scale; now the model table does.
    gram_nll = (
        bigram_counts.withColumn("w1", F.substring_index("bigram", " ", 1))
        .join(context_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            "bigram",
            (
                -F.log(
                    (F.col("c_bi").cast("double") + F.lit(1.0))
                    / (F.col("c_w1").cast("double") + F.col("__v"))
                )
            ).alias("nll"),
        )
    )
    scored = tf.join(gram_nll, "bigram")
    avg_nll = F.sum(F.col("tf") * F.col("nll")) / F.sum("tf")
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_bigrams"),
        # + 0.0: on a degenerate corpus p = 1.0 exactly, nll = -0.0, and the
        # driver canonicalizer str()-sorts rows — normalize the IEEE sign
        # (mirrored in every LM oracle)
        (F.round(avg_nll, 4) + F.lit(0.0)).alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
    )


def trigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lambdas: tuple[float, float, float] = (0.6, 0.3, 0.1),
) -> DataFrame:
    """Per-document NLL/perplexity under a Jelinek-Mercer INTERPOLATED
    trigram LM trained on ``df`` itself — the depth tier above
    :func:`bigram_perplexity` (CCNet's 5-gram KenLM posture, re-expressed
    relationally at order 3):

    ``P(w3|w1 w2) = l3*C(w1w2w3)/C(w1w2 .) + l2*C(w2w3)/C(w2 .)
    + l1*(C(w3)+1)/(N+V)``

    where each ML term's context count is "occurrences with a following
    token" (derived from the next-order count table, the
    bigram_perplexity convention) and the unigram floor is add-one
    smoothed, so every scored trigram has strictly positive probability
    and no 0/0 appears (a scored trigram's own counts are >= 1 by
    construction).

    Scale shape (the bigram tier's, one order deeper): ONE tokenize pass;
    per-doc trigram tf is the base relation for the count tables AND
    scoring; every scoring join is equi-keyed (trigram, leading bigram,
    trailing bigram, middle word, last word), so all sides co-partition —
    no broadcast hints, AQE may still pick one when the model is small;
    (N, V) ride a 1-row broadcast. Returns ``id_col, n_trigrams,
    avg_nll, ppl`` (docs with < 3 tokens are excluded).
    """
    l3, l2, l1 = (float(x) for x in lambdas)
    # pinned (r13): toks feeds four branches (trigram tf, bigram counts,
    # unigram counts, totals) and tf feeds two (count table, scoring) —
    # pinning makes the corpus tokenize exactly one pass
    toks = (
        df.select(
            F.col(id_col),
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__t"),
        )
        .filter(F.size("__t") >= 3)
        .localCheckpoint(eager=True)
    )

    t = F.col("__t")
    tf = (
        toks.select(F.col(id_col), F.explode(_ngrams(t, 3)).alias("tri"))
        .groupBy(id_col, "tri")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    tri_counts = tf.groupBy("tri").agg(F.sum("tf").alias("c_tri"))
    ctx12 = (
        tri_counts.withColumn("w12", F.substring_index("tri", " ", 2))
        .groupBy("w12")
        .agg(F.sum("c_tri").alias("c_w12"))
    )
    # bigram table from its own projection (NOT the trigram tails — the
    # bigram model must count doc-initial bigrams too)
    n2 = F.size(t) - 1
    bigrams = F.zip_with(
        F.slice(t, 1, n2), F.slice(t, 2, n2),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bigram_counts = (
        toks.select(F.explode(bigrams).alias("w23"))
        .groupBy("w23")
        .agg(F.count("*").alias("c_w23"))
    )
    ctx2 = (
        bigram_counts.withColumn("w2", F.substring_index("w23", " ", 1))
        .groupBy("w2")
        .agg(F.sum("c_w23").alias("c_w2"))
    )
    uni_counts = (
        toks.select(F.explode("__t").alias("w3"))
        .groupBy("w3")
        .agg(F.count("*").alias("c_w3"))
    )
    # (V, N) derive from the unigram count table — one fewer corpus
    # explode; identical values (distinct terms = its row count, total
    # occurrences = its count sum)
    totals = uni_counts.agg(
        F.count("*").cast("double").alias("__v"),
        F.sum("c_w3").cast("double").alias("__n"),
    )

    # NLL is a pure function of the GRAM — compute it on the MODEL-sized
    # trigram count table and attach with ONE corpus join (optimization
    # r14, guide §2.3/§3): the corpus-sized tf frame previously rode all
    # five scoring joins, re-shuffling per key at scale; now the model
    # table does, and tf pays a single equi-join on the trigram.
    keyed = (
        tri_counts.withColumn("w12", F.substring_index("tri", " ", 2))
        .withColumn("w23", F.substring_index("tri", " ", -2))
        .withColumn("w2", F.substring_index(F.col("w23"), " ", 1))
        .withColumn("w3", F.substring_index("tri", " ", -1))
    )
    gram_nll = (
        keyed.join(ctx12, "w12")
        .join(bigram_counts, "w23")
        .join(ctx2, "w2")
        .join(uni_counts, "w3")
        .crossJoin(F.broadcast(totals))
        .select(
            "tri",
            (
                -F.log(
                    F.lit(l3)
                    * (F.col("c_tri").cast("double") / F.col("c_w12").cast("double"))
                    + F.lit(l2)
                    * (F.col("c_w23").cast("double") / F.col("c_w2").cast("double"))
                    + F.lit(l1)
                    * (
                        (F.col("c_w3").cast("double") + F.lit(1.0))
                        / (F.col("__n") + F.col("__v"))
                    ),
                )
            ).alias("nll"),
        )
    )
    scored = tf.join(gram_nll, "tri")
    avg_nll = F.sum(F.col("tf") * F.col("nll")) / F.sum("tf")
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_trigrams"),
        # + 0.0: on a degenerate corpus p = 1.0 exactly, nll = -0.0, and the
        # driver canonicalizer str()-sorts rows — normalize the IEEE sign
        # (mirrored in every LM oracle)
        (F.round(avg_nll, 4) + F.lit(0.0)).alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
    )


def kn_trigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document NLL/perplexity under an interpolated KNESER-NEY
    trigram LM trained on ``df`` itself — the single-discount KN form at
    order 3 (the depth tier above :func:`trigram_perplexity`'s
    Jelinek-Mercer smoothing; :func:`mkn_trigram_perplexity` is the
    three-discount Chen-Goodman variant).

    Thin wrapper over the order-generic :func:`kn_ngram_perplexity`
    ladder at ``n=3`` (bit-exact equivalence to the former hardcoded
    implementation is pinned by this tier's independent exact-float
    Python-replay test and its DuckDB oracle). Returns ``id_col,
    n_trigrams, avg_nll, ppl`` (docs with < 3 tokens are excluded).
    """
    return kn_ngram_perplexity(
        df, n=3, text_col=text_col, id_col=id_col, discount=discount
    ).withColumnRenamed("n_ngrams", "n_trigrams")


def _mkn_discounts(frame: DataFrame, count_col: str, prefix: str) -> DataFrame:
    """Chen-Goodman count-of-count discounts as a 1-row frame:
    ``Y = n1/(n1 + 2*n2)``, ``D1 = 1 - 2Y*n2/n1``, ``D2 = 2 - 3Y*n3/n2``,
    ``D3 = 3 - 4Y*n4/n3`` — each clamped to >= 0 and guarded to its
    integer base when the next count-of-count is empty (deterministic on
    degenerate corpora; identical CASE structure in the oracle). All
    inputs are integer counts, so the derived doubles are bit-identical
    across engines given the same expression order."""
    c = F.col(count_col)
    hist = frame.agg(
        F.sum(F.when(c == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(c == 2, 1).otherwise(0)).alias("n2"),
        F.sum(F.when(c == 3, 1).otherwise(0)).alias("n3"),
        F.sum(F.when(c == 4, 1).otherwise(0)).alias("n4"),
    )
    n1, n2 = F.col("n1").cast("double"), F.col("n2").cast("double")
    n3, n4 = F.col("n3").cast("double"), F.col("n4").cast("double")
    y = F.when(F.col("n1") + 2 * F.col("n2") > 0, n1 / (n1 + 2.0 * n2)).otherwise(
        F.lit(0.5)
    )
    return hist.select(
        F.greatest(
            F.when(F.col("n1") > 0, F.lit(1.0) - 2.0 * y * n2 / n1).otherwise(
                F.lit(1.0)
            ),
            F.lit(0.0),
        ).alias(f"{prefix}1"),
        F.greatest(
            F.when(F.col("n2") > 0, F.lit(2.0) - 3.0 * y * n3 / n2).otherwise(
                F.lit(2.0)
            ),
            F.lit(0.0),
        ).alias(f"{prefix}2"),
        F.greatest(
            F.when(F.col("n3") > 0, F.lit(3.0) - 4.0 * y * n4 / n3).otherwise(
                F.lit(3.0)
            ),
            F.lit(0.0),
        ).alias(f"{prefix}3"),
    )


def mkn_trigram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document NLL/perplexity under a MODIFIED KNESER-NEY trigram LM
    trained on ``df`` itself — the exact smoothing family of CCNet's
    published KenLM filter (Chen & Goodman's three-discount scheme), the
    depth step above :func:`kn_trigram_perplexity`'s single-D form:

    ``P(w3|w1w2) = max(c - D(c), 0)/C(w12.) + gamma(w12) * P2`` with
    ``D(c) = D1/D2/D3+`` chosen by the trigram's own count and
    ``gamma(w12) = (D1*B1(w12) + D2*B2(w12) + D3*B3+(w12)) / C(w12.)``
    (Bk = distinct continuations of w12 whose count is exactly k / >= 3
    — the mass each discount tier released). The middle level applies
    the same scheme to the CONTINUATION counts ``N1+(.w2w3)`` with its
    own count-of-count discounts; the floor is the continuation unigram.

    Thin wrapper over the order-generic :func:`mkn_ngram_perplexity`
    ladder at ``n=3`` (bit-exact equivalence to the former hardcoded
    implementation is pinned by this tier's independent exact-float
    Python-replay test and its DuckDB oracle). Returns ``id_col,
    n_trigrams, avg_nll, ppl`` (docs with < 3 tokens are excluded).
    """
    return mkn_ngram_perplexity(
        df, n=3, text_col=text_col, id_col=id_col
    ).withColumnRenamed("n_ngrams", "n_trigrams")


def _ngrams(t: "F.Column", n: int):
    """``array<string>`` of space-joined n-grams over a staged token array
    column (zip_with over n slices — pure projection, no shuffle)."""
    size = F.size(t) - (n - 1)
    out = F.slice(t, 1, size)
    for j in range(2, n + 1):
        out = F.zip_with(
            out, F.slice(t, j, size), lambda a, b: F.concat_ws(" ", a, b)
        )
    return out


def kn_fourgram_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document NLL/perplexity under an interpolated KNESER-NEY
    4-GRAM LM trained on ``df`` itself — the "one more order" step
    between :func:`kn_trigram_perplexity` and the order-5
    :func:`kn_ngram_perplexity` declaration.

    Thin wrapper over the order-generic :func:`kn_ngram_perplexity`
    ladder at ``n=4`` (bit-exact equivalence to the former hardcoded
    implementation is pinned by this tier's independent exact-float
    Python-replay test and its DuckDB oracle). Returns ``id_col,
    n_fourgrams, avg_nll, ppl`` (docs with < 4 tokens are excluded).
    """
    return kn_ngram_perplexity(
        df, n=4, text_col=text_col, id_col=id_col, discount=discount
    ).withColumnRenamed("n_ngrams", "n_fourgrams")



def kn_ngram_perplexity(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
) -> DataFrame:
    """Per-document NLL/perplexity under an interpolated KNESER-NEY LM of
    ARBITRARY order ``n >= 2`` trained on ``df`` itself — the
    order-generic form of :func:`kn_trigram_perplexity` /
    :func:`kn_fourgram_perplexity` (for ``n=4`` it reproduces the
    hardcoded tier's output exactly — asserted in tests). At ``n=5``
    this is the full published CCNet filter depth (5-gram KenLM's
    interpolated-KN recursion, single discount).

    Construction (the textbook KN ladder): the top level discounts raw
    n-gram counts against the (n-1)-word prefix; each backoff level
    ``k = n-1 .. 2`` uses CONTINUATION counts from the (k+1)-gram TYPE
    table (``N1+(. suffix_k)`` over ``N1+(. mid_k .)`` with the released
    mass ``D * Nmid(mid_k)``); the floor is the continuation unigram
    over bigram types. Trained-on-self keeps every count >= 1 — no
    backoff-miss branch, one fixed codegen float expression, fully
    oracle-checkable at any order.

    Scale shape: the corpus is tokenized and scanned ONCE, in the n-gram
    tf aggregate — every lower-order type table DERIVES from the pinned
    type table one order above it (on the >= n-token corpus every k-gram
    is the prefix or the suffix of some (k+1)-gram, so
    ``types_k = distinct(prefix_k UNION suffix_k of types_{k+1})``
    exactly: a k-gram at position p extends right when p+k <= doc_len,
    else p >= 2 and it extends left). Type-table work is therefore
    model-sized at every level (distinct grams, Zipf-sublinear), never a
    repeated corpus explode; all n-1 tables are localCheckpoint-pinned.
    2(n-2) + 3 equi-keyed scoring joins co-partition on their gram keys;
    N1+(..) rides a 1-row broadcast. Returns ``id_col, n_ngrams,
    avg_nll, ppl`` (docs with < n tokens are excluded).
    """
    n = int(n)
    if n < 2:
        raise ValueError(f"order must be >= 2, got {n}")
    d = float(discount)
    if not (0.0 < d < 1.0):
        raise ValueError(f"discount must be in (0, 1), got {discount}")
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__t"),
    ).filter(F.size("__t") >= n)
    t = F.col("__t")

    # pinned (r13): tf has two consumers (the type table's materialization
    # and the scoring join) — unpinned, the corpus tokenize+explode+agg ran
    # once per consumer execution
    tf = (
        toks.select(F.col(id_col), F.explode(_ngrams(t, n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    # n-gram TYPE table (pinned; doubles as the k = n-1 continuation source)
    keys = (
        tf.groupBy("g")
        .agg(F.sum("tf").alias("c_g"))
        .withColumn("pre", F.substring_index("g", " ", n - 1))
        .localCheckpoint(eager=True)
    )
    cpre = keys.groupBy("pre").agg(
        F.sum("c_g").alias("c_pre"),
        F.count("*").alias("n1p_pre"),
    )

    # backoff levels k = n-1 .. 2: suffix/mid tables off the (k+1)-gram
    # types; each lower type table derives from the one above (exact on
    # the >= n-token corpus — see docstring), so no level re-reads text
    level_tbls: dict[int, tuple[DataFrame, DataFrame]] = {}
    cur = keys.select(F.col("g").alias("h"))  # (k+1)-gram types, k = n-1
    for k in range(n - 1, 1, -1):
        staged = cur.withColumn("s", F.substring_index("h", " ", -k)).withColumn(
            "m", F.substring_index(F.substring_index("h", " ", -k), " ", k - 1)
        )
        tbl = staged.groupBy("s").agg(
            F.count("*").alias(f"n_dot_s{k}")
        ).withColumnRenamed("s", f"s{k}")
        ctx = staged.groupBy("m").agg(
            F.count("*").alias(f"n_dot_m{k}"),
            F.countDistinct("s").alias(f"n_mid{k}"),
        ).withColumnRenamed("m", f"m{k}")
        level_tbls[k] = (tbl, ctx)
        # k-gram types = distinct(prefix_k UNION suffix_k) of the current
        # (k+1)-gram types, pinned (the next level + floor reference it)
        cur = (
            cur.select(F.substring_index("h", " ", k).alias("h"))
            .unionByName(cur.select(F.substring_index("h", " ", -k).alias("h")))
            .distinct()
            .localCheckpoint(eager=True)
        )

    # unigram floor: cur is now the bigram TYPE table (pinned: two refs)
    btypes = cur.withColumnRenamed("h", "bg")
    cw1 = (
        btypes.withColumn("s1", F.substring_index("bg", " ", -1))
        .groupBy("s1")
        .agg(F.count("*").alias("n_dot_w"))
    )
    tot = btypes.agg(F.count("*").cast("double").alias("__nbt"))

    # NLL is a pure function of the GRAM (every joined statistic is keyed
    # on a substring of g), so the 2(n-2)+3 scoring joins run over the
    # MODEL-sized type table ``keys`` and the corpus-sized tf frame pays
    # ONE equi-join on g (optimization r14, guide §2.3/§3): previously tf
    # itself rode the whole chain, re-shuffling the corpus per join key
    # at model sizes past the broadcast threshold.
    scored = keys.withColumn("s1", F.substring_index("g", " ", -1))
    for k in range(2, n):
        sk = F.substring_index("g", " ", -k)
        scored = scored.withColumn(f"s{k}", sk).withColumn(
            f"m{k}", F.substring_index(sk, " ", k - 1)
        )
    scored = scored.join(cpre, "pre")
    for k in range(n - 1, 1, -1):
        tbl, ctx = level_tbls[k]
        scored = scored.join(tbl, f"s{k}").join(ctx, f"m{k}")
    scored = scored.join(cw1, "s1").crossJoin(F.broadcast(tot))

    dd = F.lit(d)
    p = F.col("n_dot_w").cast("double") / F.col("__nbt")
    for k in range(2, n):
        p = (
            F.greatest(F.col(f"n_dot_s{k}").cast("double") - dd, F.lit(0.0))
            / F.col(f"n_dot_m{k}").cast("double")
            + (
                dd
                * F.col(f"n_mid{k}").cast("double")
                / F.col(f"n_dot_m{k}").cast("double")
            )
            * p
        )
    p = (
        F.greatest(F.col("c_g").cast("double") - dd, F.lit(0.0))
        / F.col("c_pre").cast("double")
        + (dd * F.col("n1p_pre").cast("double") / F.col("c_pre").cast("double")) * p
    )
    gram_nll = scored.select("g", (-F.log(p)).alias("nll"))
    scored = tf.join(gram_nll, "g")
    avg_nll = F.sum(F.col("tf") * F.col("nll")) / F.sum("tf")
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_ngrams"),
        # + 0.0: on a degenerate corpus p = 1.0 exactly, nll = -0.0, and the
        # driver canonicalizer str()-sorts rows — normalize the IEEE sign
        # (mirrored in every LM oracle)
        (F.round(avg_nll, 4) + F.lit(0.0)).alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
    )


def mkn_ngram_perplexity(
    df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document NLL/perplexity under a MODIFIED KNESER-NEY LM of
    ARBITRARY order ``n >= 2`` trained on ``df`` itself — the
    order-generic composition of :func:`mkn_trigram_perplexity`'s
    Chen-Goodman three-discount scheme with :func:`kn_ngram_perplexity`'s
    continuation ladder. At ``n=5`` this is the actual published CCNet
    filter: 5-gram KenLM IS modified Kneser-Ney at order 5 (Heafield
    2011; Chen & Goodman 1999).

    Per level, the single fixed discount of the KN ladder is replaced by
    three count-of-count discounts ``D1/D2/D3+`` derived from that
    level's own count table (``Y = n1/(n1+2n2)`` etc., clamped >= 0 and
    CASE-guarded on degenerate corpora — see :func:`_mkn_discounts`),
    and the released-mass gamma becomes
    ``(D1*B1(ctx) + D2*B2(ctx) + D3*B3+(ctx)) / denom(ctx)`` where Bk
    counts the context's continuations with count exactly k / >= 3. The
    top level discounts raw n-gram counts; each backoff level ``k =
    n-1 .. 2`` applies the same scheme to CONTINUATION counts
    ``N1+(. suffix_k)`` from the (k+1)-gram TYPE table; the floor is the
    continuation unigram over bigram types. Trained-on-self keeps every
    count >= 1 — no backoff-miss branch, one fixed codegen float
    expression, fully oracle-checkable at any order.

    Scale shape identical to :func:`kn_ngram_perplexity`: the corpus is
    tokenized and scanned ONCE (the n-gram tf aggregate); every
    lower-order type table derives from the pinned table one order above
    (``types_k = distinct(prefix_k UNION suffix_k of types_{k+1})`` —
    exact on the >= n-token corpus), so type-table work is model-sized
    (Zipf-sublinear) at every level; suffix-count tables are pinned (3
    consumers each: histogram, context aggregate, scoring join); the
    n-1 discount triples and N1+(..) ride 1-row broadcasts; all
    2(n-2) + 3 scoring joins are equi-keyed. At ``n=3`` this reproduces
    :func:`mkn_trigram_perplexity` bit-exactly (asserted in tests).
    Returns ``id_col, n_ngrams, avg_nll, ppl`` (docs with < n tokens
    are excluded).
    """
    n = int(n)
    if n < 2:
        raise ValueError(f"order must be >= 2, got {n}")
    toks = df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__t"),
    ).filter(F.size("__t") >= n)
    t = F.col("__t")

    # pinned (r13): tf has two consumers (the type table's materialization
    # and the scoring join) — unpinned, the corpus tokenize+explode+agg ran
    # once per consumer execution
    tf = (
        toks.select(F.col(id_col), F.explode(_ngrams(t, n)).alias("g"))
        .groupBy(id_col, "g")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    # n-gram TYPE table (pinned; histogram + cpre + scoring + ladder seed)
    keys = (
        tf.groupBy("g")
        .agg(F.sum("tf").alias("c_g"))
        .withColumn("pre", F.substring_index("g", " ", n - 1))
        .localCheckpoint(eager=True)
    )
    d_top = _mkn_discounts(keys, "c_g", "dt")
    cg = F.col("c_g")
    cpre = keys.groupBy("pre").agg(
        F.sum("c_g").alias("c_pre"),
        F.sum(F.when(cg == 1, 1).otherwise(0)).alias("bt1"),
        F.sum(F.when(cg == 2, 1).otherwise(0)).alias("bt2"),
        F.sum(F.when(cg >= 3, 1).otherwise(0)).alias("bt3p"),
    )

    # backoff levels k = n-1 .. 2: continuation-count tables off the
    # (k+1)-gram types, each with its OWN count-of-count discounts and
    # per-context released-mass buckets (the mkn_trigram middle level,
    # repeated down the ladder)
    level_tbls: dict[int, tuple[DataFrame, DataFrame, DataFrame]] = {}
    cur = keys.select(F.col("g").alias("h"))  # (k+1)-gram types, k = n-1
    for k in range(n - 1, 1, -1):
        # NOT pinned despite 3 consumers (discount histogram, context
        # aggregate, scoring join): the parent type table `cur` IS pinned,
        # so each recompute is one model-sized aggregate — no corpus
        # lineage — while the pin's materialization + job boundaries
        # measured 2x the whole query wall at sf0.1 (13.1 -> 6.5 s cold)
        tbl = (
            cur.select(F.substring_index("h", " ", -k).alias(f"s{k}"))
            .groupBy(f"s{k}")
            .agg(F.count("*").alias(f"cc{k}"))
        )
        dk = _mkn_discounts(tbl, f"cc{k}", f"dm{k}_")
        cck = F.col(f"cc{k}")
        ctx = (
            tbl.withColumn(f"m{k}", F.substring_index(F.col(f"s{k}"), " ", k - 1))
            .groupBy(f"m{k}")
            .agg(
                F.sum(f"cc{k}").alias(f"n_dot_m{k}"),
                F.sum(F.when(cck == 1, 1).otherwise(0)).alias(f"b1_{k}"),
                F.sum(F.when(cck == 2, 1).otherwise(0)).alias(f"b2_{k}"),
                F.sum(F.when(cck >= 3, 1).otherwise(0)).alias(f"b3p_{k}"),
            )
        )
        level_tbls[k] = (tbl, ctx, dk)
        cur = (
            cur.select(F.substring_index("h", " ", k).alias("h"))
            .unionByName(cur.select(F.substring_index("h", " ", -k).alias("h")))
            .distinct()
            .localCheckpoint(eager=True)
        )

    btypes = cur.withColumnRenamed("h", "bg")
    cw1 = (
        btypes.withColumn("s1", F.substring_index("bg", " ", -1))
        .groupBy("s1")
        .agg(F.count("*").alias("n_dot_w"))
    )
    tot = btypes.agg(F.count("*").cast("double").alias("__nbt"))

    # NLL is a pure function of the GRAM — the 2(n-2)+3 scoring joins run
    # over the MODEL-sized type table ``keys`` and the corpus-sized tf
    # frame pays ONE equi-join on g (optimization r14, guide §2.3/§3 —
    # same factoring as :func:`kn_ngram_perplexity`).
    scored = keys.withColumn("s1", F.substring_index("g", " ", -1))
    for k in range(2, n):
        sk = F.substring_index("g", " ", -k)
        scored = scored.withColumn(f"s{k}", sk).withColumn(
            f"m{k}", F.substring_index(sk, " ", k - 1)
        )
    scored = scored.join(cpre, "pre")
    for k in range(n - 1, 1, -1):
        tbl, ctx, dk = level_tbls[k]
        scored = (
            scored.join(tbl, f"s{k}").join(ctx, f"m{k}").crossJoin(F.broadcast(dk))
        )
    scored = (
        scored.join(cw1, "s1")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(d_top))
    )

    def disc(count, prefix):
        return (
            F.when(count == 1, F.col(f"{prefix}1"))
            .when(count == 2, F.col(f"{prefix}2"))
            .otherwise(F.col(f"{prefix}3"))
        )

    p = F.col("n_dot_w").cast("double") / F.col("__nbt")
    for k in range(2, n):
        cck = F.col(f"cc{k}")
        nmd = F.col(f"n_dot_m{k}").cast("double")
        gamma = (
            F.col(f"dm{k}_1") * F.col(f"b1_{k}").cast("double")
            + F.col(f"dm{k}_2") * F.col(f"b2_{k}").cast("double")
            + F.col(f"dm{k}_3") * F.col(f"b3p_{k}").cast("double")
        ) / nmd
        p = (
            F.greatest(cck.cast("double") - disc(cck, f"dm{k}_"), F.lit(0.0)) / nmd
            + gamma * p
        )
    c_gd = F.col("c_g").cast("double")
    c_pred = F.col("c_pre").cast("double")
    gamma_top = (
        F.col("dt1") * F.col("bt1").cast("double")
        + F.col("dt2") * F.col("bt2").cast("double")
        + F.col("dt3") * F.col("bt3p").cast("double")
    ) / c_pred
    p = (
        F.greatest(c_gd - disc(F.col("c_g"), "dt"), F.lit(0.0)) / c_pred
        + gamma_top * p
    )
    gram_nll = scored.select("g", (-F.log(p)).alias("nll"))
    scored = tf.join(gram_nll, "g")
    avg_nll = F.sum(F.col("tf") * F.col("nll")) / F.sum("tf")
    return scored.groupBy(id_col).agg(
        F.sum("tf").cast("bigint").alias("n_ngrams"),
        # + 0.0: on a degenerate corpus p = 1.0 exactly, nll = -0.0, and the
        # driver canonicalizer str()-sorts rows — normalize the IEEE sign
        # (mirrored in every LM oracle)
        (F.round(avg_nll, 4) + F.lit(0.0)).alias("avg_nll"),
        F.round(F.exp(avg_nll), 4).alias("ppl"),
    )
