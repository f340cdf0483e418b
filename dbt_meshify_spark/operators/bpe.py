"""BPE tokenizer: sample-trained merges, distributed Arrow-batched encode.

The training-data pipeline's tokenizer tier. Mirrors the IVF-quantizer
posture (similarity.py::train_ivf_centroids): the iterative/greedy part
(merge learning) runs driver-side on a bounded deterministic sample — the
standard practice for web-scale corpora (tokenizers train on ~1 GB samples,
not 100 TB) — while the hot path (encoding every document) is a broadcast
merge table applied in an Arrow-batched pandas UDF, fully distributed and
shuffle-free.

No reference analog (dbt-meshify has no tokenizer surface); this extends
SURVEY.md §2.6 N4/N9 (token counting / vocabulary-and-encoding) with the
subword tier the BASELINE north star asks for.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# End-of-word marker, appended to each whitespace word before merging so
# merges never cross word boundaries and word-final subwords are distinct.
EOW = "</w>"


def _symbol_seq(col, alphabet: str):
    """Initial guard-spaced symbol sequence for a word, per alphabet.

    - ``"char"``: one symbol per character (the classic BPE base alphabet).
    - ``"byte"``: one symbol per UTF-8 BYTE, written as its lowercase
      two-hex-digit value — the GPT-2-style byte-level tier. GPT-2's
      bytes_to_unicode table exists only to make byte symbols printable
      single characters; merge semantics depend solely on the alphabet
      being a bijection on bytes, and a hex-pair alphabet is that bijection
      in a form BOTH engines produce identically (``lower(hex(encode(w)))``
      in Spark and DuckDB), so byte-level training/encoding stays
      hash-checkable. Tokens decode by unhexing the concatenated symbols
      (round-trips any non-ASCII/emoji input byte-exactly).
    """
    if alphabet == "char":
        body = F.trim(F.regexp_replace(col, "(.)", "$1 "))
    elif alphabet == "byte":
        body = F.trim(
            F.regexp_replace(
                F.lower(F.hex(F.encode(col, "UTF-8"))), "(..)", "$1 "
            )
        )
    else:
        raise ValueError(f"unknown BPE alphabet: {alphabet!r}")
    return F.concat(F.lit(" "), body, F.lit(f" {EOW} "))


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    sample_max: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a bounded deterministic sample.

    Sampling is a hash-mod filter on the id (no partition-order dependence),
    covering at most ~``sample_max`` documents regardless of corpus size.
    The driver never sees raw text: word counting is a distributed
    explode+groupBy over the sample, and only the aggregated (word, count)
    VOCAB is collected — orders of magnitude smaller than the sampled
    documents and the thing the greedy merge loop actually consumes.
    Ties in pair frequency break lexicographically so the learned merge
    table is identical run-to-run and cluster-to-cluster.
    """
    n = df.count()
    mod = max(1, n // max(sample_max, 1))
    vocab_rows = (
        df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0)
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
            ).alias("_w")
        )
        .filter(F.col("_w") != "")
        .groupBy("_w")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    )
    words = {tuple(r._w) + (EOW,): int(r._c) for r in vocab_rows}

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for sym, cnt in words.items():
            for a, b in zip(sym, sym[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + cnt
        if not pair_counts:
            break
        best = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
        (a, b), freq = best
        if freq < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_words: dict[tuple[str, ...], int] = {}
        for sym, cnt in words.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_words[key] = new_words.get(key, 0) + cnt
        words = new_words
    return merges


def train_bpe_distributed(
    df: DataFrame,
    n_merges: int = 8,
    text_col: str = "text",
    alphabet: str = "char",
) -> DataFrame:
    """Learn BPE merges over the FULL corpus vocabulary, distributed — the
    no-sample-cap twin of :func:`train_bpe`.

    Scale shape: the corpus reduces ONCE to the (word-type, freq) table —
    Zipf-bounded (millions of types for any corpus size), one explode +
    one map-side-combined shuffle; the raw text never participates again.
    Each merge round then runs on the type table alone: one adjacent-pair
    projection (HOF over the symbol array — bounded by types, not tokens),
    one weighted count aggregate, a 1-row argmax collect (the only driver
    data: the winning pair, IVF-centroid posture), and one codegen'd
    substring replace applying the merge. The symbol-sequence frame is
    ``localCheckpoint``-pinned per round (O(1) lineage, the graph-loop
    discipline).

    Merge application semantics (cross-engine exact): sequences carry
    symbols space-delimited with guard spaces (`` a b c </w> ``); applying
    merge (x, y) is ONE plain left-to-right non-overlapping substring
    replace of ``' x y '`` with ``' xy '`` — identical in Spark, DuckDB,
    and Python, so the DuckDB oracle replays training bit-exactly. On runs
    of >= 3 identical symbols this single pass can under-merge relative to
    reference BPE's leftmost-greedy scan (the consumed boundary space
    hides back-to-back matches — e.g. ``a a a a`` merges once, not
    twice); real-text character runs are rare, the deviation is
    deterministic, and both engines share it. Ties break like
    :func:`train_bpe`: (freq, lhs, rhs) all DESC.

    Returns a ``merge_rank, lhs, rhs, merged, freq`` DataFrame (bounded:
    ``n_merges`` rows — planning output, like a mixture recipe).
    """
    spark = df.sparkSession
    words = (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seq = words.select(
        "freq", _symbol_seq(F.col("w"), alphabet).alias("seq")
    ).localCheckpoint(eager=False)

    rows = []
    for rank in range(1, int(n_merges) + 1):
        # stage the symbol array as a real column BEFORE the HOF (the
        # measured no-CSE-inside-lambdas rule: an inline split would
        # re-evaluate per lambda reference)
        staged = seq.select(
            "freq", F.split(F.trim(F.col("seq")), " ").alias("syms")
        )
        pairs = F.expr(
            "transform(slice(syms, 1, size(syms) - 1),"
            " (x, i) -> struct(x AS lhs, element_at(syms, i + 2) AS rhs))"
        )
        counts = (
            staged.select("freq", F.explode(pairs).alias("p"))
            .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
            .agg(F.sum("freq").alias("f"))
        )
        best = counts.orderBy(
            F.col("f").desc(), F.col("lhs").desc(), F.col("rhs").desc()
        ).limit(1).collect()
        if not best:
            break
        b = best[0]
        rows.append((rank, b["lhs"], b["rhs"], b["lhs"] + b["rhs"], int(b["f"])))
        seq = seq.select(
            "freq",
            F.replace(
                F.col("seq"),
                F.lit(f" {b['lhs']} {b['rhs']} "),
                F.lit(f" {b['lhs']}{b['rhs']} "),
            ).alias("seq"),
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, merged string, freq bigint"
    )


#: Scratch root for persisted BPE merge tables (the tokenizer analog of
#: ``similarity.DEFAULT_IVF_DIR``).
DEFAULT_BPE_DIR = "/tmp/dbt_meshify_spark_bpe"


def ensure_bpe_merges(
    spark,
    df: DataFrame,
    cache_key: str,
    n_merges: int = 8,
    text_col: str = "text",
    source_path: str | None = None,
    base_dir: str = DEFAULT_BPE_DIR,
    alphabet: str = "char",
) -> list[tuple[str, str]]:
    """Persisted :func:`train_bpe_distributed` keyed on ``cache_key``:
    train ONCE, parquet round-trip, reuse across sessions — so
    encode-shaped queries serve warm instead of paying the fixed
    training cost in-query every run (the `ensure_ivf_index` deployment
    shape for the tokenizer tier; training dominated the
    `ext_bpe_encode_dist` wall time before this cache existed).

    Reuse is gated on the ``_SUCCESS`` marker AND the source fingerprint
    (the shared ``ensure_cached_layout`` gate): a corpus parquet
    regenerated in place retrains instead of silently serving stale
    merges. The cache identity folds in ``n_merges`` and ``text_col``
    via the length-prefixed ``cache_slug``, so two configs training
    different tables off the same corpus cannot collide. Returns the
    merges as an ordered ``[(lhs, rhs), ...]`` list (the form every
    encoder takes); the collect is bounded by ``n_merges`` rows —
    planning output, never corpus data. Training is deterministic (ties
    break (freq, lhs, rhs) DESC), so a warm merge table is bit-identical
    to a cold retrain and downstream encodes stay oracle-checkable.
    """
    import os

    from dbt_meshify_spark.sources.bucketing import cache_slug, ensure_cached_layout

    slug = cache_slug(cache_key.strip("/"), text_col, alphabet)
    d = os.path.join(base_dir, f"bpe{int(n_merges)}_{slug}")

    def build(layout_dir: str) -> None:
        merges = train_bpe_distributed(
            df, n_merges=n_merges, text_col=text_col, alphabet=alphabet
        )
        merges.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(layout_dir, "merges")
        )

    ensure_cached_layout(d, source_path, ["merges"], build)
    rows = spark.read.parquet(os.path.join(d, "merges")).orderBy("merge_rank").collect()
    return [(r.lhs, r.rhs) for r in rows]


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def apply_bpe(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Encode every document with the learned merge table.

    The merge table rides the UDF closure (broadcast by Spark as task
    metadata — a few KB for any realistic vocab); encoding is an
    Arrow-batched pandas UDF, so the corpus is never shuffled and each task
    streams record batches. Adds ``out_col`` (array<string>) and
    ``n_bpe_tokens``.
    """
    ranks = {pair: i for i, pair in enumerate(merges)}

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(texts: pd.Series) -> pd.Series:
        # Per-word memo, held by the executor's Python worker across Arrow
        # batches: natural language repeats words heavily (Zipf), so the
        # quadratic merge scan runs once per DISTINCT word, not once per
        # occurrence — measured ~3x on the sf0.1 encode pass.
        memo: dict[str, list[str]] = {}

        def enc(text: str) -> list[str]:
            if not text:
                return []
            out: list[str] = []
            for w in text.strip().lower().split():
                toks = memo.get(w)
                if toks is None:
                    toks = _encode_word(w, ranks)
                    memo[w] = toks
                out.extend(toks)
            return out

        return texts.map(enc)

    return df.withColumn(out_col, encode(F.col(text_col))).withColumn(
        "n_bpe_tokens", F.size(out_col).cast("long")
    )


def apply_bpe_delimited(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    alphabet: str = "char",
) -> DataFrame:
    """Encode with :func:`train_bpe_distributed`'s merge table using the
    SAME boundary-delimited single-pass replace semantics — the
    hash-checkable encode twin of :func:`apply_bpe` (whose greedy
    rank-priority scan has no SQL form).

    Each merge (lhs, rhs) is ONE plain left-to-right non-overlapping
    replace of ``' lhs rhs '`` with ``' lhsrhs '`` over the guard-spaced
    symbol sequence, applied in merge_rank order — identical in Spark,
    DuckDB, and the trainer itself, so an oracle can replay encoding
    bit-exactly by unrolling the merge chain. Shares the trainer's
    documented deviation: runs of >= 3 identical symbols under-merge per
    pass relative to reference BPE's leftmost-greedy scan (deterministic,
    engine-identical; see ``train_bpe_distributed``).

    Scale shape: occurrences reduce ONCE to the Zipf-bounded DISTINCT
    word-type table; the merge chain is pure codegen string replace over
    types (no UDF, no per-occurrence work); occurrences re-join on the
    word and per-doc token arrays rebuild with one aggregation — two
    keys-only shuffles total, corpus text never carries through the merge
    chain. Adds ``out_col`` (array<string>) and ``n_bpe_tokens``; docs
    with no words are absent (no-token docs have no BPE rows to emit).
    """
    occ = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "w"),
    ).filter(F.col("w") != "")
    types = occ.select("w").distinct().withColumn(
        "__seq", _symbol_seq(F.col("w"), alphabet)
    )
    for lhs, rhs in merges:
        types = types.withColumn(
            "__seq",
            F.replace(
                F.col("__seq"),
                F.lit(f" {lhs} {rhs} "),
                F.lit(f" {lhs}{rhs} "),
            ),
        )
    types = types.select(
        "w", F.split(F.trim(F.col("__seq")), " ").alias("__wtoks")
    )
    return (
        occ.join(types, "w")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "__wtoks"))).alias("__o")
        )
        .select(F.col(id_col), F.flatten("__o.__wtoks").alias(out_col))
        .withColumn("n_bpe_tokens", F.size(out_col).cast("long"))
    )
