"""Unigram-LM (SentencePiece-style) tokenizer: distributed Viterbi-EM
training over the word-type table, Arrow-batched encode.

The OTHER mainstream training-data tokenizer next to BPE (Kudo 2018,
"Subword Regularization"; the SentencePiece unigram model): pieces carry a
unigram probability and a word's tokenization is the max-likelihood
segmentation (Viterbi). Training is EM; this implementation uses the
deterministic hard-EM (Viterbi-E) variant with a FIXED piece inventory and
a FIXED iteration count so the whole fit is bit-reproducible and a DuckDB
oracle can replay every round (the fixed-iters parity discipline of the
BPE/graph families):

- the corpus reduces ONCE to the Zipf-bounded (word-type, freq) table —
  one explode + one map-side-combined shuffle, exactly
  ``bpe.train_bpe_distributed``'s reduce-once shape; raw text never
  participates again;
- the seed inventory is every substring of length <= ``max_piece_len`` of
  every word type (occurrence-weighted by word freq), kept when its count
  reaches ``min_count`` — single characters are ALWAYS kept, so every word
  stays segmentable; the inventory is model-sized and never grows;
- each EM round: the current model (piece -> Laplace-smoothed NLL,
  ``-ln((cnt + 1) / (tot + n_pieces))`` over integer counts) is COLLECTED
  driver-side (bounded by the inventory — the IVF-centroid / BPE-merge
  posture) and broadcast into an Arrow-batched pandas UDF that runs the
  per-word Viterbi DP over word TYPES (not occurrences); usage counts
  re-aggregate distributed (explode + sum(freq));
- ties in the DP break on (cost, start_pos) exactly — both engines compare
  the same IEEE doubles built by the same op order, so the oracle's
  ROW_NUMBER() OVER (ORDER BY cost, pos) replays the argmin bit-exactly.

Words longer than ``max_word_len`` are EXCLUDED from training (documented,
mirrored in the oracle; the Zipf tail of >max-length word types carries
negligible mass). No reference analog (dbt-meshify has no tokenizer
surface); extends SURVEY.md §2.6 N4/N9 alongside ``operators/bpe.py``.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def word_types(
    df: DataFrame, text_col: str = "text", max_word_len: int = 12
) -> DataFrame:
    """The Zipf-bounded (word-type, freq) training table: lowercased
    whitespace words of length 1..``max_word_len``."""
    return (
        df.select(
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("w")
        )
        .filter((F.col("w") != "") & (F.length("w") <= max_word_len))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def seed_piece_counts(
    types: DataFrame, max_piece_len: int = 4, min_count: int = 2
) -> DataFrame:
    """Seed inventory: every substring of length 1..``max_piece_len`` of
    every word type, occurrence-weighted by word freq; kept when the count
    reaches ``min_count`` OR the piece is a single character (coverage
    guarantee). Pure projection + one keyed aggregate over the type table
    (model-sized; never touches occurrences)."""
    pos = types.select(
        "w",
        "freq",
        F.explode(F.sequence(F.lit(1), F.length("w"))).alias("i"),
    )
    pieces = pos.select(
        "freq",
        F.explode(
            F.sequence(
                F.lit(1),
                F.least(F.lit(int(max_piece_len)), F.length("w") - F.col("i") + 1),
            )
        ).alias("l"),
        F.col("w"),
        F.col("i"),
    ).select(F.substring("w", F.col("i"), F.col("l")).alias("piece"), "freq")
    return (
        pieces.groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
        .filter((F.col("cnt") >= int(min_count)) | (F.length("piece") == 1))
    )


def _viterbi(w: str, model: dict[str, float], max_piece_len: int) -> list[str]:
    """Max-likelihood segmentation under ``model`` (piece -> NLL); ties
    break on (cost, start_pos) — the oracle's ORDER BY cost, pos. Single
    characters are always in the model, so every position is reachable."""
    n = len(w)
    dp: list[tuple[float, int, str] | None] = [None] * (n + 1)
    dp[0] = (0.0, -1, "")
    for j in range(1, n + 1):
        best = None
        for k in range(max(0, j - max_piece_len), j):
            prev = dp[k]
            if prev is None:
                continue
            nll = model.get(w[k:j])
            if nll is None:
                continue
            cand = (prev[0] + nll, k, w[k:j])
            if best is None or cand[:2] < best[:2]:
                best = cand
        dp[j] = best
    out: list[str] = []
    pos = n
    while pos > 0:
        assert dp[pos] is not None, "unreachable position (missing char piece)"
        _, k, piece = dp[pos]  # type: ignore[misc]
        out.append(piece)
        pos = k
    out.reverse()
    return out


def _segment_types(
    types: DataFrame, model: dict[str, float], max_piece_len: int
) -> DataFrame:
    """Viterbi-segment the (pinned) word-type table under ``model``:
    adds ``pieces`` (array<string>, forward order). One Arrow-batched
    pass with a per-word memo; the model rides the closure (bounded by
    the inventory)."""

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def segment(words: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def seg(w: str) -> list[str]:
            got = memo.get(w)
            if got is None:
                got = _viterbi(w, model, max_piece_len)
                memo[w] = got
            return got

        return words.map(seg)

    return types.withColumn("pieces", segment(F.col("w")))


def _em_usage(types: DataFrame, model: dict[str, float], max_piece_len: int) -> DataFrame:
    """One E-step: Viterbi-segment the (pinned) word-type table under
    ``model`` and re-aggregate piece usage counts weighted by word freq.
    Exposed separately so the plan guard can assert the round's shape:
    one Arrow-batched UDF over the pinned types (ExistingRDD, zero
    parquet scans) + one keyed aggregate — EM rounds never replay the
    corpus tokenize."""
    return (
        _segment_types(types, model, max_piece_len)
        .select("freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )


def _model_nll(rows: list, n_pieces: int, total: int) -> dict[str, float]:
    """Laplace-smoothed piece NLLs from integer counts — the exact float
    expression the oracle replays: ``-ln((cnt + 1.0) / (tot + np))``."""
    denom = float(total) + float(n_pieces)
    return {r["piece"]: -math.log((float(r["cnt"]) + 1.0) / denom) for r in rows}


def _fit(
    df: DataFrame,
    n_iters: int,
    max_piece_len: int,
    max_word_len: int,
    min_count: int,
    text_col: str,
):
    """Run the fixed-iteration Viterbi-EM loop; returns
    ``(types, final_model, final_usage)`` where ``final_model`` is the
    LAST round's Laplace-smoothed NLL table (the model that produced
    ``final_usage`` — and therefore the model a hash-checkable encode
    must segment under). Shared by :func:`train_unigram` and
    :func:`unigram_encode_delimited` so the two queries can never train
    differently."""
    if int(n_iters) < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    types = word_types(df, text_col=text_col, max_word_len=max_word_len)
    types = types.localCheckpoint(eager=False)  # 1 + n_iters consumers
    seed = seed_piece_counts(
        types, max_piece_len=max_piece_len, min_count=min_count
    )
    inv_rows = seed.collect()  # bounded: the piece inventory
    n_pieces = len(inv_rows)
    inventory = sorted(r["piece"] for r in inv_rows)
    counts = {r["piece"]: int(r["cnt"]) for r in inv_rows}
    L = int(max_piece_len)

    usage: dict[str, int] = {}
    model: dict[str, float] = {}
    for _ in range(int(n_iters)):
        total = sum(counts.values())
        model = _model_nll(
            [{"piece": p, "cnt": counts.get(p, 0)} for p in inventory],
            n_pieces,
            total,
        )
        used = _em_usage(types, model, L).collect()
        usage = {r["piece"]: int(r["cnt"]) for r in used}
        # fixed inventory: unused pieces stay at count 0 (Laplace keeps
        # them alive in the next round's model)
        counts = {p: usage.get(p, 0) for p in inventory}
    return types, model, usage


def train_unigram(
    df: DataFrame,
    vocab_size: int = 64,
    n_iters: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    min_count: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Fit the unigram-LM piece inventory with ``n_iters`` deterministic
    Viterbi-EM rounds and return the top-``vocab_size`` pieces by final
    usage as ``rank, piece, freq`` (INTEGER counts — the output is float-
    free, so the DuckDB oracle hash-checks it bit-exactly by unrolling the
    DP rounds as MATERIALIZED CTEs).

    Scale shape: one corpus scan builds the pinned word-type table; every
    EM round is one Arrow-batched Viterbi pass over word TYPES + one
    keyed usage aggregate; the only driver data is the piece inventory
    (model-sized, the IVF/BPE collect posture). Fixed iterations — not
    convergence-tested — keep engine parity (truncation is a semantics,
    not an error: the fixed-iters discipline of kcore/LPA/BPE).
    """
    _types, _model, usage = _fit(
        df, n_iters, max_piece_len, max_word_len, min_count, text_col
    )
    spark = df.sparkSession
    final = [(p, c) for p, c in usage.items() if c > 0]
    final.sort(key=lambda pc: (-pc[1], pc[0]))
    rows = [
        (i + 1, p, c) for i, (p, c) in enumerate(final[: int(vocab_size)])
    ]
    return spark.createDataFrame(rows, "rank int, piece string, freq bigint")


def apply_unigram(
    df: DataFrame,
    model_counts: dict[str, int],
    text_col: str = "text",
    out_col: str = "unigram_tokens",
    max_piece_len: int = 4,
) -> DataFrame:
    """Encode every document by Viterbi segmentation under a trained piece
    model (``piece -> count``; Laplace-smoothed NLLs derived exactly as in
    training). The model rides the UDF closure (bounded); encoding is one
    Arrow-batched pass with a per-word memo (Zipf: the DP runs once per
    distinct word). Words containing a character ABSENT from the model
    (possible when encoding unseen text) fall back to character pieces for
    the unknown chars via an implicit +inf-free guard: unknown single
    chars get the model's worst NLL + 1. Adds ``out_col`` and
    ``n_unigram_tokens``."""
    n_pieces = len(model_counts)
    total = sum(model_counts.values())
    denom = float(total) + float(n_pieces)
    model = {
        p: -math.log((float(c) + 1.0) / denom) for p, c in model_counts.items()
    }
    worst = (max(model.values()) if model else 0.0) + 1.0
    L = int(max_piece_len)

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def encode(tok_arrays: pd.Series) -> pd.Series:
        memo: dict[str, list[str]] = {}

        def seg_word(w: str) -> list[str]:
            got = memo.get(w)
            if got is not None:
                return got
            unk = {ch for ch in w if ch not in model}
            if unk:
                padded = dict(model)
                for ch in unk:
                    padded[ch] = worst
            else:
                padded = model  # common case: no O(|model|) copy per word
            got = _viterbi(w, padded, L)
            memo[w] = got
            return got

        def enc(toks) -> list[str]:
            if toks is None:
                return []
            out: list[str] = []
            for w in toks:
                if w:
                    out.extend(seg_word(w))
            return out

        return tok_arrays.map(enc)

    # tokenize JVM-side with the SAME lower/trim/\s+ expression training's
    # word_types uses — a Python str.split() here diverges on Unicode
    # whitespace (Java \s is ASCII-only) and would desynchronize encode
    # fertility from the trained model on such corpora
    return (
        df.withColumn(
            "__uni_toks", F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        )
        .withColumn(out_col, encode(F.col("__uni_toks")))
        .drop("__uni_toks")
        .withColumn("n_unigram_tokens", F.size(out_col).cast("long"))
    )


def unigram_encode_delimited(
    df: DataFrame,
    n_iters: int = 2,
    max_piece_len: int = 4,
    max_word_len: int = 12,
    min_count: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "unigram_tokens",
) -> DataFrame:
    """Hash-checkable train->encode twin of :func:`apply_unigram` (the
    ``apply_bpe_delimited`` posture for the unigram family): fit the
    model with :func:`_fit` (identical to :func:`train_unigram`), then
    Viterbi-segment each DISTINCT word type once and rebuild per-doc
    token arrays from occurrences. Only words inside the training domain
    (non-empty, length <= ``max_word_len``) are encoded — mirrored in
    the oracle, which replays the whole fit AND reads each word's final
    segmentation straight off the last EM round's backpointer walk.

    Scale shape: occurrences reduce ONCE to the word-type table; the DP
    runs once per distinct word (Arrow-batched, model in closure);
    occurrences re-join on the word and per-doc arrays rebuild with one
    aggregation — two keys-only shuffles, corpus text never carries
    through the model. Adds ``out_col`` (array<string>) and
    ``n_unigram_tokens``; docs with no encodable words are absent.
    """
    types, model, _ = _fit(
        df, n_iters, max_piece_len, max_word_len, min_count, text_col
    )
    occ = df.select(
        F.col(id_col),
        F.posexplode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("pos", "w"),
    ).filter((F.col("w") != "") & (F.length("w") <= int(max_word_len)))
    segs = _segment_types(types, model, int(max_piece_len)).select(
        "w", F.col("pieces").alias("__wtoks")
    )
    return (
        occ.join(segs, "w")
        .groupBy(id_col)
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "__wtoks"))).alias("__o")
        )
        .select(F.col(id_col), F.flatten("__o.__wtoks").alias(out_col))
        .withColumn("n_unigram_tokens", F.size(out_col).cast("long"))
    )
