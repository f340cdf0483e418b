"""Rule-based corpus filtering (N4/N9): the published Gopher document rules
and C4 line-level cleaning, re-expressed as Spark column projections.

These are the cheap deterministic gates every LLM-corpus pipeline runs
before any model-scored or pairwise stage (Rae et al. 2021 "Scaling Language
Models" appendix A; Raffel et al. 2020 C4 §2.2). No reference analog
(dbt-meshify has no text plane).

Plan shape at 100 TB: every rule is a scalar expression over the text
column — zero shuffles, fused into the parquet scan by Catalyst, and the
filter composes with any downstream operator's pushdown. The only
interpreted (non-codegen) pieces are two single-pass array lambdas
(alpha-word fraction, line cleaning); everything countable by regex or
``replace`` arithmetic stays in whole-stage codegen, matching the one-pass
discipline documented in SCALE.md.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# the Gopher "required words" set: a doc with fewer than min_stop_hits of
# these is likely boilerplate / word salad rather than prose
STOP_SET = ("the", "be", "to", "of", "and", "that", "have", "with")


def _count_occurrences(text: Column, needle: str) -> Column:
    """Occurrences of a literal substring — replace-arithmetic, codegen'd."""
    return (
        (F.length(text) - F.length(F.replace(text, F.lit(needle), F.lit(""))))
        / len(needle)
    ).cast("bigint")


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
) -> DataFrame:
    """Append the per-rule verdicts and the composite ``gopher_keep`` flag.

    Rules (defaults are the published Gopher thresholds):

    - ``r_word_count``:    min_words <= #words <= max_words
    - ``r_mean_word_len``: 3 <= mean word length <= 10
    - ``r_symbol_ratio``:  (#'#' + #'...') / #words <= 0.1
    - ``r_bullet_lines``:  fraction of lines starting with a bullet <= 0.9
    - ``r_ellipsis_lines``: fraction of lines ending with '...' <= 0.3
    - ``r_alpha_words``:   fraction of words containing a letter >= 0.8
    - ``r_stopwords``:     at least 2 distinct words from STOP_SET present

    Every count is either ``replace``/regex arithmetic (codegen) or one
    array pass; the stopword test is 8 codegen'd ``array_contains`` probes,
    not a join.
    """
    text = F.col(text_col)
    toks = F.split(F.trim(F.lower(text)), r"\s+")
    n_words = F.greatest(F.size(toks), F.lit(1))
    # exact mean word length: total non-whitespace chars / words (robust to
    # runs of whitespace, unlike the single-space assumption)
    tok_chars = F.length(F.regexp_replace(F.trim(text), r"\s+", ""))
    mean_word_len = tok_chars / n_words
    symbols = _count_occurrences(text, "#") + _count_occurrences(text, "...")
    # line structure: (?m) anchors ^/$ at line boundaries — RE2-compatible,
    # so the DuckDB oracle runs the identical patterns
    n_lines = _count_occurrences(text, "\n") + 1
    bullet_lines = F.size(F.regexp_extract_all(text, F.lit(r"(?m)^[ \t]*[-*•]"), 0))
    ellipsis_lines = F.size(F.regexp_extract_all(text, F.lit(r"(?m)\.\.\.[ \t]*$"), 0))
    alpha_words = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    stop_hits = sum(
        (F.array_contains(toks, w).cast("int") for w in STOP_SET[1:]),
        F.array_contains(toks, STOP_SET[0]).cast("int"),
    )
    out = df.withColumns(
        {
            "n_words": F.size(toks).cast("bigint"),
            "mean_word_len": F.round(mean_word_len, 4),
            "symbol_ratio": F.round(symbols / n_words, 4),
            "bullet_frac": F.round(bullet_lines / n_lines, 4),
            "ellipsis_frac": F.round(ellipsis_lines / n_lines, 4),
            "alpha_frac": F.round(alpha_words / n_words, 4),
            "stop_hits": stop_hits.cast("bigint"),
        }
    )
    rules = {
        "r_word_count": (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words),
        "r_mean_word_len": (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len),
        "r_symbol_ratio": F.col("symbol_ratio") <= max_symbol_ratio,
        "r_bullet_lines": F.col("bullet_frac") <= max_bullet_frac,
        "r_ellipsis_lines": F.col("ellipsis_frac") <= max_ellipsis_frac,
        "r_alpha_words": F.col("alpha_frac") >= min_alpha_frac,
        "r_stopwords": F.col("stop_hits") >= min_stop_hits,
    }
    out = out.withColumns(rules)
    keep = F.lit(True)
    for name in rules:
        keep = keep & F.col(name)
    return out.withColumn("gopher_keep", keep)


def c4_line_clean(
    df: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    require_terminal_punct: bool = True,
    banned_phrases: tuple[str, ...] = ("javascript", "lorem ipsum", "{"),
    min_lines_kept: int = 1,
) -> DataFrame:
    """C4-style line-level cleaning: keep a line iff it has at least
    ``min_words_per_line`` words, (optionally) ends in terminal punctuation,
    and contains no banned phrase; a document survives iff at least
    ``min_lines_kept`` lines survive.

    Appends ``text_clean`` (kept lines re-joined), ``n_lines``,
    ``n_lines_kept``, ``c4_keep``. One array pass per document; corpus-level
    duplicate-span removal is the separate ``operators.dedup`` passage
    family (C4's "three-sentence span" dedup is a corpus-wide op, not a
    per-doc rule).
    """
    text = F.col(text_col)
    lines = F.split(text, "\n")

    def _line_ok(line: Column) -> Column:
        t = F.trim(line)
        ok = F.size(F.split(t, r"\s+")) >= min_words_per_line
        if require_terminal_punct:
            ok = ok & t.rlike(r"""[.!?"']$""")
        low = F.lower(t)
        for phrase in banned_phrases:
            ok = ok & ~low.contains(phrase)
        return ok

    kept = F.filter(lines, _line_ok)
    return df.withColumns(
        {
            "n_lines": F.size(lines).cast("bigint"),
            "n_lines_kept": F.size(kept).cast("bigint"),
            "text_clean": F.array_join(kept, "\n"),
            "c4_keep": F.size(kept) >= min_lines_kept,
        }
    )
