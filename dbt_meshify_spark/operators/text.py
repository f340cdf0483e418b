"""Text analysis operators (N4): token stats, language ID, quality scoring,
document fingerprinting.

All are single-pass projections built from built-in string/regexp functions —
no shuffle, no UDF, fully codegen'd. Each has an ANSI-SQL-expressible form
(used by the oracle queries in queries/extensions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker-word sets for the n-gram language heuristic. Deliberately tiny and
# deterministic: this is the SQL-expressible heuristic tier, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of"],
    "es": ["el", "la", "los", "de"],
    "de": ["der", "die", "das", "und"],
    "fr": ["le", "la", "les", "et"],
}


def _occurrences(text: Column, word: str) -> Column:
    """Count whole-word occurrences of ``word`` (token-boundary safe).

    Implemented as replace-and-measure rather than split-and-count: Spark's
    ``split`` drops trailing empty strings (Java semantics) while other
    engines keep them, so split-based counts are not portable. Non-overlapping
    left-to-right replace is identical everywhere.
    """
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("int")


def token_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + char stats per row.

    ``n_tokens`` uses the whitespace tokenizer; ``n_alpha_tokens`` counts
    tokens that are purely alphabetic (a BPE-ish pre-token proxy).
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "n_alpha_tokens": F.size(F.filter(toks, lambda t: t.rlike("^[A-Za-z]+$"))),
            "n_chars_obs": F.length(F.col(text_col)),
        }
    )


def language_id(df: DataFrame, text_col: str = "text", out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hit counts, 'und' when no
    markers hit. Ties break by language code order (deterministic)."""
    scores = [
        (lang, sum([_occurrences(F.col(text_col), w) for w in words[1:]],
                   _occurrences(F.col(text_col), words[0])))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # left fold with strict '>' => first language in code order wins ties
    expr_best = F.lit("und")
    expr_score = F.lit(0)
    for lang, score in scores:
        cond = score > expr_score
        expr_best = F.when(cond, F.lit(lang)).otherwise(expr_best)
        expr_score = F.when(cond, score).otherwise(expr_score)
    return df.withColumn(out_col, expr_best)


def quality_score(df: DataFrame, text_col: str = "text", out_col: str = "quality") -> DataFrame:
    """Deterministic quality features + a composite score in [0, 1].

    Features: length band, punctuation density, stopword ratio, mean token
    length — the standard cheap pre-filters of LLM-corpus pipelines.
    """
    text = F.col(text_col)
    toks = F.split(F.trim(text), r"\s+")
    n_toks = F.size(toks)
    n_chars = F.length(text)
    punct = F.length(F.regexp_replace(text, r"[^.!?,;:]", ""))
    stop_hits = sum(
        [_occurrences(text, w) for w in ("a", "and", "of")],
        _occurrences(text, "the"),
    )
    mean_tok_len = (n_chars - (n_toks - 1)) / F.greatest(n_toks, F.lit(1))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct / F.greatest(n_chars, F.lit(1)) * 10.0, F.lit(1.0))
    stop_score = F.least(stop_hits / F.greatest(n_toks, F.lit(1)) * 5.0, F.lit(1.0))
    tok_score = F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), 1.0).otherwise(0.5)
    return df.withColumns(
        {
            "n_tokens": n_toks,
            "punct_chars": punct,
            "stopword_hits": stop_hits,
            out_col: F.round(
                (len_score + punct_score + stop_score + tok_score) / 4.0, 4
            ),
        }
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Deterministic content fingerprint: md5 of whitespace-normalized,
    lower-cased text. Identical-content docs (modulo spacing/case) collide —
    the cheap first tier of the dedup cascade (exact tier N1)."""
    normalized = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return df.withColumn(out_col, F.md5(normalized))


# RE2-compatible (no lookaround) so the same patterns run on Spark (Java
# regex) and any RE2 engine a downstream oracle uses. Order matters: emails
# before bare digit runs, so 'a1@b.com' doesn't half-mask.
PII_PATTERNS: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    (r"(?:\+?\d{1,3}[-. ])?(?:\(\d{3}\) ?|\b\d{3}[-. ])\d{3}[-. ]\d{4}\b", "[PHONE]"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "[IP]"),
]


def redact_pii(
    df: DataFrame, cols: list[str], patterns: list[tuple[str, str]] | None = None
) -> DataFrame:
    """Mask emails / SSNs / phone numbers / IPs in the given string columns.

    A chain of ``regexp_replace`` projections — JVM-side, codegen'd, no
    shuffle; at 100 TB this runs at scan speed fused into whatever stage
    reads the text. Extend/replace ``patterns`` for locale-specific formats.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = {}
    for c in cols:
        col = F.col(c)
        for pattern, token in pats:
            col = F.regexp_replace(col, pattern, token)
        out[c + "_redacted"] = col
    return df.withColumns(out)
