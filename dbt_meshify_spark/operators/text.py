"""Text analysis operators (N4): token stats, language ID, quality scoring,
document fingerprinting.

All are single-pass projections built from built-in string/regexp functions —
no shuffle, no UDF, fully codegen'd. Each has an ANSI-SQL-expressible form
(used by the oracle queries in queries/extensions.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
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

# Separator-tolerant card-number candidate: maximal runs of >=2-digit
# groups split by ONE space or dash — '4111 1111 1111 1111',
# '4111-1111-1111-1111', mixed forms, and plain contiguous runs (a single
# group). Groups of >= 2 digits are required IN THE PATTERN, so a lone
# digit next to a real card ('qty 7 4539 1488 0343 6467') is never
# absorbed into (and never poisons) the candidate — real card formats
# group by >= 2 (4-4-4-4, 4-6-5, 4-4-4-4-3), and single-digit "groups"
# are bridges across unrelated adjacent numbers ('0 0 0 ...'). Total
# digit count is enforced post-hoc (13-19 after separator stripping):
# regex can't sum digits across variable groups, and the length filter
# also drops 20+-digit grouped runs whole rather than slicing a prefix.
# RE2-compatible: \b, (?:), unbounded repeat — no lookaround; Java regex
# and RE2 resolve the greedy matches identically (verified engine-side by
# the ext_pii_luhn_audit oracle). Letter-glued contiguous cards
# ('ID4539...') have no \b, so candidate extraction UNIONS this with
# maximal \d+ runs length-filtered to 13-19 (the round-7 tier).
CARD_CANDIDATE_PATTERN = r"\b\d{2,}(?:[ -]\d{2,})*\b"


def _group_windows(run: Column) -> Column:
    """All contiguous GROUP WINDOWS of a separator-grouped digit run,
    canonical-spaced, kept when their stripped length is 13-19 — the
    recovery tier for a valid card sharing one run with another number
    ('4539 1488 0343 6467 90210': the 21-digit run is no candidate, but
    its 4-group window IS the card). Bounded: windows span at most 9
    consecutive groups (>= 2 digits each, so 9 groups already reach 18+
    digits) — a G-group run yields <= 9G windows, a per-run constant,
    never corpus fan-out."""
    gr = F.split(run, "[ -]")
    return F.filter(
        F.flatten(
            F.transform(
                F.sequence(F.lit(1), F.size(gr)),
                lambda i: F.transform(
                    F.sequence(i, F.least(i + 8, F.size(gr))),
                    lambda j: F.concat_ws(" ", F.slice(gr, i, j - i + 1)),
                ),
            )
        ),
        lambda w: F.length(F.regexp_replace(w, " ", "")).between(13, 19),
    )


def _card_candidates(col: Column) -> Column:
    """Deduplicated, SORTED card candidates of ``col``, three tiers:

    1. \\b-bounded separator-grouped runs (:data:`CARD_CANDIDATE_PATTERN`)
       whose stripped length is 13-19;
    2. maximal contiguous digit runs of 13-19 digits (catches
       letter-glued cards like 'ID4539...' that have no word boundary);
    3. for OVERLONG grouped runs (stripped length > 19 — a card adjacent
       to another number in one run), every contiguous group window of
       13-19 stripped digits, canonical-spaced (:func:`_group_windows`) —
       downstream consumers treat candidate separators as
       interchangeable, so the canonical form masks the original text.

    Sorted because downstream folds (:func:`mask_luhn_cards`) apply
    candidates in list order — the sort pins one deterministic order that
    the DuckDB oracle can mirror (list_distinct does NOT preserve order
    while array_distinct does). Extractions and filters are
    engine-identical (Java regex / RE2); candidates are ASCII
    digits/space/dash, where both engines' default string orders agree."""
    runs = F.regexp_extract_all(col, F.lit(CARD_CANDIDATE_PATTERN), F.lit(0))
    grouped = F.filter(
        runs,
        lambda c: F.length(F.regexp_replace(c, "[ -]", "")).between(13, 19),
    )
    contiguous = F.filter(
        F.regexp_extract_all(col, F.lit(r"\d+"), F.lit(0)),
        lambda c: F.length(c).between(13, 19),
    )
    windows = F.flatten(
        F.transform(
            F.filter(
                runs,
                lambda c: F.length(F.regexp_replace(c, "[ -]", "")) > 19,
            ),
            _group_windows,
        )
    )
    return F.array_sort(
        F.array_distinct(F.concat(grouped, contiguous, windows))
    )


def _luhn_sum(rev: Column) -> Column:
    """Luhn checksum of a reversed digit string (bounded <=19-element HOF
    fold — per-candidate, not corpus-sized, so interpreted eval is fine)."""
    digit = lambda i: F.substring(rev, i, F.lit(1)).cast("int")  # noqa: E731
    return F.aggregate(
        F.sequence(F.lit(1), F.length(rev)),
        F.lit(0),
        lambda acc, i: acc
        + F.when(
            i % 2 == 0,
            F.when(digit(i) * 2 > 9, digit(i) * 2 - 9).otherwise(digit(i) * 2),
        ).otherwise(digit(i)),
    )


def mask_luhn_cards(col: Column, token: str = "[CARD]") -> Column:
    """Replace Luhn-VALID card-shaped runs (contiguous — even letter-glued
    — or space/dash grouped) with ``token``; checksum-invalid lookalikes
    (order ids, tracking numbers) are left untouched — the recall fix
    that pure-regex masking can't express. Per row: extract candidates
    (:func:`_card_candidates`), keep those whose separator-stripped
    digits pass Luhn, fold a DIGIT-BOUNDARY-anchored ``regexp_replace``
    over the survivors — ``(^|[^0-9])cand([^0-9]|$)`` — so a valid card's
    digits are never rewritten INSIDE a longer digit run that merely
    contains them (a literal replace would corrupt e.g. a 17-digit
    tracking number containing a 16-digit valid card as a substring).
    Candidates contain only digits/space/dash, so embedding them in the
    anchor pattern needs no regex escaping. All built-in expressions over
    a <=few-element candidate list, fused into the scan.
    """
    valid = F.filter(
        _card_candidates(col),
        lambda c: _luhn_sum(F.reverse(F.regexp_replace(c, "[ -]", ""))) % 10 == 0,
    )

    # the token goes into a Java REPLACEMENT string, where '\' and '$'
    # are group-reference syntax — escape them so a caller's 'US$' token
    # can't throw IllegalArgumentException (or silently re-insert groups)
    escaped = token.replace("\\", "\\\\").replace("$", "\\$")

    # trailing boundary as LOOKAHEAD so it is not consumed: back-to-back
    # occurrences separated by one char all match in a single pass (Java
    # regex; dynamic-pattern regexp_replace compiles per row, so one pass
    # instead of two halves the masking cost). The RE2 oracle can't use
    # lookahead and mirrors with a consuming ([^0-9]|$) applied TWICE —
    # pass 1 masks the odd occurrences of an adjacent chain, pass 2 the
    # rest, so both mechanisms reach the same fixpoint on every input.
    # Candidate separators generalize to the [ -] class in the pattern so
    # a canonical-spaced group-window candidate masks the dashed/mixed
    # original text (and tier-1 candidates mask exactly as before).
    def _mask(acc: Column, c: Column) -> Column:
        pat = F.concat(
            F.lit("(^|[^0-9])"),
            F.regexp_replace(c, "[ -]", "[ -]"),
            F.lit("(?=[^0-9]|$)"),
        )
        return F.regexp_replace(acc, pat, F.lit(f"$1{escaped}"))

    return F.aggregate(valid, col, _mask)


def redact_pii(
    df: DataFrame,
    cols: list[str],
    patterns: list[tuple[str, str]] | None = None,
    luhn_cards: bool = True,
) -> DataFrame:
    """Mask cards / emails / SSNs / phone numbers / IPs in the given string
    columns.

    Card masking runs FIRST and is Luhn-GATED (:func:`mask_luhn_cards`):
    only checksum-valid candidates become ``[CARD]``, so 16-digit order ids
    — even separator-grouped ones — never mass-redact. The remaining
    families are a chain of ``regexp_replace`` projections. Everything is
    JVM-side, codegen'd or bounded-HOF, no shuffle; at 100 TB this runs at
    scan speed fused into whatever stage reads the text. Extend/replace
    ``patterns`` for locale-specific formats; ``luhn_cards=False`` restores
    the pattern-only chain.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = {}
    for c in cols:
        col = mask_luhn_cards(F.col(c)) if luhn_cards else F.col(c)
        for pattern, token in pats:
            col = F.regexp_replace(col, pattern, token)
        out[c + "_redacted"] = col
    return df.withColumns(out)


def luhn_card_hits(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Credit-card PII detection with Luhn checksum VALIDATION — the
    precision tier above pattern masking: candidates are the UNION of
    \\b-bounded separator-grouped runs ('4111 1111 1111 1111' /
    '4111-1111-1111-1111' / mixed — the dominant real formats; grouped
    runs with single-digit groups are rejected as bridges across
    unrelated adjacent numbers) and maximal contiguous 13-19-digit runs
    (any surrounding context, so letter-glued 'ID4539...' still counts —
    the round-7 tier). Candidates are separator-stripped and only
    checksum-valid ones count, so order ids / tracking numbers /
    phone-ish digit runs don't read as card hits (~90% of arbitrary
    digit runs fail Luhn).

    Scale shape: extraction is a codegen regexp over the scan; the Luhn
    sum is a higher-order aggregate over a <=19-element sequence per
    candidate — interpreted, but bounded by the candidate length, not
    the document (the HOF-lambda rule concerns corpus-sized fan-out).
    One (id)-keyed count aggregate; docs without digit runs come back
    with zero counts via the left join on the id.

    Returns ``id_col, n_candidates, n_valid``. DISTINCT-candidate
    semantics: ``_card_candidates`` applies ``array_distinct``, so both
    counts enumerate distinct card-shaped runs per doc, not occurrences —
    a doc containing the same card number twice reports 1 hit. This is
    the masking-tier convention (the redaction pass rewrites every
    occurrence of each distinct candidate); an occurrence-weighted audit
    metric would drop the dedup and is intentionally NOT what this
    returns. The oracle mirrors the distinct semantics.
    """
    runs = (
        df.select(
            F.col(id_col),
            F.explode(_card_candidates(F.col(text_col))).alias("__run"),
        )
        # 13-19 digit bound already enforced inside _card_candidates on
        # both tiers — no re-filter needed here
        .withColumn("__digits", F.regexp_replace("__run", "[ -]", ""))
        .withColumn("__rev", F.reverse(F.col("__digits")))
    )
    counts = (
        runs.withColumn("__luhn", _luhn_sum(F.col("__rev")))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(
                F.when(F.col("__luhn") % 10 == 0, 1).otherwise(0)
            ).cast("bigint").alias("n_valid"),
        )
    )
    return (
        df.select(id_col)
        .join(counts, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_candidates", F.lit(0)).cast("bigint").alias(
                "n_candidates"
            ),
            F.coalesce("n_valid", F.lit(0)).cast("bigint").alias("n_valid"),
        )
    )


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_frac_threshold: float = 0.18,
    dup_frac_threshold: float = 0.30,
) -> DataFrame:
    """Gopher-style repetition quality signals per document.

    Emits, per doc: ``n_bigrams`` (occurrence count), ``top_bigram_count``
    (multiplicity of the most frequent word 2-gram), ``top_bigram_frac``
    (that multiplicity / total 2-grams — Gopher's "top n-gram fraction"
    family, 2-gram threshold 0.18 in the paper), ``dup_trigram_frac``
    (1 - distinct/total 3-grams — the "duplicate n-gram fraction" family),
    and ``is_repetitive`` (either threshold tripped).

    Scale design: trigram duplicate fraction is a pure array projection
    (size vs size-of-distinct — no shuffle at all). The top-bigram count
    needs a per-(doc, gram) multiplicity, done the distributed way: explode
    the non-distinct bigrams and aggregate twice — shuffle 1 on
    (id, gram), shuffle 2 on id, both map-side partial-aggregated and both
    on high-cardinality keys (no skew: a doc's grams land in one partition
    group only for that doc). The trigram columns are computed BEFORE the
    explode and ride the group-by keys (functionally dependent on id), so
    no re-join of the text is ever needed.
    """
    from dbt_meshify_spark.operators.dedup import _with_tokens, shingles_of_tokens

    staged = (
        _with_tokens(df.select(F.col(id_col), F.col(text_col)), text_col)
        .withColumn("__tri", shingles_of_tokens(F.col("__toks"), 3, distinct=False))
        .withColumn("__bi", shingles_of_tokens(F.col("__toks"), 2, distinct=False))
    )
    exploded = staged.select(
        F.col(id_col),
        F.size("__tri").cast("long").alias("n_tri"),
        F.size(F.array_distinct("__tri")).cast("long").alias("n_tri_d"),
        F.explode_outer("__bi").alias("gram"),
    )
    per_gram = exploded.groupBy(id_col, "n_tri", "n_tri_d", "gram").agg(
        F.count("gram").alias("c")
    )
    agg = per_gram.groupBy(id_col, "n_tri", "n_tri_d").agg(
        F.coalesce(F.max("c"), F.lit(0)).cast("long").alias("top_c"),
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("n_bi"),
    )
    top_frac = F.when(
        F.col("n_bi") > 0, F.col("top_c").cast("double") / F.col("n_bi")
    ).otherwise(F.lit(0.0))
    dup_frac = F.when(
        F.col("n_tri") > 0,
        F.lit(1.0) - F.col("n_tri_d").cast("double") / F.col("n_tri"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        F.col(id_col),
        F.col("n_bi").alias("n_bigrams"),
        F.col("top_c").alias("top_bigram_count"),
        F.round(top_frac, 4).alias("top_bigram_frac"),
        F.round(dup_frac, 4).alias("dup_trigram_frac"),
        (
            (top_frac >= F.lit(top_frac_threshold))
            | (dup_frac >= F.lit(dup_frac_threshold))
        ).alias("is_repetitive"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into overlapping fixed-token windows (RAG / context
    chunking). Chunk c covers tokens [c*stride, c*stride + chunk_tokens);
    the last chunk may be short; a doc shorter than one chunk yields itself.

    Pure projection + explode — no shuffle, no UDF: token array staged once,
    chunk starts from ``sequence``, each chunk re-joined with spaces. At
    100 TB this runs at scan speed; the output inherits the input
    partitioning (chunks of a doc stay co-located, which downstream
    embedding batching wants).

    Returns ``id_col, chunk_id, n_chunk_tokens, chunk_text``.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    staged = df.select(F.col(id_col), F.col(text_col)).withColumn("__toks", toks)
    n = F.size("__toks")
    # number of chunks: 1 + ceil(max(0, n - chunk_tokens) / stride)
    n_chunks = F.lit(1) + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunked = staged.withColumn(
        "chunk_id", F.explode(F.sequence(F.lit(0), n_chunks - F.lit(1)))
    )
    piece = F.slice(
        F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens
    )
    return chunked.select(
        F.col(id_col),
        F.col("chunk_id"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
) -> DataFrame:
    """Top-k terms per document by tf-idf (keyword extraction).

    ``tf`` = in-doc occurrences; ``idf = ln((N+1)/(df+1))`` (smoothed);
    ties break by term asc for determinism.

    Scale design: three aggregations, all partial-aggregated map-side —
    (1) term counts per (doc, term): shuffle on high-cardinality key;
    (2) document frequency per term: aggregates (1)'s output, NOT a second
    text pass, and ships (term, df) only;
    (3) the corpus size N is a scalar broadcast, not a driver collect —
    a 1-row count frame crossJoined in.
    The per-doc top-k window runs over (1)'s counts, already grouped.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    terms = (
        df.select(F.col(id_col), toks.alias("__toks"))
        .select(F.col(id_col), F.explode("__toks").alias("term"))
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(
        F.countDistinct(F.col(id_col)).cast("double").alias("__n")
    )
    scored = (
        tf.join(docfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.log((F.col("__n") + 1.0) / (F.col("df").cast("double") + 1.0)),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("tfidf").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("rank"),
            "term",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            F.round("tfidf", 4).alias("tfidf"),
        )
    )


def build_vocab(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Frequency-ranked vocabulary: ``term, term_id, count`` with id 1 = most
    frequent (ties broken by term asc); terms under ``min_count`` dropped
    (they become OOV id 0 at encode time).

    The corpus-wide term count is one combiner-friendly shuffle. The global
    rank then runs on the AGGREGATED vocab — bounded by distinct-term count
    (a few million even at 100 TB corpora), so the single-partition window
    sort is driver-scale-safe; never rank raw occurrences.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    counts = (
        df.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )
    w = Window.orderBy(F.col("count").desc(), F.col("term").asc())
    return counts.select(
        "term",
        F.row_number().over(w).cast("long").alias("term_id"),
        F.col("count").cast("long").alias("count"),
    )


def encode_docs(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents as token-id arrays using ``build_vocab``'s output
    (OOV terms -> 0). Returns ``id_col, n_tokens, token_ids``.

    Plan: posexplode positions, broadcast-join the vocab (vocabularies fit
    comfortably in a broadcast; the corpus side never shuffles on text),
    then reassemble per doc ordered by position — ``sort_array`` over
    (pos, id) structs, a deterministic rebuild that needs only the one
    groupBy-id shuffle of (pos, id) ints, not strings.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    exploded = df.select(F.col(id_col), toks.alias("__toks")).select(
        F.col(id_col), F.posexplode("__toks").alias("pos", "term")
    )
    joined = exploded.join(
        F.broadcast(vocab.select("term", "term_id")), "term", "left"
    ).select(
        F.col(id_col),
        F.struct(F.col("pos"), F.coalesce("term_id", F.lit(0)).alias("tid")).alias(
            "__pt"
        ),
    )
    return (
        joined.groupBy(id_col)
        .agg(F.sort_array(F.collect_list("__pt")).alias("__pts"))
        .select(
            F.col(id_col),
            F.size("__pts").cast("long").alias("n_tokens"),
            F.transform("__pts", lambda s: s["tid"]).alias("token_ids"),
        )
    )


def histogram(
    df: DataFrame,
    value_col: str,
    bucket_width: float,
    by: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram + CDF of ``value_col``, optionally per group.

    Returns ``*by, bucket, n, cdf`` where ``bucket = floor(v / width)`` and
    ``cdf`` is the cumulative row fraction at the bucket (1.0 at the last
    bucket of each group).

    Scale design: one shuffle on (by, bucket) with map-side combine reduces
    100 TB to at most a few thousand bucket rows; the CDF window then runs
    over that tiny aggregate, so the unbounded-frame window is cheap (never
    apply running windows to raw rows at scale — aggregate first).
    """
    from pyspark.sql import Window

    keys = list(by or [])
    bucket = F.floor(F.col(value_col) / F.lit(float(bucket_width))).cast("long")
    counts = (
        df.select(*keys, bucket.alias("bucket"))
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy(*keys) if keys else Window.partitionBy()
    cum = F.sum("n").over(w.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0))
    tot = F.sum("n").over(w)
    return counts.select(
        *keys,
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.round(cum.cast("double") / tot, 4).alias("cdf"),
    )


def normalize_text(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus cleaning pass (C4/RefinedWeb-style normalization tier):
    lowercase, strip control characters, collapse whitespace runs, trim.

    Pure chained ``regexp_replace`` projection — codegen'd, scan-speed, no
    shuffle, no UDF; at 100 TB this runs at parquet-read throughput and
    composes with any downstream dedup/quality operator (normalized text is
    the canonical form the hash-family dedup keys on).

    Output columns: every input column, plus ``text_norm`` and
    ``n_chars_norm``.
    """
    ctrl_stripped = F.regexp_replace(
        F.lower(F.col(text_col)), r"[\x00-\x1f\x7f]", " "
    )
    collapsed = F.trim(F.regexp_replace(ctrl_stripped, r"\s+", " "))
    return df.withColumn("text_norm", collapsed).withColumn(
        "n_chars_norm", F.length("text_norm").cast("long")
    )


def bm25_scores(
    df: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 relevance of every document against a bag of query terms —
    the lexical-retrieval baseline a RAG corpus pipeline scores with.

    ``idf = ln(1 + (N - df + 0.5)/(df + 0.5))`` (Lucene form, always
    positive); per-term ``tf*(k1+1) / (tf + k1*(1-b+b*dl/avgdl))``; document
    score is the sum over query terms.

    Scale design: the term explode is filtered to the query bag BEFORE the
    (doc, term) aggregation, so the only high-cardinality shuffle carries
    |docs|x|query| rows at most, never the full token stream. Document
    length is a ``size(split(...))`` projection computed in the same scan
    (no second text pass), and N/avgdl ride a 1-row broadcast crossJoin —
    no driver collect anywhere.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    base = df.select(F.col(id_col), toks.alias("__toks")).select(
        F.col(id_col), "__toks", F.size("__toks").cast("double").alias("dl")
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    tf = (
        base.select(F.col(id_col), "dl", F.explode("__toks").alias("term"))
        .filter(F.col("term").isin(list(query_terms)))
        .groupBy(id_col, "dl", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    docfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    denom = F.col("tf") + F.lit(k1) * (
        F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")
    )
    per_term = (
        tf.join(F.broadcast(docfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("score", idf * F.col("tf") * F.lit(k1 + 1.0) / denom)
    )
    return (
        per_term.groupBy(id_col)
        .agg(
            F.round(F.sum("score"), 4).alias("bm25"),
            F.count(F.lit(1)).cast("long").alias("n_matched_terms"),
        )
    )


def token_entropy(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Shannon entropy of each document's token distribution (nats) — the
    information-density quality signal (low entropy ⇒ repetitive/templated
    text; complements repetition_stats' fixed-gram fractions).

    ``H = ln(n) - Σ tf·ln(tf) / n`` over per-(doc, term) counts — one
    tokenize pass, one high-cardinality shuffle with map-side partial
    aggregation, then a per-doc aggregate of the already-grouped counts.
    Returns ``id_col, n_tokens, n_distinct_tokens, entropy``.
    """
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    return (
        tf.groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_distinct_tokens"),
            F.round(
                F.log(F.sum("tf"))
                - F.sum(F.col("tf") * F.log("tf")) / F.sum("tf"),
                4,
            ).alias("entropy"),
        )
    )


def token_pmi(
    df: DataFrame,
    top_k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Pointwise mutual information of token pairs over documents — the
    co-occurrence/collocation profile of a corpus (PMI > 0: tokens attract;
    < 0: repel), restricted to the ``top_k`` tokens by document frequency so
    the pair space is bounded at k(k-1)/2 regardless of corpus size.

    PMI(a,b) = ln( P(a,b) / (P(a) P(b)) ) with probabilities over documents.

    Scale shape: one DF-count shuffle, a TakeOrderedAndProject for the
    vocabulary cut, then the corpus re-scans ONCE with the tiny vocabulary
    broadcast — the per-doc self-join happens inside a bounded (<= k) token
    list per document, and the pair aggregate carries at most k^2 keys.
    N rides a 1-row broadcast crossJoin; no driver collect.
    """
    tok = (
        _with_doc_tokens(df, id_col, text_col)
        .select(F.col(id_col), F.explode(F.array_distinct(F.col("__toks"))).alias("token"))
    )
    dfreq = tok.groupBy("token").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    top = dfreq.orderBy(F.col("n_docs").desc(), F.col("token").asc()).limit(top_k)
    stats = df.agg(F.count(F.lit(1)).cast("double").alias("n_total"))
    sel = tok.join(F.broadcast(top.select("token")), "token")
    a = sel.select(F.col(id_col), F.col("token").alias("tok_a"))
    b = sel.select(F.col(id_col).alias("__idb"), F.col("token").alias("tok_b"))
    pair_counts = (
        a.join(b, (F.col(id_col) == F.col("__idb")) & (F.col("tok_a") < F.col("tok_b")))
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_ab"))
    )
    na = top.select(F.col("token").alias("tok_a"), F.col("n_docs").alias("n_a"))
    nb = top.select(F.col("token").alias("tok_b"), F.col("n_docs").alias("n_b"))
    return (
        pair_counts.join(F.broadcast(na), "tok_a")
        .join(F.broadcast(nb), "tok_b")
        .crossJoin(F.broadcast(stats))
        .select(
            "tok_a",
            "tok_b",
            "n_ab",
            "n_a",
            "n_b",
            (
                F.round(
                    F.log(
                        F.col("n_ab") * F.col("n_total")
                        / (F.col("n_a") * F.col("n_b"))
                    ),
                    4,
                )
                + F.lit(0.0)
            ).alias("pmi"),
        )
    )


def _with_doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __toks) with the standard lowercase/whitespace tokenization."""
    return df.select(
        F.col(id_col),
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+").alias("__toks"),
    )


def compression_ratio(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document zlib compression ratio — the classic cheap
    repetition/quality signal (boilerplate and degenerate text compress
    far below natural prose; high-entropy noise barely compresses).
    Returns ``id_col, n_bytes, n_compressed, compression_ratio``
    (compressed/raw — LOW means repetitive). NULL text yields NULL ratio.

    Arrow-batched ``mapInPandas`` (zlib is the one hot-path Python here —
    there is no JVM expression for it — and the per-batch loop is
    C-speed); one pass, no shuffle. Deterministic: fixed zlib level.
    """
    import zlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("n_compressed", T.LongType()),
            T.StructField("compression_ratio", T.DoubleType()),
        ]
    )

    def _ratio(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            ids, nb, nc, rr = [], [], [], []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                ids.append(did)
                if t is None:
                    nb.append(None); nc.append(None); rr.append(None)
                    continue
                raw = t.encode("utf-8")
                comp = zlib.compress(raw, 6)
                nb.append(len(raw))
                nc.append(len(comp))
                rr.append(round(len(comp) / len(raw), 4) if raw else None)
            yield pd.DataFrame(
                {id_col: ids, "n_bytes": nb, "n_compressed": nc,
                 "compression_ratio": rr}
            )

    from dbt_meshify_spark.operators.util import spread

    return spread(df.select(id_col, text_col)).mapInPandas(_ratio, out_schema)


def hashed_embedding(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dims: int = 32,
    out_col: str = "hvec",
) -> DataFrame:
    """Feature-hashed bag-of-words embedding (Weinberger et al. 2009): each
    token hashes to a dimension (md5 prefix mod ``dims``) with a +-1 sign
    (another digest bit), and the document vector is the signed count sum,
    L2-normalized — the model-free dense representation that lets the
    whole similarity plane (cosine top-k, LSH/IVF ANN, semantic dedup,
    PSI drift) run over raw text with no embedding model in the loop.

    Fully engine-replayable (md5 digit arithmetic, no RNG), so unlike
    learned embeddings this tier is oracle-checkable end to end. Plan:
    explode tokens -> one (id, dim) partial-agg shuffle -> per-doc array
    assembly via a dims-bounded pivot aggregate; no UDF, no lambda in the
    hot path. NULL/empty text yields the zero vector (normalized form:
    all zeros) so downstream joins stay total.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("__t"),
    )
    h = F.md5(F.col("__t"))
    dim = (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dims).cast("int")
    sign = F.when(F.substring(h, 9, 1) >= "8", F.lit(1.0)).otherwise(F.lit(-1.0))
    cells = (
        toks.select(F.col(id_col), dim.alias("__d"), sign.alias("__s"))
        .groupBy(id_col, "__d")
        .agg(F.sum("__s").alias("__v"))
    )
    vec = cells.groupBy(id_col).agg(
        F.array(
            *[
                F.coalesce(
                    F.sum(F.when(F.col("__d") == d, F.col("__v"))), F.lit(0.0)
                )
                for d in range(dims)
            ]
        ).alias("__raw")
    )
    norm = F.sqrt(
        F.aggregate("__raw", F.lit(0.0), lambda a, x: a + x * x)
    )
    unit = F.transform(
        "__raw", lambda x: F.when(norm > 0, x / norm).otherwise(F.lit(0.0))
    )
    out = vec.select(F.col(id_col), unit.alias(out_col))
    # docs with no tokens (NULL text) re-enter with the zero vector
    zeros = F.array(*[F.lit(0.0) for _ in range(dims)])
    return (
        df.select(id_col)
        .join(out, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col(out_col), zeros).alias(out_col),
        )
    )


def keyword_tag(
    df: DataFrame,
    taxonomy: dict[str, list[str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Multi-label keyword-taxonomy tagging via an inverted token join —
    the topic-labeling step dataset mixing and per-topic quotas need
    (mixture recipes operate on (lang, topic) cells; the topics have to
    come from somewhere).

    Plan choice vs :func:`language_id`'s scan form: the marker-scan
    (replace-and-measure per keyword) costs one full-text pass PER
    keyword — right for a dozen language markers, catastrophic for a
    10k-keyword production taxonomy. This operator explodes tokens ONCE
    and equi-joins a BROADCAST (topic, keyword) table: cost is one
    tokenize pass + one (doc, topic) map-side-combined aggregate,
    independent of taxonomy size. Counts are occurrence counts (a doc
    saying "table" five times scores 5 on its topic).

    Returns ``id_col, topic, n_hits`` for every (doc, topic) with at
    least one hit — multi-label by construction; take the per-doc argmax
    downstream if a single label is needed.
    """
    spark = df.sparkSession
    kw = spark.createDataFrame(
        [(t, w) for t, ws in sorted(taxonomy.items()) for w in sorted(set(ws))],
        "topic string, kw string",
    )
    toks = (
        df.select(F.col(id_col), F.col(text_col))
        .select(
            F.col(id_col),
            F.explode(F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("__t"),
        )
    )
    return (
        toks.join(F.broadcast(kw), toks["__t"] == kw["kw"])
        .groupBy(id_col, "topic")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hits"))
    )


def extract_html_text(
    df: DataFrame,
    html_col: str = "html",
    text_out: str = "text_extracted",
    title_out: str = "title",
) -> DataFrame:
    """HTML → text extraction (the web-crawl front door of a training-data
    pipeline: WARC payloads in, curated text out — the step every
    C4/RefinedWeb-style corpus runs before any quality or dedup pass).

    Rules, in order: drop ``<script>``/``<style>`` elements wholesale
    (their text is code, not prose), drop HTML comments, break block-level
    closers (``</p>``, ``</div>``, ``</li>``, headings, ``<br>``) to
    newlines so line-level cleaners (``c4_line_clean``) still see document
    structure, strip every remaining tag, decode the six common entities,
    collapse horizontal whitespace, and trim. ``title_out`` captures the
    ``<title>`` element separately (page titles are metadata, not body
    prose).

    Pure chained ``regexp_replace``/``regexp_extract`` projection —
    codegen'd, scan-speed, zero shuffle, no UDF: at 100 TB this runs at
    parquet-read throughput on the raw-HTML column and never materializes
    an intermediate DOM. (A tag-soup parser is strictly more faithful but
    is a per-row Python library call; the regex tier is the documented
    trade for staying JVM-side, and matches what C4 shipped.)
    """
    h = F.col(html_col)
    h = F.regexp_replace(h, r"(?is)<script\b[^>]*>.*?</script>", " ")
    h = F.regexp_replace(h, r"(?is)<style\b[^>]*>.*?</style>", " ")
    h = F.regexp_replace(h, r"(?s)<!--.*?-->", " ")
    title = F.trim(F.regexp_extract(F.col(html_col), r"(?is)<title[^>]*>(.*?)</title>", 1))
    h = F.regexp_replace(h, r"(?i)</(p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>|<br\s*/?>", "\n")
    h = F.regexp_replace(h, r"(?s)<[^>]+>", " ")
    # &amp; is decoded LAST (standard entity-decode rule): decoding it
    # first would double-decode escaped entities — "&amp;lt;" means the
    # five literal characters "&lt;", not "<".
    for ent, rep in (
        ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " "),
        ("&amp;", "&"),
    ):
        h = F.replace(h, F.lit(ent), F.lit(rep))
        title = F.replace(title, F.lit(ent), F.lit(rep))
    h = F.regexp_replace(h, r"[ \t\x0b\f\r]+", " ")
    h = F.regexp_replace(h, r" ?\n[ \n]*", "\n")
    h = F.regexp_replace(h, r"^\s+|\s+$", "")
    return df.withColumn(text_out, h).withColumn(title_out, title)


def script_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document Unicode script profile (multilingual corpus audit):
    character counts and ratios for Latin, Cyrillic, Han (CJK), Arabic,
    digits, and whitespace, plus the residual "other" mass.

    The lang-ID tier (``language_id``) names ONE language per document;
    the script profile is the complementary signal that catches mixed-
    script spam, mojibake, and wrong-encoding documents (e.g. a "Latin"
    doc that is 40% replacement characters), and routes documents to
    script-specific tokenizers.

    Counts are ``length(s) - length(regexp_replace(s, class, ''))``
    projections over Java Unicode script classes — six codegen'd regex
    passes over the scan, zero shuffle, no UDF, no explode: the cost is
    bounded by scan throughput at any corpus size.
    """
    s = F.col(text_col)
    total = F.length(s)

    def cnt(pattern: str) -> Column:
        return (total - F.length(F.regexp_replace(s, pattern, ""))).cast("long")

    out = df.withColumn("n_chars_total", total.cast("long"))
    classes = {
        "latin": r"[\p{IsLatin}]",
        "cyrillic": r"[\p{IsCyrillic}]",
        "han": r"[\p{IsHan}]",
        "arabic": r"[\p{IsArabic}]",
        "digit": r"[0-9]",
        "space": r"[\s]",
    }
    known = None
    for name, pat in classes.items():
        out = out.withColumn(f"n_{name}", cnt(pat))
        known = F.col(f"n_{name}") if known is None else known + F.col(f"n_{name}")
    out = out.withColumn("n_other", (F.col("n_chars_total") - known).cast("long"))
    for name in (*classes, "other"):
        out = out.withColumn(
            f"ratio_{name}",
            F.when(F.col("n_chars_total") > 0,
                   F.round(F.col(f"n_{name}") / F.col("n_chars_total"), 4))
            .otherwise(F.lit(0.0)),
        )
    return out


#: Query parameters stripped by URL canonicalization: click/campaign
#: trackers that vary per-impression while the landing content is
#: identical — the #1 cause of false "unique" URLs in crawl frontiers.
TRACKING_PARAMS_PATTERN = r"(?:utm_[^=&]*|gclid|fbclid|msclkid|ref|mc_eid)="


def canonicalize_url(
    df: DataFrame, url_col: str = "url", out_col: str = "url_canonical"
) -> DataFrame:
    """URL canonicalization for crawl dedup (the key-normalization step
    before URL-level exact dedup): two URLs that differ only in scheme
    case, ``www.``, default port, tracking parameters, fragment, or a
    trailing slash are the same fetch target and must collide.

    Rules: lowercase scheme and host; strip a leading ``www.``; strip
    explicit default ports ``:80``/``:443``; drop fragments; drop
    tracking query parameters (``TRACKING_PARAMS_PATTERN``) preserving
    the relative order of surviving params (no re-sort — param order is
    almost always insignificant but re-ordering can break signed URLs);
    strip one trailing slash from a non-root path; empty path → ``/``.

    Pure regexp projection (extract scheme/host/path/query separately,
    reassemble) — codegen'd, zero shuffle; pair it with ``exact_dedup`` on
    the canonical key. Malformed URLs (no ``scheme://``) pass through
    lowercased-host-best-effort: the canonical form of garbage is the
    garbage itself, so no rows are dropped.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host = F.lower(F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_extract(u, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, r"/$", "")
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(u, r"\?([^#]*)", 1)
    query = F.regexp_replace(query, r"(^|&)" + TRACKING_PARAMS_PATTERN + r"[^&]*", "$1")
    query = F.regexp_replace(query, r"&&+", "&")
    query = F.regexp_replace(query, r"^&|&$", "")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(query == "", F.lit("")).otherwise(F.concat(F.lit("?"), query)),
    )
    return df.withColumn(
        out_col, F.when(scheme == "", F.lower(u)).otherwise(canon)
    )


def conversation_stats(
    df: DataFrame, json_col: str = "conversation", id_col: str = "doc_id"
) -> DataFrame:
    """Instruction/chat-data validation (SFT corpus gate): parse a JSON
    conversation column (``[{"role": ..., "content": ...}, ...]``) and
    emit the structural facts a fine-tuning pipeline filters on — turn
    count, role alternation, who speaks first/last, content mass, and
    empty-turn defects.

    ``is_valid`` encodes the standard SFT contract: at least 2 turns,
    opens with ``user``, closes with ``assistant``, roles strictly
    alternate user/assistant, and no empty contents. Parse failures
    (``from_json`` → NULL) surface as ``n_turns = -1`` rows rather than
    vanishing — a curation gate must COUNT its rejects.

    All array work is ``from_json`` + higher-order functions over the
    per-row turn list (bounded: conversations are tens of turns, not
    millions) — no UDF, no explode, no shuffle; scan-speed at 100 TB.
    """
    turns = F.from_json(
        F.col(json_col), "array<struct<role:string,content:string>>"
    )
    roles = F.transform(turns, lambda t: t["role"])
    parsed = df.withColumn("__turns", turns)
    n = F.size("__turns")
    alternating = F.forall(
        F.zip_with(
            F.slice(roles, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(roles, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: a != b,
        ),
        lambda x: x,
    )
    roles_known = F.forall(roles, lambda r: r.isin("user", "assistant"))
    n_empty = F.size(
        F.filter("__turns", lambda t: F.length(F.trim(t["content"])) == 0)
    )
    total_chars = F.aggregate(
        "__turns", F.lit(0).cast("long"), lambda acc, t: acc + F.length(t["content"])
    )
    out = parsed.select(
        F.col(id_col),
        F.coalesce(n, F.lit(-1)).cast("long").alias("n_turns"),
        F.element_at(roles, 1).alias("first_role"),
        F.element_at(roles, -1).alias("last_role"),
        F.coalesce(total_chars, F.lit(0)).alias("total_chars"),
        F.coalesce(n_empty, F.lit(0)).cast("long").alias("n_empty_turns"),
        (
            (F.coalesce(n, F.lit(0)) >= 2)
            & (F.element_at(roles, 1) == "user")
            & (F.element_at(roles, -1) == "assistant")
            & F.coalesce(alternating, F.lit(False))
            & F.coalesce(roles_known, F.lit(False))
            & (F.coalesce(n_empty, F.lit(1)) == 0)
        ).alias("is_valid"),
    )
    return out


def preference_pair_stats(
    df: DataFrame, json_col: str = "preference", id_col: str = "doc_id"
) -> DataFrame:
    """Preference-data validation (DPO/RLHF corpus gate): parse a JSON
    ``{"prompt", "chosen", "rejected"}`` record and emit the structural
    facts a preference-tuning pipeline filters on — per-field lengths,
    the identical-pair defect (chosen == rejected carries zero preference
    signal), empty/missing fields, and the validity verdict.

    ``is_valid`` = parses, all three fields present and non-blank, and
    chosen differs from rejected. Parse failures surface as
    ``parsed = false`` rows — the gate counts its rejects. (Spark's
    ``from_json`` returns an all-null struct rather than NULL on
    malformed input, so ``parsed`` is defined as "at least one field
    materialized" — a fieldless-but-wellformed ``{}`` record is
    indistinguishable from garbage and gets the same reject verdict,
    which is the right call for a data gate either way.)

    Pure ``from_json`` + scalar projections: scan-speed, zero shuffle.
    """
    rec = F.from_json(
        F.col(json_col), "struct<prompt:string,chosen:string,rejected:string>"
    )
    out = df.withColumn("__r", rec)
    p, c, r = (F.col("__r")[f] for f in ("prompt", "chosen", "rejected"))
    blank = lambda x: x.isNull() | (F.length(F.trim(x)) == 0)  # noqa: E731
    n_blank = (
        blank(p).cast("int") + blank(c).cast("int") + blank(r).cast("int")
    )
    parsed = p.isNotNull() | c.isNotNull() | r.isNotNull()
    return out.select(
        F.col(id_col),
        parsed.alias("parsed"),
        F.coalesce(F.length(p), F.lit(-1)).cast("long").alias("prompt_chars"),
        F.coalesce(F.length(c), F.lit(-1)).cast("long").alias("chosen_chars"),
        F.coalesce(F.length(r), F.lit(-1)).cast("long").alias("rejected_chars"),
        F.coalesce(c == r, F.lit(False)).alias("identical_pair"),
        F.coalesce(n_blank, F.lit(3)).cast("long").alias("n_blank_fields"),
        (
            parsed
            & (F.coalesce(n_blank, F.lit(3)) == 0)
            & F.coalesce(c != r, F.lit(False))
        ).alias("is_valid"),
    )


def code_markup_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Code / markup detection profile (mixture routing: a "web text"
    corpus with undetected code inflates prose perplexity and starves the
    code mixture cell; markdown/LaTeX want markup-aware cleaning).

    Per-doc signals: line count, indented-line fraction (4-space/tab —
    the code-block signature), markdown-header fraction, code-symbol
    density (``{}();=<>[]``), fenced-block count (``` pairs), LaTeX
    command count (``\\word``). Verdicts ``is_code_like`` /
    ``is_markup_like`` threshold the ROUNDED ratios so the flags are
    reproducible across engines.

    Everything is ``regexp_count``/replace-and-measure over the raw text
    with ``(?m)`` line anchors — no split, no explode, no HOF: one
    codegen'd projection at scan speed, and line counting is immune to
    the engines' differing trailing-empty split semantics.
    """
    t = F.col(text_col)
    n_lines = (
        F.length(t) - F.length(F.replace(t, F.lit("\n"), F.lit(""))) + 1
    ).cast("long")
    indent_lines = F.regexp_count(t, F.lit(r"(?m)^(\t|    )")).cast("long")
    header_lines = F.regexp_count(t, F.lit(r"(?m)^#{1,6} ")).cast("long")
    sym_chars = (
        F.length(t) - F.length(F.regexp_replace(t, r"[{}();=<>\[\]]", ""))
    ).cast("long")
    n_fences = (
        (F.length(t) - F.length(F.replace(t, F.lit("```"), F.lit("")))) / 3
    ).cast("long")
    n_latex = F.regexp_count(t, F.lit(r"\\[a-zA-Z]+")).cast("long")
    out = df.withColumns(
        {
            "n_lines": n_lines,
            "indent_frac": F.round(indent_lines / n_lines, 4),
            "header_frac": F.round(header_lines / n_lines, 4),
            "sym_density": F.when(
                F.length(t) > 0, F.round(sym_chars / F.length(t), 4)
            ).otherwise(F.lit(0.0)),
            "n_fences": n_fences,
            "n_latex_cmds": n_latex,
        }
    )
    return out.withColumns(
        {
            "is_code_like": (F.col("sym_density") >= 0.02)
            | (F.col("indent_frac") >= 0.2)
            | (F.col("n_fences") >= 1),
            "is_markup_like": (F.col("header_frac") >= 0.1)
            | (F.col("n_latex_cmds") >= 2),
        }
    )


def turn_echo_scores(
    df: DataFrame,
    json_col: str = "conversation",
    id_col: str = "doc_id",
    n: int = 3,
    echo_threshold: float = 0.5,
) -> DataFrame:
    """Response-echo detection for chat data (the SFT defect where the
    assistant turn largely restates the preceding user turn — zero
    training signal, and a known failure mode of synthetic data
    generators): for each assistant turn, the fraction of its distinct
    word ``n``-grams already present in the user turn immediately before
    it; per conversation, the max over assistant turns.

    Returns every input row: ``id, n_scored_turns, max_echo, is_echo``
    (flag thresholds the ROUNDED max). Turns shorter than ``n`` tokens
    are unscorable and don't count; conversations with no scorable
    assistant turn report ``0, 0.0, false``.

    Spark-first shape: turns posexplode out of ``from_json``, grams stage
    as a real array column then explode to a ``(id, pos, gram)`` table —
    the overlap is ONE equi-join on ``(id, gram)`` with the
    adjacent-position predicate, and every aggregate is map-side
    combinable. No per-row set-intersection lambdas: the k-way gram
    fan-out lives on the explode + codegen-aggregate plan (the measured
    CSE rule from the dedup cascade), so the cost is two shuffles on
    high-cardinality keys regardless of corpus size.
    """
    from dbt_meshify_spark.operators.dedup import shingles_of_tokens

    turns = df.select(
        F.col(id_col),
        F.posexplode_outer(
            F.from_json(
                F.col(json_col), "array<struct<role:string,content:string>>"
            )
        ).alias("pos", "turn"),
    ).select(
        F.col(id_col),
        "pos",
        F.col("turn")["role"].alias("role"),
        F.split(F.trim(F.lower(F.col("turn")["content"])), r"\s+").alias("__toks"),
    )
    grams = (
        turns.withColumn("__grams", shingles_of_tokens(F.col("__toks"), n))
        .select(F.col(id_col), "pos", "role", F.explode("__grams").alias("gram"))
        .distinct()
    )
    asst = grams.filter(F.col("role") == "assistant").select(
        F.col(id_col), F.col("pos").alias("apos"), "gram"
    )
    user = grams.filter(F.col("role") == "user").select(
        F.col(id_col), F.col("pos").alias("upos"), "gram"
    )
    shared = (
        asst.join(user, [id_col, "gram"])
        .filter(F.col("upos") == F.col("apos") - 1)
        .groupBy(id_col, "apos")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    totals = asst.groupBy(id_col, "apos").agg(F.count(F.lit(1)).alias("n_grams"))
    per_turn = totals.join(shared, [id_col, "apos"], "left").select(
        F.col(id_col),
        (
            F.coalesce(F.col("n_shared"), F.lit(0)) / F.col("n_grams")
        ).alias("echo"),
    )
    per_doc = per_turn.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_scored_turns"),
        F.round(F.max("echo"), 4).alias("max_echo"),
    )
    return (
        df.select(F.col(id_col))
        .join(per_doc, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_scored_turns", F.lit(0)).cast("long").alias(
                "n_scored_turns"
            ),
            F.coalesce("max_echo", F.lit(0.0)).alias("max_echo"),
            (
                F.coalesce("max_echo", F.lit(0.0))
                >= F.lit(float(echo_threshold))
            ).alias("is_echo"),
        )
    )
