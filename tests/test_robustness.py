"""Nasty-input robustness: the driver corpus is clean ASCII word soup, but
a real 100 TB crawl has nulls, empty strings, unicode/emoji, whitespace
pathologies, and giant documents. Every text-family operator must survive
them without crashing and with sane outputs (no silent row loss beyond the
documented drops)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

NASTY = [
    (1, "plain ascii text with words"),
    (2, ""),
    (3, None),
    (4, "   \t\n  "),
    (5, "ünïcødé tëxt ανάλυση 数据处理 данные"),
    (6, "emoji 🎉🚀 mixed with text 🙂 and more"),
    (7, "a" * 5000),
    (8, ("token " * 3000).strip()),
    (9, "email me at a@b.co or call 555-123-4567 ssn 123-45-6789"),
    (10, "repeated repeated repeated repeated repeated repeated"),
    (11, "\x00control\x01chars\x02embedded"),
    (12, "ünïcødé tëxt ανάλυση 数据处理 данные"),  # dup of 5 for dedup paths
]


@pytest.fixture(scope="module")
def nasty(spark):
    return spark.createDataFrame(NASTY, "doc_id long, text string")


def test_text_pipeline_survives_nasty_input(spark, nasty):
    from dbt_meshify_spark.operators.text import (
        language_id,
        normalize_text,
        quality_score,
        token_stats,
    )

    out = quality_score(language_id(normalize_text(nasty, "text"), "text"))
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == len(NASTY)  # projections never drop rows
    for r in rows.values():
        assert r.quality is None or 0.0 <= r.quality <= 1.0
    stats = {r.doc_id: r for r in token_stats(nasty).collect()}
    assert stats[7].n_tokens == 1  # one giant token
    assert stats[8].n_tokens == 3000


def test_dedup_tiers_survive_nasty_input(spark, nasty):
    from dbt_meshify_spark.operators.dedup import (
        exact_dedup,
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
        simhash_md5_candidate_pairs,
    )

    clean = nasty.filter(F.col("text").isNotNull())
    assert exact_dedup(clean, ["text"], order_by=["doc_id"]).count() == len(NASTY) - 2

    # unicode dup pair must surface in every near-dup tier that can see it
    mh = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            clean, num_hashes=16, bands=8, min_jaccard_est=0.5
        ).collect()
    }
    assert (5, 12) in mh
    mh_md5 = {
        (r.id_a, r.id_b)
        for r in minhash_candidate_pairs(
            clean, num_hashes=16, bands=8, min_jaccard_est=0.5, hash_fn="md5"
        ).collect()
    }
    assert (5, 12) in mh_md5
    sh = {
        (r.id_a, r.id_b)
        for r in simhash_md5_candidate_pairs(clean).collect()
    }
    assert (5, 12) in sh
    nj = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(clean, min_jaccard=0.5).collect()
    }
    assert (5, 12) in nj


def test_chunking_and_pii_on_nasty_input(spark, nasty):
    from dbt_meshify_spark.operators.text import chunk_documents, redact_pii

    clean = nasty.filter(F.col("text").isNotNull())
    chunks = chunk_documents(clean, chunk_tokens=64, stride=48)
    # the 3000-token doc chunks; total chunks cover every doc with tokens
    per_doc = {
        r.doc_id: r.n
        for r in chunks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()
    }
    assert per_doc.get(8, 0) >= 3000 // 64  # stride 48 over 3000 tokens
    red = {r.doc_id: r.text_redacted for r in redact_pii(clean, ["text"]).collect()}
    assert "a@b.co" not in red[9]
    assert "123-45-6789" not in red[9]


def test_kn_lm_family_survives_nasty_input(spark, nasty):
    """All three KN tiers over nulls, empty strings, unicode, emoji, and
    giant docs: no crash, short/null docs excluded by the order's token
    floor, every emitted perplexity finite and positive, identical docs
    scored identically (5 and 12 are duplicates)."""
    import math

    from dbt_meshify_spark.operators.lm import (
        kn_fourgram_perplexity,
        kn_trigram_perplexity,
        mkn_trigram_perplexity,
    )

    for fn, min_toks in (
        (kn_trigram_perplexity, 3),
        (mkn_trigram_perplexity, 3),
        (kn_fourgram_perplexity, 4),
    ):
        out = {r.doc_id: r for r in fn(nasty).collect()}
        # null / empty / whitespace-only / 1-token docs never score
        for short_id in (2, 3, 4, 7):
            assert short_id not in out, (fn.__name__, short_id)
        assert 8 in out  # the 3000-token doc scores
        for r in out.values():
            assert r.ppl is not None and math.isfinite(r.ppl) and r.ppl > 0
        if 5 in out and 12 in out:
            assert out[5].ppl == out[12].ppl


def test_fuzzy_join_unicode_names(spark):
    from dbt_meshify_spark.operators.fuzzy import edit_distance_join

    left = spark.createDataFrame(
        [(1, "münchen straße"), (2, "東京スカイツリー"), (3, "plain name")],
        ["lid", "lname"],
    )
    right = spark.createDataFrame(
        [(10, "munchen strase"), (11, "東京スカイツリーX"), (12, "wholly other")],
        ["rid", "rname"],
    )
    got = {(r.lid, r.rid) for r in edit_distance_join(
        left, right, "lid", "lname", "rid", "rname", k=4
    ).collect()}
    assert (2, 11) in got  # one-char unicode append


def test_dedup_against_index_nasty_nulls_not_folded(spark, nasty):
    """NULL-text rows share a NULL fingerprint; the incremental exact tier
    must keep every one (they are not duplicates of each other) and must
    not crash on unicode/control/empty inputs."""
    from dbt_meshify_spark.operators.dedup import dedup_against_index

    nulls = spark.createDataFrame(
        [(100, None), (101, None)], "doc_id long, text string"
    )
    batch = nasty.unionByName(nulls)
    index = spark.createDataFrame(
        [(50, "ünïcødé tëxt ανάλυση 数据处理 данные")],  # matches doc 5 and 12
        "doc_id long, text string",
    )
    kept = {r.doc_id for r in dedup_against_index(batch, index).collect()}
    assert 100 in kept and 101 in kept  # nulls never fold
    assert 5 not in kept and 12 not in kept  # exact copies of indexed text drop
    assert 9 in kept and 11 in kept


def test_heuristics_survive_nasty_input(spark, nasty):
    from dbt_meshify_spark.operators.heuristics import c4_line_clean, gopher_rules

    out = gopher_rules(nasty).collect()
    assert len(out) == len(NASTY)  # no silent row loss
    by_id = {r["doc_id"]: r for r in out}
    # null text yields null verdicts (never a crash, never a spurious keep)
    assert by_id[3]["gopher_keep"] is None or by_id[3]["gopher_keep"] is False
    # a 3000-token plain doc passes the word-count gate
    assert by_id[8]["r_word_count"]
    # whitespace-only doc must not pass
    assert not by_id[4]["gopher_keep"]
    c4 = {r["doc_id"]: r for r in c4_line_clean(nasty).collect()}
    assert len(c4) == len(NASTY)
    assert c4[2]["n_lines_kept"] == 0

    # the cleaned text of a surviving multi-line doc contains no banned line
    multi = spark.createDataFrame(
        [(20, "Good sentence with enough words to keep here.\nbad { line }")],
        "doc_id long, text string",
    )
    r = c4_line_clean(multi).collect()[0]
    assert "{" not in r["text_clean"]


def test_snapshot_diff_and_budget_nasty(spark, nasty):
    from pyspark.sql import functions as F

    from dbt_meshify_spark.operators.sampling import select_to_token_budget
    from dbt_meshify_spark.operators.snapshots import snapshot_diff

    # snapshot diff where texts include nulls: null text fingerprints NULL;
    # a null-vs-null comparison must not report 'changed' spuriously
    d = snapshot_diff(nasty, nasty, include_unchanged=True).collect()
    assert len(d) == len(NASTY)
    st = {r["doc_id"]: r["status"] for r in d}
    # identical snapshots: nothing is added/removed; the null-text doc has a
    # NULL fingerprint on both sides (fp != fp is NULL -> 'unchanged')
    assert set(st.values()) == {"unchanged"}

    # token budget with null token counts must not crash or select nulls
    rows = [(1, 10, 5), (2, None, 3), (3, 5, 1)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long, score long")
    kept = select_to_token_budget(
        df, 100, order_by=[F.col("score").desc(), F.col("doc_id").asc()]
    ).collect()
    ids = {r["doc_id"] for r in kept}
    # the NULL-token doc must be EXCLUDED: the window sum would skip it and
    # ship an unknown-length doc into the budget at zero accounted cost
    assert ids == {1, 3}


def test_pca_and_weighted_sample_nasty(spark):
    import pytest as _pytest

    from dbt_meshify_spark.operators.pca import embedding_covariance, pca_project
    from dbt_meshify_spark.operators.sampling import weighted_sample_k

    # NULL embeddings are dropped from the basis, not crashed on
    rows = [(i, [float(i % 3), float(i % 5), 1.0]) for i in range(20)]
    rows += [(100, None), (101, None)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cov = embedding_covariance(df).collect()
    assert len(cov) == 9
    out = pca_project(df, k=2).collect()
    assert len(out) == 20  # null rows excluded from the projection too

    # empty / all-NULL input is a clear error, not an IndexError
    empty = spark.createDataFrame([(1, None)], "vec_id long, embedding array<double>")
    with _pytest.raises(Exception, match="no non-null embeddings"):
        pca_project(empty, k=2)

    # zero/negative/NULL weights are excluded from weighted sampling
    wdf = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -2.0), (4, None), (5, 1.0)],
        "id long, w double",
    )
    picked = {r["id"] for r in weighted_sample_k(wdf, 10, "w", ["id"]).collect()}
    assert picked == {1, 5}


def test_new_curation_ops_survive_nasty_input(spark, nasty):
    from dbt_meshify_spark.operators.dedup import (
        remove_self_repetition,
        remove_source_boilerplate,
        source_overlap,
    )
    from dbt_meshify_spark.operators.dsir import dsir_log_weights, dsir_resample_k

    # DSIR: every row scores (featureless/null docs at 0.0), draw works
    flagged = nasty.withColumn("is_target", F.col("doc_id") <= 6)
    scored = dsir_log_weights(flagged, "is_target", num_buckets=64)
    rows = {r["doc_id"]: r for r in scored.collect()}
    assert len(rows) == len(NASTY)
    # null text scores 0.0; the whitespace-only doc tokenizes to two empty
    # tokens (trim strips spaces, not \t\n — identical in DuckDB, so the
    # oracle agrees) and therefore carries one degenerate bigram
    assert rows[3]["dsir_logw"] == 0.0
    assert rows[4]["n_bigrams"] == 1
    picked = dsir_resample_k(scored, 5, ["doc_id"]).collect()
    assert len(picked) == 5

    # self-repetition: doc 10 ("repeated" x6) collapses, nulls survive
    cleaned = {r["doc_id"]: r for r in
               remove_self_repetition(nasty, passage_tokens=2).collect()}
    assert len(cleaned) == len(NASTY)
    assert cleaned[10]["n_tokens_removed"] > 0
    assert cleaned[3]["clean_text"] == "" and cleaned[3]["n_tokens_kept"] == 0
    assert cleaned[7]["n_tokens_removed"] == 0  # one giant token, no grams

    # source plane: synthesize sources over the nasty corpus
    sourced = nasty.withColumn(
        "source", F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd")
    )
    ov = source_overlap(sourced, shingle_size=2).collect()
    assert all(0.0 <= r["jaccard"] <= 1.0 for r in ov)
    rb = remove_source_boilerplate(
        sourced, passage_tokens=2, min_frac=0.9, min_docs=2
    ).collect()
    assert len(rb) == len(NASTY)  # removal never drops rows


def test_multimodal_survives_malformed_payloads(spark):
    from dbt_meshify_spark.operators.multimodal import (
        audio_neardup_pairs,
        image_dhash,
        image_neardup_pairs,
        sample_video_frames,
        video_neardup_pairs,
    )

    rows = [
        (1, bytearray(b"YUV4MPEG2 garbage header no newline")),
        (2, bytearray(b"YUV4MPEG2 W16 H16 F25:1 Ip A1:1 C420jpeg\nFRAME\nxx")),
        (3, bytearray(b"P6\n10 10\n255\nshort")),  # truncated PPM
        (4, bytearray(b"RIFFbadwav")),
        (5, bytearray(b"")),
        (6, None),
    ]
    media = spark.createDataFrame(rows, "media_id long, payload binary")
    # every fingerprint pass must complete; no batch-killing decode error
    hashes = {r["media_id"]: r["dhash"] for r in image_dhash(media).collect()}
    assert len(hashes) == len(rows) and hashes[6] is None
    frames = sample_video_frames(media).collect()
    assert all(f["media_id"] in {1, 2, 3, 4, 5} for f in frames)
    for pairs_fn in (image_neardup_pairs, audio_neardup_pairs, video_neardup_pairs):
        pairs_fn(media).collect()  # must not raise


def test_hash64_banding_caps_degenerate_buckets(spark):
    """A homogeneous corpus (1k identical fingerprints — blank frames,
    silence) collapses every row onto one (chunk, value) bucket per band;
    the windowed ``max_bucket_size`` cap must bound the candidate fan-out
    to O(cap^2 + overflow) instead of the quadratic C(1000,2)=499,500,
    while EVERY row still clusters: kept rows pair inside the prefix,
    overflow rows pair with the bucket representative (min id)."""
    from dbt_meshify_spark.operators.dedup import hash64_candidate_pairs

    df = spark.createDataFrame(
        [(i, 0xF234_5678_9ABC_DEF0 - 2**64) for i in range(1000)],
        "id long, h long",
    )
    capped = hash64_candidate_pairs(
        df, "id", "h", max_hamming=3, bands=4, max_bucket_size=50
    )
    rows = capped.collect()
    n = len(rows)
    # all 4 band buckets keep the SAME ordered id prefix, so kept pairs
    # dedup to C(50,2); each of the 950 overflow rows adds exactly one
    # (rep=0, id) pair — way below quadratic
    assert 0 < n <= 50 * 49 // 2 + 950
    # identical fingerprints all pair at hamming 0...
    assert all(r.hamming == 0 for r in rows)
    # ...and NO row is left as a singleton: every id reaches the rep's
    # component (the pre-round-6 cut dropped ids past the cap entirely)
    ids = {r.id_a for r in rows} | {r.id_b for r in rows}
    assert ids == set(range(1000))


def test_round4_text_operators_survive_nasty_input(spark, nasty):
    """Containment, winnowing, keyword tagging, and novelty must survive
    nulls/empties/unicode/giant docs without crashing, with sane outputs."""
    from dbt_meshify_spark.operators.dedup import (
        ngram_containment_pairs,
        winnow_overlap_pairs,
    )
    from dbt_meshify_spark.operators.snapshots import gram_novelty
    from dbt_meshify_spark.operators.text import keyword_tag

    clean = nasty.filter(F.col("text").isNotNull())
    # unicode dup pair (5, 12) shares all grams -> containment 1.0
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in ngram_containment_pairs(clean, min_containment=0.5).collect()
    }
    assert cont.get((5, 12)) == 1.0
    # winnowing: the dup pair shares every print; no crash on the giant doc
    wpairs = {
        (r.id_a, r.id_b)
        for r in winnow_overlap_pairs(clean, min_shared=1).collect()
    }
    assert (5, 12) in wpairs
    # keyword tagging over unicode/control-char text: no crash, only real hits
    tags = keyword_tag(clean, {"rep": ["repeated"], "greek": ["ανάλυση"]})
    got = {(r.doc_id, r.topic): r.n_hits for r in tags.collect()}
    assert got[(10, "rep")] == 6
    assert got[(5, "greek")] == 1 and got[(12, "greek")] == 1
    # novelty of the corpus against itself is 0 for every doc with grams
    nov = gram_novelty(clean, clean)
    assert {r.novelty for r in nov.collect()} == {0.0}


def test_web_front_door_survives_nasty_input(spark, nasty):
    from dbt_meshify_spark.operators.text import (
        canonicalize_url,
        code_markup_profile,
        conversation_stats,
        extract_html_text,
        preference_pair_stats,
        script_profile,
    )

    html = nasty.withColumnRenamed("text", "html")
    out = extract_html_text(html).collect()
    assert len(out) == len(NASTY)  # projection never drops rows

    prof = {r.doc_id: r for r in script_profile(nasty).collect()}
    assert len(prof) == len(NASTY)
    emoji = prof[6]  # emoji are 'other', never negative
    assert emoji.n_other > 0 and emoji.ratio_other > 0

    urls = nasty.withColumnRenamed("text", "url")
    canon = {r.doc_id: r.url_canonical for r in canonicalize_url(urls).collect()}
    assert len(canon) == len(NASTY) and canon[3] is None  # NULL passes through

    convs = nasty.withColumnRenamed("text", "conversation")
    cs = {r.doc_id: r for r in conversation_stats(convs).collect()}
    assert len(cs) == len(NASTY)
    assert all(not r.is_valid for r in cs.values())  # none parse as chats
    assert cs[5].n_turns == -1  # unicode garbage = counted reject

    prefs = nasty.withColumnRenamed("text", "preference")
    ps = preference_pair_stats(prefs).collect()
    assert len(ps) == len(NASTY) and not any(r.is_valid for r in ps)

    cmp_ = {r.doc_id: r for r in code_markup_profile(nasty).collect()}
    assert len(cmp_) == len(NASTY)
    assert cmp_[7].n_lines == 1 and cmp_[7].sym_density == 0.0  # 5k-char token


def test_substring_runs_survive_nasty_input(spark, nasty):
    """substring_run_pairs + the spans/cut composition over nulls, empty
    strings, unicode, giant docs: no crash; the repeated-token doc pair
    (5, 12) — identical 5-token unicode docs — is the only cross-doc
    >=5-token run; cut_spans_from_text keeps every input row."""
    from dbt_meshify_spark.operators.dedup import (
        cut_spans_from_text,
        substring_run_pairs,
        substring_runs_to_spans,
    )

    runs = substring_run_pairs(nasty, k=5, min_run_tokens=5).collect()
    assert {(r.id_a, r.id_b) for r in runs} == {(5, 12)}
    r = runs[0]
    assert (r.a_start, r.a_end, r.b_start, r.b_end) == (1, 6, 1, 6)
    spans = substring_runs_to_spans(
        substring_run_pairs(nasty, k=5, min_run_tokens=5)
    )
    out = cut_spans_from_text(nasty, spans)
    rows = {x.doc_id: x for x in out.collect()}
    assert len(rows) == len(NASTY)          # removal pass is total
    assert rows[12].n_tokens_removed == 5   # doc 12 loses its copy
    assert rows[5].n_tokens_removed == 0    # canonical keeps its copy
    assert rows[3].clean_text == "" and rows[3].n_tokens_kept == 0


def test_bpe_delimited_and_luhn_survive_nasty_input(spark, nasty):
    """apply_bpe_delimited drops only no-token docs (documented); Luhn
    audit zero-fills docs without digit runs and never crashes on
    nulls/unicode/control chars."""
    from dbt_meshify_spark.operators.bpe import (
        apply_bpe_delimited,
        train_bpe_distributed,
    )
    from dbt_meshify_spark.operators.text import luhn_card_hits

    merges = [
        (r.lhs, r.rhs)
        for r in train_bpe_distributed(nasty, n_merges=3).collect()
    ]
    enc = {r.doc_id: r for r in apply_bpe_delimited(nasty, merges).collect()}
    # docs 2 (empty), 3 (null), 4 (whitespace) have no words -> absent
    assert set(enc) == {1, 5, 6, 7, 8, 9, 10, 11, 12}
    assert enc[7].n_bpe_tokens >= 1
    luhn = {r.doc_id: (r.n_candidates, r.n_valid) for r in luhn_card_hits(nasty).collect()}
    assert len(luhn) == len(NASTY)
    assert all(v == (0, 0) for k, v in luhn.items())  # no 13-19 digit runs


def test_trigram_perplexity_survives_nasty_input(spark, nasty):
    """Docs with <3 tokens drop (documented); everything else scores a
    finite positive ppl, including unicode and the 3000-token doc."""
    import math

    from dbt_meshify_spark.operators.lm import trigram_perplexity

    out = {r.doc_id: r for r in trigram_perplexity(nasty).collect()}
    # 1,5..12 have >=3 tokens except 7 (one giant token) and 11 (one token)
    assert set(out) == {1, 5, 6, 8, 9, 10, 12}
    for r in out.values():
        assert r.ppl > 0 and math.isfinite(r.ppl)


def test_lm_and_unigram_degenerate_corpora(spark):
    """Degenerate inputs must not crash the new round-9 tiers: an empty
    corpus, docs below the order, a single repeated token (p = 1 paths,
    the -0.0 guard case), and non-ASCII text all produce sane (possibly
    empty) output on the MKN ladder and the unigram trainer/encoder."""
    from dbt_meshify_spark.operators.lm import mkn_ngram_perplexity
    from dbt_meshify_spark.operators.unigram import (
        train_unigram,
        unigram_encode_delimited,
    )

    schema = "doc_id long, text string"
    empty = spark.createDataFrame([], schema)
    assert mkn_ngram_perplexity(empty, 5).count() == 0
    assert train_unigram(empty).count() == 0
    assert unigram_encode_delimited(empty).count() == 0

    short = spark.createDataFrame([(1, "a b"), (2, "")], schema)
    assert mkn_ngram_perplexity(short, 5).count() == 0

    # single repeated token: every 5-gram identical, p == 1.0 exactly ->
    # avg_nll must canon to +0.0 (never the IEEE '-0.0' string)
    mono = spark.createDataFrame([(1, "a a a a a a a a")], schema)
    row = mkn_ngram_perplexity(mono, 5).collect()[0]
    assert str(row.avg_nll) == "0.0" and row.ppl == 1.0

    uni = spark.createDataFrame(
        [(1, "héllo wörld héllo"), (2, "日本語 テスト 日本語")], schema
    )
    vocab = {r.piece: r.freq for r in train_unigram(uni, min_count=1).collect()}
    assert vocab  # non-ASCII pieces survive
    enc = unigram_encode_delimited(uni, min_count=1)
    got = {r.doc_id: list(r.unigram_tokens) for r in enc.collect()}
    assert "".join(got[2]) == "日本語テスト日本語"


def test_sketches_survive_nasty_input(spark, nasty):
    """CMS and Bloom over the nasty corpus: null/empty/unicode/giant docs
    must not crash, the CMS overestimate invariant must hold on whatever
    tokens emerge, and Bloom must keep zero false negatives."""
    from dbt_meshify_spark.operators.dedup import tokens_col
    from dbt_meshify_spark.operators.sketches import (
        bloom_decontaminate,
        cms_estimate,
        cms_heavy_hitters,
        cms_sketch,
    )

    toks = nasty.filter(F.col("text").isNotNull()).select(
        F.explode(tokens_col(F.col("text"))).alias("token")
    )
    hh = cms_heavy_hitters(toks, "token", threshold_frac=0.0).collect()
    assert hh, "nasty corpus still has tokens"
    for r in hh:
        assert r.cms_est >= r.true_count
    sketch_rows = cms_sketch(toks, "token").collect()
    sketch = spark.createDataFrame(
        [(r.r, r.b, r.c) for r in sketch_rows], "r int, b bigint, c bigint"
    )
    truth = toks.groupBy("token").agg(F.count("*").cast("bigint").alias("true_count"))
    est = cms_estimate(truth, sketch, "token")
    assert est.filter(F.col("cms_est") < F.col("true_count")).count() == 0

    out = bloom_decontaminate(
        nasty.filter(F.col("doc_id") % 2 == 1),
        nasty.filter(F.col("doc_id") % 2 == 0),
    ).collect()
    for r in out:
        assert r.bloom_matched >= r.exact_matched, r
        assert r.false_pos >= 0


def test_privacy_ops_survive_degenerate_groups(spark):
    """k-anonymity with every group singleton (full suppression) and with
    one giant group (no suppression); bounded contribution with values
    outside [lo, hi] on both sides and one user holding everything."""
    from dbt_meshify_spark.operators.privacy import (
        bounded_contribution_agg,
        k_anonymity_report,
        suppress_small_groups,
    )

    singles = spark.createDataFrame(
        [(i, f"qi{i}", float(i)) for i in range(20)], "user_id long, qi string, value double"
    )
    assert suppress_small_groups(singles, ["qi"], "user_id", k=2).count() == 0
    one_group = singles.withColumn("qi", F.lit("same"))
    rep = k_anonymity_report(one_group, ["qi"], "user_id", k=5).collect()
    assert len(rep) == 1 and not rep[0].at_risk
    assert suppress_small_groups(one_group, ["qi"], "user_id", k=5).count() == 20

    import datetime

    rows = [
        (1, "t", datetime.datetime(2024, 1, 1, 0, 0, i), i, -50.0 + 40.0 * i)
        for i in range(15)
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp, event_id long, value double"
    )
    out = bounded_contribution_agg(
        df, ["event_type"], max_per_user=10, lo=0.0, hi=100.0
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_users == 1 and r.n_kept == 10 and r.n_capped == 5
    # clamp: first 10 values are -50..310 -> clamped 0..100; units exact
    vals = [max(0.0, min(100.0, -50.0 + 40.0 * i)) for i in range(10)]
    assert r.sum_units == sum(int(v * 100) for v in vals)
    assert r.max_user_units == r.sum_units <= 10 * 100 * 100


def test_zorder_survives_constant_and_null_dims(spark):
    """A constant dimension (span 0) must bucket to 0 everywhere and a
    null dim value must flow to a null file_id, not crash the grid."""
    from dbt_meshify_spark.sources.layout import zorder_file_stats

    rows = [(i, 7, (i if i % 5 else None)) for i in range(50)]
    df = spark.createDataFrame(rows, "a long, b long, c long")
    out = zorder_file_stats(df, ["b", "c"], bits=4, target_files=4).collect()
    by_fid = {r.file_id: r for r in out}
    # the 10 null-c rows must land in the null file_id group — present and
    # fully accounted for, not silently dropped
    assert None in by_fid and by_fid[None].n_rows == 10
    assert sum(r.n_rows for r in out) == 50
    # the non-null rows still partition into >= 2 files on the live dim
    assert len([f for f in by_fid if f is not None]) >= 2


def test_suppression_is_null_safe_on_qi_columns(spark):
    """A small group whose QI contains NULL must still be suppressed — a
    null-unsafe anti-join fails OPEN and releases exactly the rows it was
    told to drop (review finding, round 9)."""
    from dbt_meshify_spark.operators.privacy import suppress_small_groups

    rows = [
        (1, "click", None),
        (2, "click", None),           # 2-row NULL-day group: at risk
        *[(10 + i, "view", "d1") for i in range(8)],  # safe group
    ]
    df = spark.createDataFrame(rows, "user_id long, event_type string, day string")
    released = suppress_small_groups(df, ["event_type", "day"], "user_id", k=5)
    got = released.collect()
    assert all(r.day == "d1" for r in got), got
    assert len(got) == 8


def test_byte_bpe_survives_nasty_input(spark, nasty):
    """Byte-level train + encode over the nasty corpus: nulls/empties drop
    (no words), every surviving doc round-trips byte-exactly through
    unhex — control chars, emoji, CJK, and the 5000-char monster included."""
    from dbt_meshify_spark.operators.bpe import (
        apply_bpe_delimited,
        train_bpe_distributed,
    )

    merges_df = train_bpe_distributed(nasty, n_merges=3, alphabet="byte")
    merges = [(r.lhs, r.rhs) for r in merges_df.orderBy("merge_rank").collect()]
    enc = apply_bpe_delimited(nasty, merges, alphabet="byte").collect()
    texts = {r.doc_id: r.text for r in nasty.collect()}
    seen = set()
    for r in enc:
        seen.add(r.doc_id)
        words = texts[r.doc_id].lower().split()
        segs = "".join(r.bpe_tokens).split("</w>")
        decoded = [bytes.fromhex(x).decode("utf-8") for x in segs[:-1]]
        assert decoded == words, r.doc_id
    # only the no-word docs (empty/null/whitespace) are absent
    assert seen == {1, 5, 6, 7, 8, 9, 10, 11, 12}


def test_quantile_and_weighted_quantile_degenerate_inputs(spark):
    """Empty frames, single values, all-out-of-range values, and constant
    weights must produce sane reports (edge-bucket saturation, exact
    single-value quantiles) rather than crashes or empty-on-nonempty."""
    from dbt_meshify_spark.operators.sketches import (
        quantile_sketch_report,
        weighted_quantile_report,
    )

    empty = spark.createDataFrame([], "g string, v double")
    assert (
        quantile_sketch_report(empty, ["g"], "v", [0.5], 0.0, 8.0, 8).count()
        == 0
    )
    one = spark.createDataFrame([("a", 3.0)], "g string, v double")
    r = quantile_sketch_report(one, ["g"], "v", [0.5, 0.99], 0.0, 8.0, 8).collect()
    assert len(r) == 2 and all(x.true_q == 3.0 for x in r)
    # out-of-range values clamp into the edge buckets; the estimate
    # saturates at the grid edge but the exact audit is untouched
    oor = spark.createDataFrame(
        [("a", -5.0), ("a", 100.0), ("a", 200.0)], "g string, v double"
    )
    rr = quantile_sketch_report(oor, ["g"], "v", [0.5], 0.0, 8.0, 8).collect()[0]
    assert rr.true_q == 100.0 and 0.0 <= rr.est_q <= 8.0
    wempty = spark.createDataFrame([], "g string, v double, w long")
    assert (
        weighted_quantile_report(
            wempty, ["g"], "v", "w", [0.5], 0.0, 8.0, 8
        ).count()
        == 0
    )
    wz = spark.createDataFrame(
        [("a", 1.0, 0), ("a", 2.0, -3), ("a", 5.0, 7)], "g string, v double, w long"
    )
    wr = weighted_quantile_report(wz, ["g"], "v", "w", [0.5], 0.0, 8.0, 8).collect()
    assert len(wr) == 1 and wr[0].total_w == 7 and wr[0].true_q == 5.0


def test_dp_release_degenerate_groups(spark):
    """Single-event groups, all-null values, and a group whose key is NULL:
    the release never crashes, null-valued groups vanish (no rows survive
    the measurement filter), and a NULL group key still draws noise (its
    key string hashes via the empty concat_ws)."""
    from dbt_meshify_spark.operators.privacy import dp_release

    rows = [
        (1, "a", 1, 10.0),
        (2, "b", 2, None),
        (3, None, 3, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, event_id long, value double"
    ).withColumn("ts", F.to_timestamp(F.lit("2026-01-01 00:00:00")))
    out = {r.event_type: r for r in dp_release(df, ["event_type"]).collect()}
    assert set(out) == {"a", None}  # the all-null-value group b vanished
    for r in out.values():
        assert r.released_count >= 0 and r.released_sum_units >= 0
        assert r.released_count % 10 == 0
