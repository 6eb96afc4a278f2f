"""End-to-end corpus curation: every dropped document is accounted for,
planted junk/duplicates are removed, clean documents survive."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.curation import curate
from wing_binlog_go_spark.tables import read_table
from tests.streamwait import await_done


@pytest.fixture(scope="module")
def messy_corpus(spark, sf_small):
    base = read_table(spark, sf_small, "documents").limit(100)
    extra = spark.createDataFrame(
        [
            # too short (quality)
            (500001, "hi", "en", "srcX", 2),
            # all stopwords (quality: stop_ratio = 1.0)
            (500002, "the the a of in the a", "en", "srcX", 21),
            # disallowed language
            (500003, "perfectly fine text with plenty of words here", "xx", "srcX", 46),
            # exact duplicate pair (identical text)
            (500004, "unique sentence for exact duplicate checking purposes", "en", "srcX", 53),
            (500005, "unique sentence for exact duplicate checking purposes", "en", "srcX", 53),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return base.unionByName(extra)


def test_curation_accounting_and_removals(messy_corpus):
    curated, rep = curate(
        messy_corpus,
        min_tokens=5,
        max_stop_ratio=0.95,
        allowed_langs=["en", "de", "fr", "es", "zh"],
        near_dup_threshold=0.9,
    )
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    # planted junk removed at the right stages
    assert 500001 not in kept and 500002 not in kept  # quality
    assert 500003 not in kept                          # lang
    assert 500004 in kept and 500005 not in kept       # exact dup: min id wins
    # accounting: input = output + all drops
    assert rep.input_docs == (
        rep.output_docs
        + rep.dropped_quality
        + rep.dropped_lang
        + rep.dropped_exact_dup
        + rep.dropped_near_dup
    )
    assert rep.dropped_quality >= 2
    assert rep.dropped_lang >= 1
    assert rep.dropped_exact_dup >= 1
    assert len(rep.stages) == 4


def test_curation_clean_corpus_is_mostly_untouched(spark, sf_small):
    docs = read_table(spark, sf_small, "documents").limit(50)
    curated, rep = curate(docs, min_tokens=1, max_stop_ratio=1.0)
    # no quality/lang drops configured away; only dup stages may act
    assert rep.dropped_quality == 0 and rep.dropped_lang == 0
    assert rep.output_docs + rep.dropped_exact_dup + rep.dropped_near_dup == 50


def test_decontaminate_drops_planted_overlap(spark):
    """A training doc containing a benchmark 8-gram verbatim must be
    dropped; clean docs survive."""
    from wing_binlog_go_spark.functions.text import (
        contamination_overlap,
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            # contains the full benchmark 8-gram inside a longer doc
            (10, "prefix words alpha beta gamma delta epsilon zeta eta theta suffix"),
            # shares only a 4-gram → no 8-gram overlap
            (11, "alpha beta gamma delta something else entirely different here now"),
            (12, "completely unrelated text with no shared tokens at all whatsoever"),
        ],
        "doc_id long, text string",
    )
    overlap = contamination_overlap(docs, bench, k=8).collect()
    assert {(r.doc_id, r.bench_id) for r in overlap} == {(10, 1)}
    kept = sorted(r.doc_id for r in decontaminate(docs, bench, k=8).collect())
    assert kept == [11, 12]


def test_curation_with_benchmark_stage(spark, messy_corpus):
    """The optional decontamination stage drops docs overlapping the
    benchmark and accounts for them; totals still balance."""
    one = messy_corpus.filter(F.col("doc_id") == 0).collect()
    if not one:
        one = messy_corpus.limit(1).collect()
    bench = spark.createDataFrame(
        [(1, one[0].text)], "bench_id long, text string"
    )
    curated, rep = curate(
        messy_corpus,
        min_tokens=5,
        max_stop_ratio=0.95,
        allowed_langs=["en", "de", "fr", "es", "zh"],
        near_dup_threshold=0.9,
        benchmark=bench,
        benchmark_ngram=8,
    )
    assert rep.dropped_contaminated >= 1  # the source doc itself overlaps
    assert rep.output_docs == curated.count()
    assert rep.output_docs == (
        rep.input_docs
        - rep.dropped_quality
        - rep.dropped_lang
        - rep.dropped_exact_dup
        - rep.dropped_near_dup
        - rep.dropped_contaminated
    )
    survivor_ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert one[0].doc_id not in survivor_ids


def test_diversity_sample_caps_clusters_deterministically(spark, sf_small):
    from wing_binlog_go_spark.operators.similarity import diversity_sample

    emb = read_table(spark, sf_small, "embeddings")
    out1 = diversity_sample(emb, per_cluster=5, n_clusters=4)
    counts = {r._cluster: r.cnt for r in
              out1.groupBy("_cluster").agg(F.count("*").alias("cnt")).collect()}
    assert counts and all(c <= 5 for c in counts.values())
    # every non-empty cluster is represented (sampling caps, never empties)
    assert len(counts) >= 2
    # deterministic: same seed → identical sample
    ids1 = sorted(r.vec_id for r in out1.select("vec_id").collect())
    ids2 = sorted(
        r.vec_id
        for r in diversity_sample(emb, per_cluster=5, n_clusters=4)
        .select("vec_id")
        .collect()
    )
    assert ids1 == ids2


def test_pii_redaction_planted(spark):
    from wing_binlog_go_spark.functions.text import pii_counts, redact_pii

    docs = spark.createDataFrame(
        [
            (1, "contact me at alice.smith+work@example.co.uk for details"),
            (2, "server at 192.168.1.100 answered, call +1 (555) 123-4567 now"),
            (3, "no sensitive content in this perfectly ordinary sentence"),
        ],
        "doc_id long, text string",
    )
    counts = pii_counts("text")
    got = {
        r.doc_id: (r.email, r.phone, r.ipv4)
        for r in docs.select(
            "doc_id",
            counts["email"].alias("email"),
            counts["phone"].alias("phone"),
            counts["ipv4"].alias("ipv4"),
        ).collect()
    }
    assert got[1][0] == 1 and got[2][2] == 1 and got[2][1] >= 1
    assert got[3] == (0, 0, 0)
    red = {r.doc_id: r.red for r in docs.select("doc_id", redact_pii("text").alias("red")).collect()}
    assert "example.co.uk" not in red[1] and "[PII]" in red[1]
    assert "192.168.1.100" not in red[2] and "555" not in red[2]
    assert red[3] == "no sensitive content in this perfectly ordinary sentence"


def test_repetition_features_planted(spark):
    from wing_binlog_go_spark.functions.text import repetition_features

    docs = spark.createDataFrame(
        [
            (1, "buy now " * 20 + "limited offer"),            # template spam
            (2, "a perfectly ordinary varied sentence with many different words"),
            (3, "solo"),                                       # single token
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.distinct_token_ratio, r.top_bigram_frac)
        for r in repetition_features(docs).collect()
    }
    assert got[1][0] < 0.2 and got[1][1] > 0.4   # repeated bigram dominates
    assert got[2][0] == 1.0 and got[2][1] < 0.2  # all tokens distinct
    assert got[3][0] == 1.0                      # degenerate doc doesn't crash


def test_winnowing_guarantee_shared_substring_shares_fingerprint(spark):
    """Winnowing's coverage guarantee: two documents sharing a token run
    of length >= k + window - 1 (here 3+4-1=6) must share at least one
    fingerprint; and a doc is fully covered (every window contributes)."""
    from wing_binlog_go_spark.functions.text import winnowing_fingerprints

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens
    docs = spark.createDataFrame(
        [
            (1, f"one two three {shared} four five six"),
            (2, f"{shared} seven eight nine ten eleven twelve"),
            (3, "totally different words with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    rows = docs.select(
        "doc_id", winnowing_fingerprints("text", k=3, window=4).alias("fps")
    ).collect()
    fps = {r.doc_id: set(r.fps) for r in rows}
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # determinism: same input, same fingerprint set on recompute
    again = {
        r.doc_id: set(r.fps)
        for r in docs.select(
            "doc_id", winnowing_fingerprints("text", k=3, window=4).alias("fps")
        ).collect()
    }
    assert again == fps


def test_curation_boilerplate_stage_drops_template_docs(spark):
    """Docs that are mostly a shared template (high boilerplate ratio
    vs the corpus) are dropped when max_boiler_ratio is set; docs of
    unique content survive; accounting covers every drop."""
    template = "click here to subscribe to our newsletter and follow us"
    uniq = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten",
        "red orange yellow green blue indigo violet colors rainbow sky",
        "north south east west compass direction map travel journey road",
        "apple banana cherry date elderberry fig grape honeydew kiwi lemon",
        "table chair lamp sofa shelf cabinet rug curtain mirror clock",
    ]
    rows = [(i, t, "en", "src", len(t)) for i, t in enumerate(uniq)]
    # template-heavy docs: template + 2 unique words => ratio >> 0.5
    rows += [
        (100 + j, f"{template} filler{j} extra{j}", "en", "src", 70)
        for j in range(4)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    curated, rep = curate(
        docs, min_tokens=3, max_stop_ratio=0.99, max_boiler_ratio=0.5
    )
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    assert kept == set(range(len(uniq))), kept
    assert rep.dropped_boilerplate == 4
    assert rep.input_docs == rep.output_docs + rep.dropped_quality + (
        rep.dropped_lang
        + rep.dropped_boilerplate
        + rep.dropped_exact_dup
        + rep.dropped_near_dup
        + rep.dropped_contaminated
    )


def test_heavy_hitters_exactness_on_skewed_synthetic(spark):
    """Misra-Gries candidates must contain every true heavy hitter, and
    the recount phase must return EXACTLY the items a full GROUP BY +
    HAVING would — on a skewed distribution spread across partitions
    (the case where a per-partition count filter would miss globally
    heavy but locally thin items)."""
    from collections import Counter

    from wing_binlog_go_spark.functions.text import heavy_hitters

    # 5 heavy items (freq 120..200), 2000 singletons spread thin
    rows = []
    for h in range(5):
        rows += [f"hot{h}"] * (120 + 20 * h)
    rows += [f"cold{i}" for i in range(2000)]
    import random

    random.Random(7).shuffle(rows)
    df = spark.createDataFrame([(w,) for w in rows], "w string").repartition(16)
    k = 25  # threshold = n/k = ~112
    got = {r.item: r.freq for r in heavy_hitters(df, "w", k=k).collect()}
    counts = Counter(rows)
    n = len(rows)
    expect = {w: c for w, c in counts.items() if c > n / k}
    assert got == expect and got, got


def _span_removal_model(texts: dict[int, str], k: int) -> dict[int, tuple[int, int, str]]:
    """Independent sequential reference for duplicate_span_removal:
    rank every k-token span occurrence by (doc_id, start), mark the
    covered positions of every rank≥2 occurrence of a repeated span,
    rebuild from surviving tokens."""
    toks = {d: t.lower().split(" ") for d, t in texts.items()}
    occs: dict[str, list[tuple[int, int]]] = {}
    for d in sorted(toks):
        t = toks[d]
        for p in range(len(t) - k + 1):
            occs.setdefault(" ".join(t[p : p + k]), []).append((d, p))
    removed: dict[int, set[int]] = {d: set() for d in toks}
    for gram, lst in occs.items():
        for d, p in sorted(lst)[1:]:
            removed[d].update(range(p, p + k))
    out = {}
    for d, t in toks.items():
        kept = [w for i, w in enumerate(t) if i not in removed[d]]
        out[d] = (len(t), len(t) - len(kept), " ".join(kept))
    return out


def test_duplicate_span_removal_matches_model(spark):
    """Hand corpus with planted repeats: a license banner shared by two
    docs, an in-doc repeated phrase, and a doc shorter than k. The Spark
    result must equal the sequential reference model row-for-row."""
    from wing_binlog_go_spark.functions.text import duplicate_span_removal

    texts = {
        1: "all rights reserved worldwide the quick brown fox jumps over lazy dogs",
        2: "intro text here all rights reserved worldwide and more unique content",
        3: "spam spam spam spam spam spam eggs",
        4: "too short",
        5: "completely unrelated sentence with fresh vocabulary throughout today",
    }
    df = spark.createDataFrame([(d, t) for d, t in texts.items()], ["doc_id", "text"])
    for k in (3, 5):
        got = {
            r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
            for r in duplicate_span_removal(df, k=k).collect()
        }
        assert got == _span_removal_model(texts, k), f"k={k}"


def test_duplicate_span_removal_matches_model_on_corpus(spark, sf_small):
    """Same equivalence on the real sf0.001 documents table (500 docs):
    the distributed plan and the sequential model agree exactly."""
    from wing_binlog_go_spark.functions.text import duplicate_span_removal
    from wing_binlog_go_spark.tables import read_table

    docs = read_table(spark, sf_small, "documents").filter(F.col("doc_id") < 150)
    texts = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = {
        r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
        for r in duplicate_span_removal(docs, k=4).collect()
    }
    assert got == _span_removal_model(texts, 4)


def test_duplicate_span_removal_fully_deleted_doc(spark):
    """A doc that is one big repeat of another doc's content must come
    back as clean_text '' with n_removed == n_tokens, not vanish."""
    from wing_binlog_go_spark.functions.text import duplicate_span_removal

    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f")], ["doc_id", "text"]
    )
    rows = {r.doc_id: r for r in duplicate_span_removal(df, k=3).collect()}
    assert rows[1].n_removed == 0 and rows[1].clean_text == "a b c d e f"
    assert rows[2].n_removed == 6 and rows[2].clean_text == ""


def test_curation_span_dedup_stage_rewrites_shared_banner(spark):
    """curate(span_dedup_k=...): docs sharing a license banner keep it
    only in the first survivor; accounting reports removed tokens and
    no documents are dropped by the rewrite stage itself."""
    from wing_binlog_go_spark.functions.curation import curate

    banner = "copyright notice all rights reserved by the original author"
    rows = [
        (1, f"{banner} first document body about completely real things", "en"),
        (2, f"second document body with different prose here {banner}", "en"),
        (3, "an unrelated third document with no shared material at all", "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out, rep = curate(
        docs, min_tokens=2, near_dup_threshold=0.99, span_dedup_k=4
    )
    texts = {r.doc_id: r.text for r in out.collect()}
    assert set(texts) == {1, 2, 3}
    assert banner in texts[1]              # canonical occurrence kept
    assert banner not in texts[2]          # later occurrence deleted
    assert "different prose" in texts[2]   # the rest of doc 2 survives
    assert texts[3] == rows[2][1]          # untouched doc is intact
    assert rep.removed_span_tokens >= len(banner.split())
    assert any(s.startswith("span-dedup") for s in rep.stages)


def test_curation_semantic_stage_drops_paraphrase_twins(spark, sf_small):
    """The optional SemDeDup stage: two docs with DIFFERENT text but
    near-identical embeddings (a paraphrase pair the lexical stages
    cannot catch) collapse to the min id; docs without an embedding
    pass through untouched; accounting still balances."""
    import numpy as np

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy sleeping dog today", "en", "s", 59),
            (2, "a swift russet fox leaps above the idle hound this morning", "en", "s", 58),
            (3, "columnar storage engines prune unread pages during scans", "en", "s", 56),
            (4, "no embedding for this one but plenty of words to keep it", "en", "s", 56),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    rng = np.random.RandomState(6)
    v1 = rng.normal(0, 1, 16)
    v2 = v1 + rng.normal(0, 1e-4, 16)  # paraphrase twin: cos ~ 1
    v3 = rng.normal(0, 1, 16)
    emb = spark.createDataFrame(
        [
            (1, [float(x) for x in v1]),
            (2, [float(x) for x in v2]),
            (3, [float(x) for x in v3]),
        ],
        ["vec_id", "embedding"],
    )
    curated, rep = curate(
        docs,
        min_tokens=3,
        near_dup_threshold=0.9,
        embeddings=emb,
        semantic_threshold=0.97,
        semantic_clusters=2,
    )
    kept = {r.doc_id for r in curated.select("doc_id").collect()}
    assert kept == {1, 3, 4}          # 2 dropped as semantic twin of 1
    assert rep.dropped_semantic == 1
    assert any(s.startswith("semantic-dup") for s in rep.stages)
    assert rep.input_docs == (
        rep.output_docs + rep.dropped_quality + rep.dropped_lang
        + rep.dropped_exact_dup + rep.dropped_near_dup + rep.dropped_semantic
    )


def test_bloom_decontamination_equals_exact_overlap(spark, sf_small):
    """q39z must return EXACTLY contamination_overlap's output — blooms
    have no false negatives, and the verify join removes the false
    positives. Forced-FP regime: a deliberately tiny bloom (m=256 bits,
    heavily saturated) must still produce the exact answer."""
    from wing_binlog_go_spark.functions.text import (
        bloom_contamination_overlap,
        contamination_overlap,
    )

    docs = read_table(spark, sf_small, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).withColumnRenamed(
        "doc_id", "bench_id"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    want = {
        (r.doc_id, r.bench_id, r.overlapping_ngrams)
        for r in contamination_overlap(corpus, bench, k=5).collect()
    }
    assert want, "fixture must contain overlap"
    for m_bits in (1 << 20, 256):
        got = {
            (r.doc_id, r.bench_id, r.overlapping_ngrams)
            for r in bloom_contamination_overlap(
                corpus, bench, k=5, m_bits=m_bits
            ).collect()
        }
        assert got == want, m_bits


def test_bloom_prefilter_actually_prunes(spark, sf_small):
    """At the default sizing the bloom must pass only a small fraction
    of corpus shingles into the verify join (the scale claim: the
    shuffle sees survivors, not the corpus)."""
    import numpy as np
    import pandas as pd

    from wing_binlog_go_spark.functions.text import (
        _bloom_positions,
        word_shingles,
    )

    docs = read_table(spark, sf_small, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    m_bits, n_hashes, n_bytes = 1 << 20, 5, (1 << 20) // 8

    bench_sh = bench.select(F.explode(word_shingles("text", 5)).alias("s")).distinct()
    pos = bench_sh.select(
        F.explode(_bloom_positions(F.col("s"), m_bits, n_hashes)).alias("pos")
    ).collect()
    bloom = np.zeros(n_bytes, dtype=np.uint8)
    p = np.array([r.pos for r in pos], dtype=np.int64)
    np.bitwise_or.at(bloom, p >> 3, (1 << (p & 7)).astype(np.uint8))

    corpus_sh = corpus.select(F.explode(word_shingles("text", 5)).alias("s"))
    total = corpus_sh.count()
    hits = corpus_sh.select(
        _bloom_positions(F.col("s"), m_bits, n_hashes).alias("ps")
    ).toPandas()

    def chk(arr):
        a = np.asarray(arr, dtype=np.int64)
        return bool(np.all(bloom[a >> 3] & (1 << (a & 7)).astype(np.uint8)))

    passed = int(hits["ps"].map(chk).sum())
    assert passed < total / 4, (passed, total)


def test_gopher_rules_fire_individually(spark):
    """Each Gopher rule must be falsifiable on a targeted doc: too
    short, mean word length out of bounds, symbol-heavy, non-alpha,
    stopword-free — and a prose-like doc passes all."""
    from wing_binlog_go_spark.functions.text import gopher_quality_flags

    prose = "the quick brown fox jumps over that lazy dog " * 7  # 63 words
    docs = spark.createDataFrame(
        [
            (1, prose.strip()),
            (2, "the of and"),  # < min_words
            (3, ("a b c d " * 20).strip() + " the"),  # mean word len < 3
            (4, ("supercalifragilistic " * 60).strip() + " the"),  # len > 10
            (5, ("lorem#tag ipsum... " * 30).strip() + " the"),  # symbols
            (6, ("1234 5678 " * 30).strip() + " the and"),  # non-alpha
            (7, ("lorem ipsum dolor sit amet " * 12).strip()),  # no stopwords
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_quality_flags(docs).collect()}
    assert out[1].keep, out[1]
    for d in (2, 3, 4, 5, 6, 7):
        assert not out[d].keep, out[d]
    # the failing rule is visible in the feature columns
    assert out[2].n_words < 50
    assert out[3].mean_word_len < 3.0 and out[4].mean_word_len > 10.0
    assert out[5].symbol_ratio > 0.1
    assert out[6].alpha_ratio < 0.8
    assert out[7].stop_hits < 2


def test_bloom_decontaminate_equals_exact_decontaminate(spark, sf_small):
    """The drop variant: surviving doc ids through the bloom path must
    equal the exact path's, including under a saturated tiny bloom."""
    from wing_binlog_go_spark.functions.text import (
        bloom_decontaminate,
        decontaminate,
    )

    docs = read_table(spark, sf_small, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0).withColumnRenamed(
        "doc_id", "bench_id"
    )
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    want = {r.doc_id for r in decontaminate(corpus, bench, k=5).collect()}
    assert want and len(want) < corpus.count()
    for m_bits in (1 << 20, 256):
        got = {
            r.doc_id
            for r in bloom_decontaminate(
                corpus, bench, k=5, m_bits=m_bits
            ).collect()
        }
        assert got == want, m_bits


def test_normalize_text_canonicalizes_whitespace_and_controls(spark):
    """Byte-level noise (CRLF, tabs, control chars, doubled spaces,
    case) must normalize away so exact dedup converges on the
    canonical form."""
    from wing_binlog_go_spark.functions.text import normalize_text

    docs = spark.createDataFrame(
        [
            (1, "Hello   World"),
            (2, "hello\r\nworld"),
            (3, "\tHELLO world \x07"),
            (4, "different text"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n for r in docs.select("doc_id", normalize_text("text").alias("n")).collect()}
    assert out[1] == out[2] == out[3] == "hello world"
    assert out[4] == "different text"


def test_perplexity_bucket_mix_is_per_language_and_drops_tail(spark, sf_small):
    """q145: each language tiles independently (rarer languages keep
    their head instead of being emptied by a global cut), the tail
    tier is gone, kept
    fractions per language ≈ 2/3, and gibberish lands in the dropped
    tier."""
    from wing_binlog_go_spark.functions.text import (
        bigram_lm_scores,
        perplexity_bucket_mix,
    )

    docs = read_table(spark, sf_small, "documents")
    kept = perplexity_bucket_mix(docs).collect()
    langs_all = {r.lang for r in docs.select("lang").distinct().collect()}
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, []).append(r)
    assert set(by_lang) == langs_all  # every language survives
    assert {r.bucket for r in kept} <= {1, 2}
    scored_n = (
        bigram_lm_scores(docs)
        .join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .count()
        .collect()
    )
    totals = {r.lang: r["count"] for r in scored_n}
    for lang, rows in by_lang.items():
        frac = len(rows) / totals[lang]
        assert 0.6 <= frac <= 0.72, (lang, frac)  # ≈ 2/3 with tile rounding
    # the dropped tier contains the per-language WORST nll docs
    worst = max(
        bigram_lm_scores(docs).join(docs.select("doc_id", "lang"), "doc_id")
        .filter(F.col("lang") == sorted(langs_all)[0])
        .collect(),
        key=lambda r: (r.nll, r.doc_id),
    )
    assert worst.doc_id not in {r.doc_id for r in kept}


def test_incremental_novelty_matches_batch_and_replays(spark, sf_small, tmp_path):
    """incremental_novelty_apply over id-ordered batches must equal
    ngram_novelty on the cumulative corpus; replays are id-no-ops; a
    crash between the shingle append and the novelty write reconverges
    (the doc's own attribution rides in the shingle store)."""
    from pyspark.sql import functions as F

    from wing_binlog_go_spark.functions.text import (
        incremental_novelty_apply,
        ngram_novelty,
    )
    from wing_binlog_go_spark.tables import read_table

    docs = read_table(spark, sf_small, "documents").filter(F.col("doc_id") < 200)
    b1 = docs.filter(F.col("doc_id") < 100)
    b2 = docs.filter(F.col("doc_id") >= 100)
    store = str(tmp_path / "nov")

    r1, st1 = incremental_novelty_apply(spark, b1, store, k=3)
    assert st1 == {"batch": 100, "replayed": 0, "appended": 100}
    r2, st2 = incremental_novelty_apply(spark, b2, store, k=3)
    assert st2 == {"batch": 100, "replayed": 0, "appended": 100}

    got = {
        (r.doc_id, r.n_shingles, r.n_novel, r.novelty)
        for r in r1.collect() + r2.collect()
    }
    want = {
        (r.doc_id, r.n_shingles, r.n_novel, r.novelty)
        for r in ngram_novelty(docs, k=3).collect()
    }
    assert got == want

    # replay: no new rows, store unchanged
    r2r, st2r = incremental_novelty_apply(spark, b2, store, k=3)
    assert st2r == {"batch": 100, "replayed": 100, "appended": 0}
    assert r2r.count() == 0
    assert spark.read.parquet(store + "/novelty").count() == 200

    # crash sim: shingles appended for a new batch but novelty write
    # lost → wipe the batch's novelty rows and re-apply; scores for the
    # crashed batch must still match the batch operator (own-id
    # attribution makes the replayed docs' shingles count as novel)
    b3 = read_table(spark, sf_small, "documents").filter(
        (F.col("doc_id") >= 200) & (F.col("doc_id") < 260)
    )
    r3, _ = incremental_novelty_apply(spark, b3, store, k=3)
    want3 = {(r.doc_id, r.novelty) for r in r3.collect()}
    import shutil

    # drop novelty rows of batch 3 (simulate the novelty write lost;
    # the shingle append survived)
    kept = spark.read.parquet(store + "/novelty").filter(
        F.col("doc_id") < 200
    ).localCheckpoint(eager=True)
    shutil.rmtree(store + "/novelty")
    kept.write.parquet(store + "/novelty")
    r3b, st3b = incremental_novelty_apply(spark, b3, store, k=3)
    assert st3b["appended"] == 60
    assert {(r.doc_id, r.novelty) for r in r3b.collect()} == want3


def test_incremental_novelty_out_of_order_no_double_credit(spark, tmp_path):
    """Regression (r7 advice): a LATER-arriving doc with a SMALLER id
    must not be credited a shingle history already owns — attribution
    is arrival order, and the old least(batch_first, hist_first) form
    counted such a shingle as novel for both arrivals."""
    from wing_binlog_go_spark.functions.text import incremental_novelty_apply

    store = str(tmp_path / "nov")
    # doc 10 arrives first and owns every shingle of "red fox jumps".
    b1 = spark.createDataFrame([(10, "red fox jumps")], ["doc_id", "text"])
    r1, _ = incremental_novelty_apply(spark, b1, store, k=3)
    assert {(r.doc_id, r.n_novel) for r in r1.collect()} == {(10, 1)}

    # doc 5 arrives SECOND with the same text: out-of-order id. Arrival
    # order says nothing about it is novel.
    b2 = spark.createDataFrame([(5, "red fox jumps")], ["doc_id", "text"])
    r2, _ = incremental_novelty_apply(spark, b2, store, k=3)
    assert {(r.doc_id, r.n_novel, r.novelty) for r in r2.collect()} == {
        (5, 0, 0.0)
    }
    # and the store still attributes the shingle to doc 10 (one owner,
    # no double credit across the union of outputs)
    sh = spark.read.parquet(store + "/shingles").collect()
    assert {(r.s, r.first_doc) for r in sh} == {("red fox jumps", 10)}


def test_novelty_route_end_to_end(spark, tmp_path):
    """Novelty scoring as a pipeline route: a batch-2 near-copy of a
    batch-1 doc scores ~0 while fresh prose scores 1.0, and a full
    changelog replay under a fresh checkpoint leaves the store
    unchanged."""
    import json as _json

    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        novelty_stats_writer,
        read_novelty_stats,
    )

    base = ("the quick brown fox jumps over the lazy dog while a patient "
            "grey owl watches from a very tall oak tree near the river")
    texts = {
        1: base,
        2: "entirely unrelated prose about columnar execution engines and "
           "shuffle boundaries with partition pruning at large scale",
        3: base.replace("dog", "cat"),  # near-copy of 1, later batch
    }
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(1, 2), (3,)]):
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, did in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "crawl", "table": "documents",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(did), "text": texts[did]},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    store = str(tmp_path / "nov")
    route = Route("novelty", novelty_stats_writer(store, "crawl.documents"))
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    nov = {r.doc_id: r.novelty for r in read_novelty_stats(spark, store).collect()}
    assert set(nov) == {1, 2, 3}
    assert nov[1] == 1.0 and nov[2] == 1.0
    assert nov[3] < 0.35  # near-copy: only the shingles around 'cat' are new

    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    assert read_novelty_stats(spark, store).count() == 3
