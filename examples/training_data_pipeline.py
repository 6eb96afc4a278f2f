"""End-to-end training-data curation demo over the testdata corpus:

  documents → curate (quality → lang → exact-dup → near-dup →
  span-rewrite) → per-source caps → temperature mix → seeded shuffle →
  sequence packing,
  plus the embedding side (semantic dedup → diversity sample) and a
  multimodal near-dup pass over synthesized real media bytes.

    python examples/training_data_pipeline.py [sf_dir]

Defaults to /root/testdata/sf0.001 so it runs in seconds. Every stage
prints its accounting — the silent-cap rule applies to demos too.
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

import numpy as np
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.curation import curate
from wing_binlog_go_spark.functions.mixing import (
    context_chunks,
    deterministic_split,
    sequence_pack,
    shuffle_rank,
    source_cap,
    temperature_mix,
)
from wing_binlog_go_spark.functions.text import (
    bloom_contamination_overlap,
    gopher_quality_flags,
)
from wing_binlog_go_spark.multimodal import (
    MEDIA_SCHEMA,
    audio_near_dup_pairs,
    phash_near_dup_pairs,
    real_decode_image,
)
from wing_binlog_go_spark.multimodal.codecs import (
    encode_bmp,
    encode_flac,
    encode_png,
    encode_wav,
)
from wing_binlog_go_spark.operators.similarity import diversity_sample, semantic_dedup
from wing_binlog_go_spark.session import get_spark
from wing_binlog_go_spark.tables import read_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("training-data-demo", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    # --- text: curation → caps → mix → shuffle → pack -----------------
    # the embeddings table rides along so the SemDeDup stage can drop
    # paraphrase twins the lexical stages can't see (doc_id == vec_id
    # in the fixture corpus)
    docs = read_table(spark, sf_dir, "documents")
    emb = read_table(spark, sf_dir, "embeddings")
    curated, rep = curate(
        docs,
        allowed_langs=["en", "fr", "de", "es", "zh"],
        near_dup_threshold=0.9,
        span_dedup_k=8,
        embeddings=emb.select(F.col("vec_id").alias("vec_id"), "embedding"),
        semantic_threshold=0.97,
        semantic_clusters=8,
    )
    print(f"curation: {rep.input_docs} -> {rep.output_docs} docs | " + "; ".join(rep.stages))

    capped = source_cap(curated, cap=20)
    print(f"source caps: {curated.count()} -> {capped.count()} docs (<=20/source)")

    mixed_ids = temperature_mix(capped, "lang", total=200, alpha=0.5)
    mixed = capped.join(mixed_ids.select("doc_id"), "doc_id", "left_semi")
    print("temperature mix:", mixed.count(), "docs;",
          {r.lang: r.c for r in mixed.groupBy("lang").agg(F.count("*").alias("c")).collect()})

    packed = sequence_pack(shuffle_rank(mixed), capacity=2048)
    n_packs = packed.agg(F.countDistinct("pack_id")).first()[0]
    print(f"packed into {n_packs} sequences of <=2048 tokens")

    # --- r6 stages: quality rules → decontaminate → chunk → split ----
    flagged = gopher_quality_flags(mixed, min_stopword_hits=1)
    q_kept = mixed.join(
        flagged.filter("keep").select("doc_id"), "doc_id", "left_semi"
    )
    print(f"gopher rules: {mixed.count()} -> {q_kept.count()} docs")

    bench = docs.filter(F.col("doc_id") % 97 == 0)
    dirty = (
        bloom_contamination_overlap(q_kept, bench, k=5, bench_id_col="doc_id")
        .select("doc_id").distinct()
    )
    clean = q_kept.join(dirty, "doc_id", "left_anti")
    print(f"bloom decontamination: {q_kept.count()} -> {clean.count()} docs")

    chunks = context_chunks(clean, window=64, stride=48, min_tokens=16)
    # seed must differ from the sampling stages above: temperature_mix
    # kept the docs with the SMALLEST seed-42 draws, so splitting on
    # the same seed would put every survivor in 'train'
    split = deterministic_split(chunks, id_col="doc_id", seed=1234)
    by_split = {
        r.split: r.c
        for r in split.groupBy("split").agg(F.count("*").alias("c")).collect()
    }
    print(f"chunks: {chunks.count()} training sequences; split: {by_split}")

    # --- embeddings: semantic dedup → diversity sample ----------------
    emb = read_table(spark, sf_dir, "embeddings")
    sem = semantic_dedup(emb, threshold=0.97, n_clusters=8)
    div = diversity_sample(sem, per_cluster=25, n_clusters=8)
    print(f"embeddings: {emb.count()} -> {sem.count()} after semantic dedup "
          f"-> {div.count()} after diversity caps")

    # --- multimodal: real bytes, near-dup in every modality -----------
    rng = np.random.RandomState(5)
    img = np.clip(rng.randint(0, 256, (48, 64, 3)), 0, 255).astype(np.uint8)
    noisy = np.clip(img.astype(int) + rng.randint(-2, 3, img.shape), 0, 255).astype(np.uint8)
    # spectrally rich clip (a pure sine's spectrogram is one line —
    # the degenerate case perceptual hashes are NOT built for)
    t = np.arange(8000) / 8000.0
    tone = sum(
        a * np.sin(2 * np.pi * f * t)
        for f, a in [(440, 0.2), (880, 0.1), (1320, 0.07), (2100, 0.05)]
    ) * np.clip(np.sin(2 * np.pi * 1.5 * t), 0, None)
    media = spark.createDataFrame(
        [
            (1, encode_bmp(img), ("image/bmp", 64, 48, None)),
            (2, encode_png(noisy), ("image/png", 64, 48, None)),
            (3, encode_wav(tone), ("audio/wav", None, None, 1000)),
            # same clip, different lossless container: FLAC pairs with 3
            (4, encode_flac(tone + rng.normal(0, 0.005, len(tone)), rate=8000),
             ("audio/flac", None, None, 1000)),
        ],
        MEDIA_SCHEMA,
    )
    # --- corpus analytics: search, phrases, profile (late r6) ---------
    from wing_binlog_go_spark.functions.text import bm25_scores, pmi_collocations
    from wing_binlog_go_spark.operators.stats import profile_columns

    top = (
        bm25_scores(clean, ["hash", "stream", "spark"])
        .orderBy(F.desc("bm25"), "doc_id").limit(5).collect()
    )
    print("bm25 top-5:", [(r.doc_id, r.bm25) for r in top])
    phrases = (
        pmi_collocations(clean, min_count=3)
        .orderBy(F.desc("pmi"), "a", "b").limit(5).collect()
    )
    print("top collocations:", [(r.a, r.b, r.pmi) for r in phrases])
    prof = profile_columns(docs, cols=["doc_id", "lang", "n_chars"]).collect()
    print("profile:", [(r.col_name, r.ndv, r.min_s, r.max_s) for r in prof])

    img_pairs = phash_near_dup_pairs(
        media.filter(F.col("meta.mime").startswith("image/")),
        max_hamming=8, batch_decoder=real_decode_image,
    ).collect()
    aud_pairs = audio_near_dup_pairs(
        media.filter(F.col("meta.mime").startswith("audio/")), max_hamming=8
    ).collect()
    print(f"media near-dups: image pairs {[(r.media_a, r.media_b) for r in img_pairs]}, "
          f"audio pairs {[(r.media_a, r.media_b) for r in aud_pairs]}")

    # --- split, sample, export (late r6) ------------------------------
    # leakage-safe split: near-dup clusters stay inside ONE split, so
    # the eval set can't be train paraphrases (per-doc splits leak)
    from wing_binlog_go_spark.functions.mixing import (
        export_webdataset_shards,
        leakage_safe_split,
        weighted_sample,
    )

    split = leakage_safe_split(docs)
    by_split = {r.split: r.cnt for r in
                split.groupBy("split").agg(F.count("*").alias("cnt")).collect()}
    print("leakage-safe split sizes:", by_split)
    # size-proportional sample (∝ n_chars) — deterministic, no replacement
    picked = weighted_sample(docs, k=50, weight_col="n_chars")
    print("weighted sample: 50 docs,",
          picked.agg(F.sum("n_chars")).first()[0], "chars of mass")
    # WebDataset export: tar shards of adjacent members per sample
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        export_webdataset_shards(
            picked.withColumn("meta", F.to_json(F.struct("lang", "source"))),
            td, {"txt": "text", "json": "meta"}, n_shards=4,
        )
        import os as _os
        shards = sorted(_os.listdir(td))
        print("webdataset shards:", shards)

    # --- learned stages (r7) ------------------------------------------
    # classifier-scored quality: train on a text-derivable weak label,
    # score everything, keep the high half; novelty: how much each doc
    # added that the corpus hadn't seen
    from wing_binlog_go_spark.functions.classifier import (
        hashed_token_features,
        score_logreg,
        train_logreg,
    )
    from wing_binlog_go_spark.functions.text import ngram_novelty

    feats = hashed_token_features(docs, dim=512)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        F.array_contains(F.split(F.lower("text"), " "), "vector")
        .cast("double").alias("y"),
    )
    w = train_logreg(feats, labels, dim=512, n_iter=16, lr=400.0)
    scored = score_logreg(feats, w)
    print("classifier: kept",
          scored.filter("score >= 0.5").count(), "of", scored.count())
    nov = ngram_novelty(docs, k=3)
    print("novelty: mean",
          round(nov.agg(F.avg("novelty")).first()[0], 3),
          "— lowest-novelty docs are the near-copies/templates")

    # --- graph-substrate stages (r8) ----------------------------------
    # the frozen committed quantizer clusters the embedding space once;
    # the clustered kNN graph then feeds BOTH a density-diverse coreset
    # (low in-degree = sparse region) and a neighborhood-agreement
    # labeling audit — two consumers off one edge table
    from wing_binlog_go_spark.operators.similarity import (
        coreset_by_degree,
        label_propagation_knn,
        load_frozen_centroids,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    cents = load_frozen_centroids()
    coreset = coreset_by_degree(emb, cents, k=5, per_cluster=10)
    print("coreset:", coreset.count(), "low-density representatives")
    agree = label_propagation_knn(emb, cents, k=5)
    n_dis = agree.filter("NOT agree").count()
    print("label audit:", n_dis, "docs disagree with their kNN",
          "neighborhood — review-first candidates")

    # --- monitoring stages (r9) ----------------------------------------
    # sketches size the corpus without keeping it (distinct sources of
    # truth for dashboards over 100 TB), PSI flags the source whose
    # length profile drifted from the corpus, and hybrid retrieval
    # fuses the lexical and dense rankings for seed-driven curation
    from wing_binlog_go_spark.functions.text import psi_source_drift
    from wing_binlog_go_spark.operators.similarity import rrf_hybrid_topk
    from wing_binlog_go_spark.operators.stats import (
        kmv_distinct_sketch,
        qdigest_build,
        qdigest_quantiles,
    )

    est = kmv_distinct_sketch(docs, "doc_id").first().est_distinct
    print("KMV: ~", est, "distinct doc ids from a 256-hash sketch",
          "(1/sqrt(k-2) ~ 6% standard error; exact below 256 distinct)")
    qd = qdigest_build(docs.select(F.col("n_chars")), "n_chars")
    qs_ = {r.q_permille: r.est
           for r in qdigest_quantiles(qd, [500, 990]).collect()}
    print("q-digest: median n_chars <=", qs_[500], "| p99 <=", qs_[990],
          "(", qd.count(), "nodes instead of the raw column )")
    worst = (psi_source_drift(docs)
             .orderBy(F.desc("psi_r")).first())
    print("PSI drift: worst source", worst.source, "at", worst.psi_r,
          "(>0.25 = investigate before it skews the mixture)")
    fused = rrf_hybrid_topk(docs, emb, n_queries=3, out_k=3)
    print("hybrid retrieval: top-3 per seed doc via RRF:",
          [(r.query_id, r.doc_id) for r in fused.orderBy("query_id", "rnk").collect()])


if __name__ == "__main__":
    main()
