"""Corpus curation: the end-to-end training-data cleaning pipeline.

Composes the engine's text-quality features, language filtering, exact
fingerprint dedup, and MinHash near-dup removal into one call — the
workflow a 100 TB pretraining-corpus pipeline runs nightly. Every stage
is the already-tested primitive; this module only sequences them and
reports what each stage dropped (silent-cap rule: curation must account
for every removed document).

Stage order matters at scale: cheap row-local filters (quality, lang)
run first and shrink the corpus before the only shuffling stage
(near-dup pairing) sees it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.text import quality_features
from wing_binlog_go_spark.operators.dedup import (
    keep_canonical,
    minhash_dedup_pairs,
)


@dataclass
class CurationReport:
    input_docs: int = 0
    dropped_quality: int = 0
    dropped_lang: int = 0
    dropped_boilerplate: int = 0
    dropped_exact_dup: int = 0
    dropped_near_dup: int = 0
    dropped_semantic: int = 0
    dropped_contaminated: int = 0
    removed_span_tokens: int = 0
    output_docs: int = 0
    stages: list[str] = field(default_factory=list)


def curate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 5,
    max_stop_ratio: float = 0.9,
    allowed_langs: list[str] | None = None,
    lang_col: str = "lang",
    near_dup_threshold: float = 0.9,
    max_boiler_ratio: float | None = None,
    boiler_ngram: int = 3,
    benchmark: DataFrame | None = None,
    benchmark_ngram: int = 8,
    span_dedup_k: int | None = None,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.97,
    semantic_clusters: int = 16,
    emb_id_col: str = "vec_id",
    emb_vec_col: str = "embedding",
) -> tuple[DataFrame, CurationReport]:
    """documents → curated documents + per-stage drop accounting."""
    rep = CurationReport()
    rep.input_docs = docs.count()
    # every persisted intermediate, released together at the end — stage
    # reassignment (good = kept) would otherwise orphan earlier persists
    _persisted: list[DataFrame] = []
    try:

        # 1. quality: row-local expressions, no shuffle
        feats = quality_features(text_col)
        scored = docs.withColumn("_ntok", feats["n_tokens"]).withColumn(
            "_stop", feats["stop_ratio"]
        )
        # persist the surviving set: each stage's count() is an action, and
        # without this every count re-scans the corpus through all prior
        # filters (2-3× total cost at the nightly-100TB scale this targets)
        good = (
            scored.filter(
                (F.col("_ntok") >= min_tokens) & (F.col("_stop") <= max_stop_ratio)
            )
            .drop("_ntok", "_stop")
            .persist()
        )
        _persisted.append(good)
        n = good.count()
        rep.dropped_quality = rep.input_docs - n
        rep.stages.append(f"quality: -{rep.dropped_quality}")

        # 2. language allow-list (metadata column; swap in functions.text
        #    lang_id when no label exists)
        if allowed_langs:
            kept = good.filter(F.col(lang_col).isin(allowed_langs))
            m = kept.count()
            rep.dropped_lang = n - m
            n, good = m, kept
            rep.stages.append(f"lang: -{rep.dropped_lang}")

        # 2b. optional boilerplate-share filter: the df pass shuffles on the
        #     k-gram, so it runs after the row-local filters shrank the
        #     corpus but before the heavier dedup stages. Ratio is measured
        #     against the CURRENT survivor set (template text is defined by
        #     the corpus that will ship, not by what quality already cut).
        if max_boiler_ratio is not None:
            from wing_binlog_go_spark.functions.text import boilerplate_stats

            ratios = boilerplate_stats(
                good, k=boiler_ngram, id_col=id_col, text_col=text_col
            ).select(id_col, "boiler_ratio")
            kept = (
                good.join(ratios, id_col, "left")
                .filter(
                    F.coalesce(F.col("boiler_ratio"), F.lit(0.0)) <= max_boiler_ratio
                )
                .drop("boiler_ratio")
                .persist()
            )
            _persisted.append(kept)
            m = kept.count()
            rep.dropped_boilerplate = n - m
            n, good = m, kept
            rep.stages.append(f"boilerplate: -{rep.dropped_boilerplate}")

        # 3. exact dedup by normalized-text fingerprint (one narrow shuffle)
        fp = good.withColumn("_fp", F.md5(F.lower(F.col(text_col))))
        w_first = (
            fp.groupBy("_fp").agg(F.min(id_col).alias("_keep_id"))
        )
        exact = (
            fp.join(w_first, "_fp")
            .filter(F.col(id_col) == F.col("_keep_id"))
            .drop("_fp", "_keep_id")
            .persist()
        )
        _persisted.append(exact)
        m = exact.count()
        rep.dropped_exact_dup = n - m
        n = m
        rep.stages.append(f"exact-dup: -{rep.dropped_exact_dup}")

        # 4. near-dup removal (MinHash LSH pairs → components → survivors)
        pairs = minhash_dedup_pairs(
            exact, id_col=id_col, text_col=text_col, threshold=near_dup_threshold
        )
        curated = keep_canonical(exact, pairs, id_col=id_col)
        m = curated.count()
        rep.dropped_near_dup = n - m
        n = m
        rep.stages.append(f"near-dup: -{rep.dropped_near_dup}")

        # 4a. optional SEMANTIC dedup (SemDeDup): drop surviving docs whose
        #     embeddings are near-identical to a kept doc — catches
        #     paraphrases and template rewrites the lexical stages can't.
        #     Runs after lexical dedup (fewer vectors to cluster) and only
        #     over docs that HAVE an embedding; the rest pass through.
        if embeddings is not None:
            from wing_binlog_go_spark.operators.similarity import semantic_dedup

            emb_here = embeddings.select(
                F.col(emb_id_col).alias(id_col), F.col(emb_vec_col).alias("_sem_v")
            ).join(curated.select(id_col), id_col, "left_semi")
            kept = semantic_dedup(
                emb_here,
                threshold=semantic_threshold,
                n_clusters=semantic_clusters,
                id_col=id_col,
                vec_col="_sem_v",
            ).select(id_col)
            dropped_ids = emb_here.select(id_col).join(kept, id_col, "left_anti")
            curated = curated.join(dropped_ids, id_col, "left_anti")
            m = curated.count()
            rep.dropped_semantic = n - m
            n = m
            rep.stages.append(f"semantic-dup: -{rep.dropped_semantic}")

        # 4b. optional span-level rewrite: after doc-level dedup removed
        #     whole duplicates, delete the repeated k-token spans that
        #     remain ACROSS surviving docs (shared banners, quoted blocks).
        #     This stage rewrites text (lowercased rebuild — the span
        #     relation is case-folded like every dedup op here) rather than
        #     dropping docs, so it accounts in tokens, not documents.
        if span_dedup_k is not None:
            from wing_binlog_go_spark.functions.text import duplicate_span_removal

            rewritten = duplicate_span_removal(
                curated, k=span_dedup_k, id_col=id_col, text_col=text_col
            ).persist()
            _persisted.append(rewritten)
            rep.removed_span_tokens = int(
                rewritten.agg(F.sum("n_removed")).first()[0] or 0
            )
            curated = curated.drop(text_col).join(
                rewritten.select(id_col, F.col("clean_text").alias(text_col)),
                id_col,
            )
            rep.stages.append(f"span-dedup: -{rep.removed_span_tokens} tokens")

        # 5. benchmark decontamination last: it must see the docs that will
        #    actually ship (dropping dups first avoids re-checking them), and
        #    the eval-set broadcast join is the cheapest stage per row
        if benchmark is not None:
            from wing_binlog_go_spark.functions.text import decontaminate

            curated = decontaminate(
                curated,
                benchmark,
                k=benchmark_ngram,
                id_col=id_col,
                text_col=text_col,
            )
            m = curated.count()
            rep.dropped_contaminated = n - m
            n = m
            rep.stages.append(f"decontaminate: -{rep.dropped_contaminated}")

        rep.output_docs = n
        return curated, rep
    finally:
        # release on EVERY exit: a stage raising mid-pipeline must
        # not leave full-corpus persists pinned for the session
        for df in _persisted:
            df.unpersist()
