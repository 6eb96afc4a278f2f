"""Classifier-based quality filtering — the model-scored curation stage.

The large-corpus pipelines behind GPT-3 (Brown et al. 2020, §A),
LLaMA (Touvron et al. 2023) and DataComp filter web documents with a
LEARNED quality classifier (a linear model over hashed bag-of-words
features, fasttext-style) rather than rules alone: train on weak
labels (reference corpus = positive, raw crawl = negative), score
every document, keep the high-scoring ones. This module implements
that stage Spark-first and exactly:

- :func:`hashed_token_features` — the feature-hashing trick
  (Weinberger et al. 2009): token → rolling-hash bucket in [0, dim);
  features live in LONG form (doc, idx, val), the idiomatic sparse
  layout at scale (no dim-wide dense vectors shuffled per row).
- :func:`train_logreg` — full-batch gradient descent for logistic
  regression. The MODEL (dim floats) lives on the driver and rides
  into the plan as a literal array; the DATA never leaves the cluster.
  Each iteration is: margin per doc (one doc-keyed partial agg) →
  error join → gradient per feature (one idx-keyed agg, bounded by
  dim) → dim-sized driver collect. Same bounded driver-loop budget
  class as PageRank/BPE (documented, not hidden); n_iter is fixed so
  the whole computation is deterministic and — like q139's PageRank —
  expressible as unrolled SQL for the DuckDB oracle.
- :func:`score_logreg` — sigmoid(w·x) per document, one agg.

Everything is exact double arithmetic on both engines; no RNG
(weights init at zero, features are counts / doc length).

Reference analog: the reference has no ML stage (its "Realtime
analytics" use case, readme.md:40-43, delegates analytics to
consumers); this is part of the §2-beyond LLM-pipeline surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from wing_binlog_go_spark.operators.dedup import tokens
from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}

#: rolling-hash seed shared with the DuckDB oracle (h = (h*31 + ascii) % dim)
_HASH_SEED = 7


def _bucket(tok: F.Column, dim: int) -> F.Column:
    """Deterministic feature bucket: polynomial rolling hash over the
    token's character codes — (seed*31 + code) % dim folded
    left-to-right, verified cross-engine for NON-EMPTY tokens (Spark
    splits "" to [""] and folds once; DuckDB folds zero times — which
    is why hashed_token_features filters empty tokens out)."""
    return F.aggregate(
        F.transform(F.split(tok, ""), lambda ch: F.ascii(ch)),
        F.lit(_HASH_SEED).cast("long"),
        lambda acc, c: (acc * 31 + c.cast("long")) % dim,
    )


def hashed_token_features(
    docs: DataFrame,
    dim: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc, idx, val): hashed bag-of-words, val = bucket count divided
    by the doc's token count (length-normalized so gradients are
    bounded regardless of document size). Long/sparse form: one row per
    (doc, bucket) pair — at 100 TB this is the only layout that avoids
    shuffling dim-wide dense vectors for mostly-empty buckets."""
    toks = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(text_col)).alias("tok"),
        F.size(tokens(text_col)).alias("n_toks"),
    ).filter(F.length("tok") > 0)
    # empty tokens (doubled/leading/trailing spaces) are excluded from
    # FEATURES in both engines: Spark folds [""] to a seed*31 hash while
    # DuckDB's empty char range folds to the bare seed, so keeping them
    # would silently diverge the oracle on any multi-spaced text
    # (n_toks deliberately still counts them — it is a length, not a
    # vocabulary)
    return (
        toks.withColumn("idx", _bucket(F.col("tok"), dim))
        .groupBy("doc", "idx")
        .agg((F.count("*") / F.first("n_toks")).alias("val"))
    )


def _margins(features: DataFrame, w: list[float]) -> DataFrame:
    """(doc, margin = Σ val·w[idx]) — the weights enter as a literal
    array (model-to-data broadcast; dim floats, never a shuffle)."""
    warr = F.array(*[F.lit(float(x)) for x in w])
    return (
        features.withColumn(
            "_wv", F.element_at(warr, F.col("idx").cast("int") + 1) * F.col("val")
        )
        .groupBy("doc")
        .agg(F.sum("_wv").alias("margin"))
    )


def train_logreg(
    features: DataFrame,
    labels: DataFrame,
    dim: int = 256,
    n_iter: int = 8,
    lr: float = 2.0,
) -> list[float]:
    """Full-batch GD for logistic regression over long-form features.

    labels: (doc, y) with y ∈ {0.0, 1.0}. Weights start at zero (no
    RNG); each iteration does margin → sigmoid error → per-idx gradient
    (÷ n_docs) → w ← w − lr·grad. Deterministic for fixed n_iter.

    Scale shape: features are persisted once; per iteration two
    doc-keyed shuffles (margin agg + error join reuse the same key) and
    one idx-keyed agg whose cardinality is ≤ dim, then a dim-sized
    collect. Driver holds only the model."""
    feats = features.persist()
    labs = labels.select(F.col("doc"), F.col("y").cast("double")).persist()
    n_docs = labs.count()
    if n_docs == 0:  # loud, not a silent all-zero model
        feats.unpersist()
        labs.unpersist()
        raise ValueError("train_logreg: labels are empty — nothing to fit")
    w = [0.0] * dim
    for _ in range(n_iter):
        err = (
            _margins(feats, w)
            .join(labs, "doc")
            .select(
                "doc",
                (
                    F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))) - F.col("y")
                ).alias("err"),
            )
        )
        grad_rows = (
            feats.join(err, "doc")
            .groupBy("idx")
            .agg((F.sum(F.col("val") * F.col("err")) / F.lit(float(n_docs))).alias("g"))
            .collect()
        )
        for r in grad_rows:
            w[r["idx"]] -= lr * r["g"]
    feats.unpersist()
    labs.unpersist()
    return w


def score_logreg(features: DataFrame, w: list[float]) -> DataFrame:
    """(doc, score = sigmoid(margin)) for every doc with ≥1 feature."""
    return _margins(features, w).select(
        "doc",
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))).alias("score"),
    )


def save_logreg(w: list[float], path: str) -> None:
    """Persist a trained model (atomic rename — the file's presence is
    the commit, so a crashed save never leaves a half-written model
    for the streaming scorer to load)."""
    import json as _json
    import os as _os

    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"dim": len(w), "weights": w}, f)
        f.flush()
        _os.fsync(f.fileno())
    _os.replace(tmp, path)


def load_logreg(path: str) -> tuple[list[float], int]:
    """→ (weights, dim) saved by :func:`save_logreg`."""
    import json as _json

    with open(path) as f:
        meta = _json.load(f)
    return [float(x) for x in meta["weights"]], int(meta["dim"])


# ---------------------------------------------------------------------------
# registered queries
# ---------------------------------------------------------------------------

# dim 512 = zero hash collisions over the fixture vocabulary (256
# folds 'vector' onto 'the' and caps AUC at 0.85); lr is scaled for
# length-normalized features (||x||_1 = 1), measured AUC 0.99 at both
# test scales with a 0.35+ mean score gap
_DIM = 512
_N_ITER = 16
_LR = 400.0


def _q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train on a weak label derivable from the text itself (does the
    doc contain the token 'vector'), score the whole corpus: a
    fully-learnable target, so the scores visibly separate — and the
    identical unrolled-GD SQL hash-checks the entire train+score chain
    against DuckDB."""
    docs = read_table(spark, sf_dir, "documents")
    feats = hashed_token_features(docs, dim=_DIM)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        F.array_contains(tokens("text"), "vector").cast("double").alias("y"),
    )
    w = train_logreg(feats, labels, dim=_DIM, n_iter=_N_ITER, lr=_LR)
    return (
        score_logreg(feats, w)
        .select(F.col("doc").alias("doc_id"), F.round("score", 6).alias("score"))
        .orderBy("doc_id")
    )


def _classifier_oracle(dim: int, n_iter: int, lr: float) -> str:
    """Unrolled-GD DuckDB oracle (same scheme as q139's PageRank: a
    fixed iteration count needs no recursion — chain CTEs w0..w{n}).
    Every CTE is MATERIALIZED: DuckDB inlines plain CTEs, and each
    w{i} is referenced twice per iteration, so an un-materialized
    chain doubles the plan per level (2^n inlined parquet scans —
    observed as an fd-exhaustion IOException at n=16). 6-dp rounding
    sits far above cross-engine double jitter."""
    head = f"""
WITH base AS MATERIALIZED (
  SELECT doc_id AS doc, string_split(lower(text), ' ') AS t FROM documents
), toks AS MATERIALIZED (
  SELECT doc, unnest(t) AS tok, len(t) AS n_toks FROM base
), feat AS MATERIALIZED (
  SELECT doc,
         list_reduce(
           list_prepend({_HASH_SEED}::BIGINT,
             list_transform(range(1, length(tok) + 1), i -> ascii(tok[i]))),
           (a, b) -> (a * 31 + b) % {dim}) AS idx,
         COUNT(*)::DOUBLE / ANY_VALUE(n_toks) AS val
  FROM toks WHERE length(tok) > 0 GROUP BY doc, idx
), lab AS MATERIALIZED (
  SELECT doc, list_contains(t, 'vector')::DOUBLE AS y FROM base
), nn AS MATERIALIZED (
  SELECT COUNT(*)::DOUBLE AS n FROM lab
), w0 AS MATERIALIZED (
  SELECT unnest(range(0, {dim})) AS idx, 0.0::DOUBLE AS w
)"""
    steps = []
    for i in range(n_iter):
        steps.append(f""", m{i} AS MATERIALIZED (
  SELECT f.doc, SUM(f.val * w.w) AS margin
  FROM feat f JOIN w{i} w USING (idx) GROUP BY f.doc
), e{i} AS MATERIALIZED (
  SELECT l.doc, 1.0 / (1.0 + exp(-COALESCE(m.margin, 0.0))) - l.y AS err
  FROM lab l LEFT JOIN m{i} m USING (doc)
), g{i} AS MATERIALIZED (
  SELECT f.idx, SUM(f.val * e.err) / (SELECT n FROM nn) AS g
  FROM feat f JOIN e{i} e USING (doc) GROUP BY f.idx
), w{i + 1} AS MATERIALIZED (
  SELECT w.idx, w.w - {lr} * COALESCE(g.g, 0.0) AS w
  FROM w{i} w LEFT JOIN g{i} g USING (idx)
)""")
    tail = f""", mf AS (
  SELECT f.doc, SUM(f.val * w.w) AS margin
  FROM feat f JOIN w{n_iter} w USING (idx) GROUP BY f.doc
)
SELECT doc AS doc_id, ROUND(1.0 / (1.0 + exp(-margin)), 6) AS score
FROM mf ORDER BY doc_id
"""
    return head + "".join(steps) + tail


QUERIES["q146_quality_classifier"] = QuerySpec(
    _q_quality_classifier, _classifier_oracle(_DIM, _N_ITER, _LR)
)


def _q_classifier_filtered_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The downstream curation action: keep documents the trained
    classifier scores above the corpus median — the 'classifier-kept'
    half of the GPT-3-style filtering split, joined back to payload
    columns so the output is the corpus a training run would read."""
    scored = _q_quality_classifier(spark, sf_dir)
    # exact interpolated median (matches DuckDB's median() on doubles;
    # approxQuantile picks an element and would disagree on even counts)
    med = scored.agg(F.expr("percentile(score, 0.5)")).collect()[0][0]
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.join(scored.filter(F.col("score") > float(med)), "doc_id", "left_semi")
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


def _filtered_oracle(dim: int, n_iter: int, lr: float) -> str:
    inner = _classifier_oracle(dim, n_iter, lr).rstrip().rstrip(";")
    return f"""
WITH scored AS ({inner})
SELECT d.doc_id, d.lang, d.source
FROM documents d JOIN scored s USING (doc_id)
WHERE s.score > (SELECT median(score) FROM scored)
ORDER BY d.doc_id
"""


QUERIES["q147_classifier_filtered_corpus"] = QuerySpec(
    _q_classifier_filtered_corpus, _filtered_oracle(_DIM, _N_ITER, _LR)
)
