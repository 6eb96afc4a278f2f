"""Classifier-based quality filtering (functions/classifier.py):
feature hashing, distributed GD training, scoring — the GPT-3/LLaMA
style model-scored curation stage."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.classifier import (
    hashed_token_features,
    score_logreg,
    train_logreg,
)
from wing_binlog_go_spark.tables import read_table


def test_trained_classifier_separates_planted_corpus(spark):
    """A corpus where label ≡ 'contains the token spamword' must be
    learned essentially perfectly: every positive scores above every
    negative after a few GD rounds (bag-of-words is linearly separable
    on the distinguishing bucket)."""
    rng = np.random.RandomState(3)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for did in range(80):
        words = list(rng.choice(vocab, size=25))
        if did % 2 == 0:
            words[rng.randint(25)] = "spamword"
        rows.append((did, " ".join(words), float(did % 2 == 0)))
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])

    feats = hashed_token_features(docs, dim=64)
    labels = docs.select(F.col("doc_id").alias("doc"), "y")
    w = train_logreg(feats, labels, dim=64, n_iter=24, lr=400.0)
    scored = {r.doc: r.score for r in score_logreg(feats, w).collect()}

    pos = [scored[d] for d in range(0, 80, 2)]
    neg = [scored[d] for d in range(1, 80, 2)]
    assert min(pos) > max(neg), (min(pos), max(neg))


def test_training_is_deterministic(spark, sf_small):
    """Zero-init + fixed iterations: two independent trainings on the
    same inputs produce byte-identical weights (replay/audit
    guarantee; no RNG anywhere in the stage)."""
    docs = read_table(spark, sf_small, "documents").filter(F.col("doc_id") < 100)
    feats = hashed_token_features(docs, dim=32)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        F.array_contains(F.split(F.lower("text"), " "), "vector")
        .cast("double")
        .alias("y"),
    )
    w1 = train_logreg(feats, labels, dim=32, n_iter=4, lr=2.0)
    w2 = train_logreg(feats, labels, dim=32, n_iter=4, lr=2.0)
    assert w1 == w2
    assert any(x != 0.0 for x in w1)


def test_feature_hashing_layout(spark):
    """Long-form sparse features: one row per (doc, bucket), values are
    length-normalized counts summing to 1 per doc, buckets in [0, dim)."""
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "d d d d")], ["doc_id", "text"]
    )
    feats = hashed_token_features(docs, dim=16).collect()
    by_doc: dict = {}
    for r in feats:
        assert 0 <= r.idx < 16
        by_doc.setdefault(r.doc, []).append(r.val)
    assert sum(by_doc[1]) == pytest.approx(1.0)
    # doc 2 is one token repeated: exactly one bucket with val 1.0
    assert by_doc[2] == [1.0]


def test_registered_classifier_scores_separate_on_fixture(spark, sf_small):
    """The registered q146 target ('contains the token vector') must be
    visibly learned on the real fixture: mean score of positives beats
    mean score of negatives by a wide margin."""
    from wing_binlog_go_spark.registry import all_queries

    qs = all_queries()
    scored = qs["q146_quality_classifier"].spark(spark, sf_small).toPandas()
    docs = read_table(spark, sf_small, "documents").select(
        "doc_id",
        F.array_contains(F.split(F.lower("text"), " "), "vector").alias("pos"),
    ).toPandas()
    m = scored.merge(docs, on="doc_id")
    pos_mean = m[m["pos"]]["score"].mean()
    neg_mean = m[~m["pos"]]["score"].mean()
    assert pos_mean - neg_mean > 0.2, (pos_mean, neg_mean)
