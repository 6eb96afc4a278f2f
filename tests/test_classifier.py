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
from tests.streamwait import await_done


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


def test_minibatch_l2_options(spark, sf_small):
    """Round-8 hardening options: (a) l2=0 + n_batches=1 reproduces the
    original full-batch path byte-for-byte (backward compatibility of
    the rewritten update rule); (b) L2 shrinks weight norms at equal
    iterations; (c) mini-batch training is deterministic and visits
    every batch (weights move even for docs in late batches);
    (d) n_batches < 1 fails loudly."""
    import pytest as _pytest

    docs = read_table(spark, sf_small, "documents").filter(F.col("doc_id") < 120)
    feats = hashed_token_features(docs, dim=32)
    labels = docs.select(
        F.col("doc_id").alias("doc"),
        F.array_contains(F.split(F.lower("text"), " "), "vector")
        .cast("double")
        .alias("y"),
    )
    base = train_logreg(feats, labels, dim=32, n_iter=4, lr=2.0)
    compat = train_logreg(feats, labels, dim=32, n_iter=4, lr=2.0,
                          l2=0.0, n_batches=1)
    assert base == compat

    reg = train_logreg(feats, labels, dim=32, n_iter=4, lr=2.0, l2=0.01)
    assert sum(x * x for x in reg) < sum(x * x for x in base)
    assert any(x != 0.0 for x in reg)

    mb1 = train_logreg(feats, labels, dim=32, n_iter=8, lr=2.0, n_batches=4)
    mb2 = train_logreg(feats, labels, dim=32, n_iter=8, lr=2.0, n_batches=4)
    assert mb1 == mb2
    assert mb1 != base and any(x != 0.0 for x in mb1)

    with _pytest.raises(ValueError, match="n_batches"):
        train_logreg(feats, labels, dim=32, n_iter=1, lr=2.0, n_batches=0)


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


def test_classifier_corpus_route_end_to_end(spark, tmp_path):
    """Frozen-model streaming stage: train offline on a planted corpus
    (label = contains 'spamword'; the classifier learns to REJECT it),
    persist the model, stream CDC inserts through
    classifier_corpus_writer — spam docs are dropped, clean docs kept
    with their scores, and a full changelog replay under a fresh
    checkpoint leaves the store unchanged."""
    import json as _json

    from wing_binlog_go_spark.functions.classifier import (
        save_logreg,
        train_logreg,
    )
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        classifier_corpus_writer,
        read_classifier_corpus,
    )

    rng = np.random.RandomState(9)
    vocab = [f"w{i}" for i in range(30)]

    def make(spam: bool) -> str:
        words = list(rng.choice(vocab, size=25))
        if spam:
            words[rng.randint(25)] = "spamword"
        return " ".join(words)

    # offline training set: label 1 = CLEAN (keep), 0 = spam
    train_rows = [(i, make(spam=i % 2 == 1), float(i % 2 == 0)) for i in range(80)]
    train = spark.createDataFrame(train_rows, ["doc_id", "text", "y"])
    feats = hashed_token_features(train, dim=64)
    w = train_logreg(
        feats, train.select(F.col("doc_id").alias("doc"), "y"),
        dim=64, n_iter=24, lr=400.0,
    )
    model_path = str(tmp_path / "model.json")
    save_logreg(w, model_path)

    # stream: two batches, mixed clean/spam
    stream_docs = {
        101: make(spam=False), 102: make(spam=True),
        103: make(spam=True), 104: make(spam=False),
    }
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(101, 102), (103, 104)]):
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, did in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "crawl", "table": "documents",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(did), "text": stream_docs[did]},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    store = str(tmp_path / "kept")
    route = Route(
        "quality",
        classifier_corpus_writer(store, model_path, "crawl.documents"),
    )
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    kept = {r.doc_id: r.score for r in read_classifier_corpus(spark, store).collect()}
    assert set(kept) == {101, 104}
    assert all(s >= 0.5 for s in kept.values())

    # full replay under a fresh checkpoint: ids already committed → no-op
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    assert {
        r.doc_id for r in read_classifier_corpus(spark, store).collect()
    } == {101, 104}


def test_features_exclude_empty_tokens_cross_engine(spark):
    """Multi-spaced text: empty tokens are excluded from FEATURES in
    both engines (Spark folds [''] once, DuckDB folds zero times — kept
    empties would silently diverge the q146/q147 oracle), while n_toks
    still counts them as length. Asserts the Spark side here; the
    oracle side carries the same WHERE length(tok) > 0."""
    import duckdb

    docs = spark.createDataFrame([(1, "a  b"), (2, " c")], ["doc_id", "text"])
    feats = hashed_token_features(docs, dim=64).collect()
    # doc 1: tokens ['a','','b'] → 2 feature rows, each val 1/3
    # doc 2: tokens ['','c'] → 1 feature row, val 1/2
    by_doc: dict = {}
    for r in feats:
        by_doc.setdefault(r.doc, []).append(r.val)
    assert sorted(by_doc[1]) == pytest.approx([1 / 3, 1 / 3])
    assert by_doc[2] == pytest.approx([1 / 2])

    # cross-engine bucket equality on the same rows
    duck = duckdb.sql("""
        WITH base AS (
          SELECT * FROM (VALUES (1, 'a  b'), (2, ' c')) t(doc, text)
        ), toks AS (
          SELECT doc, unnest(string_split(lower(text), ' ')) AS tok,
                 len(string_split(lower(text), ' ')) AS n_toks
          FROM base
        )
        SELECT doc,
               list_reduce(list_prepend(7::BIGINT,
                 list_transform(range(1, length(tok) + 1), i -> ascii(tok[i]))),
                 (a, b) -> (a * 31 + b) % 64) AS idx,
               COUNT(*)::DOUBLE / ANY_VALUE(n_toks) AS val
        FROM toks WHERE length(tok) > 0 GROUP BY doc, idx
    """).fetchall()
    want = {(r.doc, r.idx, round(r.val, 9)) for r in feats}
    got = {(d, i, round(v, 9)) for d, i, v in duck}
    assert got == want
