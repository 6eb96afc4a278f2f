"""Streaming search index: incremental postings equal a batch BM25
recompute, replay is idempotent, non-inserts fail loudly, term lookups
prune partitions, and the route composes through the pipeline."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.text import bm25_scores
from wing_binlog_go_spark.streaming.searchindex import (
    bm25_over_index,
    incremental_index_apply,
    read_search_postings,
    search_index_writer,
)
from tests.streamwait import await_done

DOCS1 = [
    (1, "spark streams the binlog into a hash index"),
    (2, "the quick fox avoids the stream"),
    (3, "hash join beats nested loops on big tables"),
]
DOCS2 = [
    (4, "stream processing with spark and a hash store"),
    (5, "unrelated prose about owls and oak trees"),
]
QUERY = ["hash", "stream", "spark"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_incremental_bm25_matches_batch_recompute(spark, tmp_path):
    store = str(tmp_path / "idx")
    incremental_index_apply(spark, _df(spark, DOCS1), store, mark=10)
    incremental_index_apply(spark, _df(spark, DOCS2), store, mark=20)
    got = {
        r.doc_id: r.bm25 for r in bm25_over_index(spark, store, QUERY).collect()
    }
    want = {
        r.doc_id: r.bm25
        for r in bm25_scores(_df(spark, DOCS1 + DOCS2), QUERY).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d
    assert got[5] == 0.0  # total ranking: no-hit doc present at 0


def test_replay_overwrites_instead_of_duplicating(spark, tmp_path):
    store = str(tmp_path / "idx")
    incremental_index_apply(spark, _df(spark, DOCS1), store, mark=10)
    before = sorted(
        (r.term, r.doc_id, r.tf) for r in read_search_postings(spark, store).collect()
    )
    incremental_index_apply(spark, _df(spark, DOCS1), store, mark=10)
    after = sorted(
        (r.term, r.doc_id, r.tf) for r in read_search_postings(spark, store).collect()
    )
    assert after == before


def test_term_lookup_prunes_partitions(spark, tmp_path):
    store = str(tmp_path / "idx")
    incremental_index_apply(spark, _df(spark, DOCS1), store, mark=10)
    pruned = read_search_postings(spark, store).filter(
        F.col("bucket").isin([3]) & (F.col("term") == "hash")
    )
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan


def test_search_index_route_and_insert_only_guard(spark, tmp_path):
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline

    log = tmp_path / "log"
    log.mkdir()

    def rec(pos, action, before, after):
        return {
            "binlog_file": "mysql-bin.000001", "binlog_pos": pos,
            "xid_commit": True, "database": "shop", "table": "docs",
            "action": action, "row_no": 0, "before": before,
            "after": after, "ddl_query": None,
            "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
        }

    # two files => two micro-batches => two ingest partitions
    with open(log / "a.jsonl", "w") as f:
        for i, (d, t) in enumerate(DOCS1):
            f.write(json.dumps(rec(100 + i, "insert", None,
                                   {"id": str(d), "text": t})) + "\n")
    with open(log / "b.jsonl", "w") as f:
        for i, (d, t) in enumerate(DOCS2):
            f.write(json.dumps(rec(200 + i, "insert", None,
                                   {"id": str(d), "text": t})) + "\n")
    store = str(tmp_path / "idx")
    q = run_pipeline(
        spark,
        str(log),
        [Route("idx", search_index_writer(store, "shop.docs"))],
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    got = {
        r.doc_id: r.bm25 for r in bm25_over_index(spark, store, QUERY).collect()
    }
    want = {
        r.doc_id: r.bm25
        for r in bm25_scores(_df(spark, DOCS1 + DOCS2), QUERY).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d
    ingests = {
        r.ingest for r in read_search_postings(spark, store).select("ingest").distinct().collect()
    }
    assert len(ingests) == 2  # one partition per micro-batch

    # a delete envelope for the indexed table must fail loudly
    import pytest

    from wing_binlog_go_spark.functions.envelope import EVENT_SCHEMA

    bad = spark.createDataFrame(
        [("shop", "docs", "delete", 0, 999,
          {"data": {"id": "1", "text": "x"}, "old_data": None, "new_data": None})],
        EVENT_SCHEMA,
    )
    with pytest.raises(ValueError, match="insert-only"):
        search_index_writer(store, "shop.docs")(bad, 0)


def test_compaction_folds_partitions_and_blocks_stale_replay(spark, tmp_path):
    """After compaction the index holds ONE ingest partition with the
    same scores; a replayed pre-compaction batch is a no-op (its rows
    are folded — recreating its partition would double them); new
    batches still append and score correctly."""
    from wing_binlog_go_spark.streaming.searchindex import (
        compact_search_index,
        compacted_through,
    )

    store = str(tmp_path / "idx")
    incremental_index_apply(spark, _df(spark, DOCS1), store, mark=10)
    incremental_index_apply(spark, _df(spark, DOCS2[:1]), store, mark=20)
    before = {
        r.doc_id: r.bm25 for r in bm25_over_index(spark, store, QUERY).collect()
    }
    compact_search_index(spark, store)
    assert compacted_through(store) == 20
    ingests = {
        r.ingest
        for r in read_search_postings(spark, store).select("ingest").distinct().collect()
    }
    assert ingests == {20}
    after = {
        r.doc_id: r.bm25 for r in bm25_over_index(spark, store, QUERY).collect()
    }
    assert after == before

    # stale replay: folded batch redelivered -> no duplicate postings
    incremental_index_apply(spark, _df(spark, DOCS1), store, mark=10)
    assert {
        r.doc_id: r.bm25 for r in bm25_over_index(spark, store, QUERY).collect()
    } == before

    # post-compaction appends keep working
    incremental_index_apply(spark, _df(spark, DOCS2[1:]), store, mark=30)
    got = {
        r.doc_id: r.bm25 for r in bm25_over_index(spark, store, QUERY).collect()
    }
    want = {
        r.doc_id: r.bm25
        for r in bm25_scores(_df(spark, DOCS1 + DOCS2), QUERY).collect()
    }
    assert set(got) == set(want)
    for d in want:
        assert abs(got[d] - want[d]) < 1e-9, d
