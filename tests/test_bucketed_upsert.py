"""Bucket-pruned upsert: same final state as the full-table upsert,
but batches only rewrite buckets containing changed keys."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.envelope import to_envelopes
from wing_binlog_go_spark.sources.changelog import read_changelog, write_fixture_changelog
from wing_binlog_go_spark.streaming.pipeline import (
    read_bucketed_table,
    upsert_parquet,
    upsert_parquet_bucketed,
)


def _env(spark, tmp_path):
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    return to_envelopes(read_changelog(spark, str(log))).filter(
        F.col("full_table") == "fixtures.cdc_typed_all"
    )


def test_bucketed_matches_flat_upsert(spark, tmp_path):
    env = _env(spark, tmp_path)
    flat, bucketed = str(tmp_path / "flat"), str(tmp_path / "bucketed")
    upsert_parquet(env, flat, pk="id")
    upsert_parquet_bucketed(env, bucketed, pk="id", num_buckets=4)
    a = sorted(
        (r._pk, dict(r.row), r.event_index)
        for r in spark.read.parquet(flat).collect()
    )
    b = sorted(
        (r._pk, dict(r.row), r.event_index)
        for r in read_bucketed_table(spark, bucketed).select(
            "_pk", "row", "event_index"
        ).collect()
    )
    assert [x[:1] + x[2:] for x in a] == [x[:1] + x[2:] for x in b]
    assert [x[1] for x in a] == [x[1] for x in b]


def test_bucket_pruning_touches_only_changed_buckets(spark, tmp_path):
    env = _env(spark, tmp_path)
    target = str(tmp_path / "t")
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=8)
    # record per-bucket mtimes, then apply a single-key update batch
    def mtimes():
        return {
            d: max(
                os.path.getmtime(os.path.join(target, d, f))
                for f in os.listdir(os.path.join(target, d))
            )
            for d in os.listdir(target)
            if d.startswith("bucket=")
        }

    before = mtimes()
    one = env.filter(F.col("event_index") == 1)  # touches exactly one key
    upsert_parquet_bucketed(one, target, pk="id", num_buckets=8)
    after = mtimes()
    changed = [d for d in after if after[d] != before.get(d)]
    assert len(changed) == 1  # only the bucket holding that key rewrote


def test_bucketed_replay_idempotent(spark, tmp_path):
    env = _env(spark, tmp_path)
    target = str(tmp_path / "t")
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=4)
    s1 = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=4)  # replay
    s2 = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    assert s1 == s2
