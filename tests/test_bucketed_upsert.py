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


def _batch2(spark):
    """A second batch touching several buckets: updates + a delete."""
    from tests.test_upsert_pk_semantics import ENV_SCHEMA

    rows = [
        ("update", 1000 + i,
         (None, {"id": str(i), "c_vchar": "old"}, {"id": str(i), "c_vchar": f"v2-{i}"}))
        for i in range(1, 4)
    ] + [("delete", 1010, ({"id": "99", "c_vchar": "committed"}, None, None))]
    return spark.createDataFrame(rows, ENV_SCHEMA)


def test_crash_mid_multi_bucket_commit_rolls_forward(spark, tmp_path, monkeypatch):
    """Crash AFTER the manifest landed but mid-swap: the writer dies
    with some buckets new and some old; the next reader/writer must
    converge to the all-new state (manifest = point of commit)."""
    from wing_binlog_go_spark.streaming import maintenance
    from wing_binlog_go_spark.streaming.pipeline import _bucket_manifest_path

    env = _env(spark, tmp_path)
    target = str(tmp_path / "t")
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=8)
    batch2 = _batch2(spark)
    expected = str(tmp_path / "expected")
    upsert_parquet_bucketed(env, expected, pk="id", num_buckets=8)
    upsert_parquet_bucketed(batch2, expected, pk="id", num_buckets=8)

    real_swap = maintenance.swap_dir
    calls = {"n": 0}

    def dying_swap(new_dir, path):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("simulated crash mid-commit")
        real_swap(new_dir, path)

    monkeypatch.setattr(maintenance, "swap_dir", dying_swap)
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        upsert_parquet_bucketed(batch2, target, pk="id", num_buckets=8)
    monkeypatch.setattr(maintenance, "swap_dir", real_swap)
    assert os.path.exists(_bucket_manifest_path(target))  # crash left manifest

    # the next READER rolls the commit forward
    got = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    want = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, expected).collect()
    )
    assert got == want
    assert not os.path.exists(_bucket_manifest_path(target))


def test_crash_before_manifest_leaves_old_state(spark, tmp_path):
    """Staging dirs without a manifest = crash before the point of
    commit: the table must stay all-old and the garbage staging data is
    ignored/overwritten by the next run."""
    from wing_binlog_go_spark.streaming.pipeline import recover_bucket_commit

    env = _env(spark, tmp_path)
    target = str(tmp_path / "t")
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=8)
    before = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    # fake a pre-manifest crash: leftover staging dirs, no manifest
    os.makedirs(os.path.join(target, ".staging_bucket_0"), exist_ok=True)
    with open(os.path.join(target, ".staging_bucket_0", "garbage"), "w") as f:
        f.write("not parquet")
    assert recover_bucket_commit(target) is False
    assert before == sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    # the next commit proceeds normally despite the leftover staging dir
    upsert_parquet_bucketed(_batch2(spark), target, pk="id", num_buckets=8)
    final = {r._pk: r.event_index for r in read_bucketed_table(spark, target).collect()}
    from wing_binlog_go_spark.streaming.pipeline import pk_str

    assert final[pk_str("1")] == 1001 and pk_str("99") not in final
    # ...and the writer DISCARDED the orphaned staging dir (without the
    # cleanup a rarely-touched bucket's full staged copy leaks forever)
    assert not os.path.exists(os.path.join(target, ".staging_bucket_0"))


def test_swap_backup_is_invisible_to_partition_discovery(spark, tmp_path):
    """A reader listing the table while another bucket's swap is between
    renames must not discover the backup dir as a partition (the old
    `bucket=N._old` naming surfaced as partition value 'N._old' and
    doubled rows)."""
    import shutil

    from wing_binlog_go_spark.streaming.maintenance import backup_path

    env = _env(spark, tmp_path)
    bucketed = str(tmp_path / "bucketed")
    upsert_parquet_bucketed(env, bucketed, pk="id", num_buckets=4)
    baseline = sorted(r._pk for r in read_bucketed_table(spark, bucketed).collect())
    # simulate mid-swap: one bucket also present at its backup location
    some_bucket = next(
        d for d in os.listdir(bucketed) if d.startswith("bucket=")
    )
    src = os.path.join(bucketed, some_bucket)
    shutil.copytree(src, backup_path(src))
    assert backup_path(src).split(os.sep)[-1].startswith(".")
    again = sorted(r._pk for r in read_bucketed_table(spark, bucketed).collect())
    assert again == baseline  # no duplicate rows from the backup dir


def test_commit_lock_blocks_concurrent_recovery(spark, tmp_path):
    """recover_bucket_commit must serialize against a writer holding the
    commit lock: a second locker blocks until release (no interleaved
    double-swap window)."""
    import threading
    import time

    from wing_binlog_go_spark.streaming.pipeline import _commit_lock

    env = _env(spark, tmp_path)
    bucketed = str(tmp_path / "bucketed")
    upsert_parquet_bucketed(env, bucketed, pk="id", num_buckets=4)

    entered = threading.Event()
    release = threading.Event()
    order: list[str] = []

    def holder():
        with _commit_lock(bucketed):
            entered.set()
            release.wait(10)
            order.append("holder-exit")

    t = threading.Thread(target=holder)
    t.start()
    assert entered.wait(5)

    def contender():
        with _commit_lock(bucketed):
            order.append("contender-enter")

    t2 = threading.Thread(target=contender)
    t2.start()
    time.sleep(0.3)  # contender must still be blocked
    assert order == []
    release.set()
    t.join(10)
    t2.join(10)
    assert order == ["holder-exit", "contender-enter"]


def test_compaction_preserves_bucket_layout_and_pk_clustering(spark, tmp_path):
    """Bucket-aware compaction (r2 verdict ask #7): after several
    fragmenting upsert batches, compaction must merge files WITHIN each
    bucket=N dir (never collapse the layout pruning depends on), keep
    the data byte-identical, and leave each output file sorted by _pk
    so footer min/max stats stay tight."""
    from wing_binlog_go_spark.streaming.maintenance import (
        compact_bucketed_table,
        parquet_file_count,
    )

    env = _env(spark, tmp_path)
    target = str(tmp_path / "t")
    # several single-ish batches fragment the buckets
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=4)
    upsert_parquet_bucketed(_batch2(spark), target, pk="id", num_buckets=4)
    upsert_parquet_bucketed(env.limit(3), target, pk="id", num_buckets=4)

    def bucket_dirs():
        return sorted(
            d for d in os.listdir(target) if d.startswith("bucket=")
        )

    before_dirs = bucket_dirs()
    before = sorted(
        (r._pk, r.event_index)
        for r in read_bucketed_table(spark, target).select("_pk", "event_index").collect()
    )

    counts = compact_bucketed_table(spark, target, target_file_mb=128)

    # bucket set unchanged; every bucket compacted to the target count
    assert bucket_dirs() == before_dirs
    assert sorted(counts) == before_dirs
    for d, n in counts.items():
        assert n == 1, (d, n)
        assert parquet_file_count(os.path.join(target, d)) == 1
    # data identical through the partitioned reader
    after = sorted(
        (r._pk, r.event_index)
        for r in read_bucketed_table(spark, target).select("_pk", "event_index").collect()
    )
    assert after == before
    # PK-clustered within each compacted file
    for d in before_dirs:
        bdir = os.path.join(target, d)
        for f in os.listdir(bdir):
            if f.endswith(".parquet"):
                pks = [
                    r._pk
                    for r in spark.read.parquet(os.path.join(bdir, f))
                    .select("_pk")
                    .collect()
                ]
                assert pks == sorted(pks), (d, f)
    # a fresh upsert after compaction still prunes and lands correctly
    upsert_parquet_bucketed(_batch2(spark), target, pk="id", num_buckets=4)
    again = sorted(
        (r._pk, r.event_index)
        for r in read_bucketed_table(spark, target).select("_pk", "event_index").collect()
    )
    assert again == after  # idempotent replay of batch2


def test_repair_buckets_converges_corrupted_bucket(spark, tmp_path):
    """Checksum (chunk == bucket fn) -> repair -> re-verify on the
    bucketed replica: a corrupted row flags exactly its bucket, only
    flagged buckets rewrite from the snapshot (replace, not merge —
    a phantom row a merge could never remove also converges)."""
    import shutil

    from tests.test_upsert_pk_semantics import ENV_SCHEMA
    from wing_binlog_go_spark.operators.stats import checksum_diff, table_checksum
    from wing_binlog_go_spark.streaming.pipeline import (
        latest_image_per_pk,
        repair_buckets,
        upsert_parquet_bucketed,
    )

    n_b = 8
    env = spark.createDataFrame(
        [
            ("insert", i, ({"id": str(i), "v": f"v{i}"}, None, None))
            for i in range(60)
        ],
        ENV_SCHEMA,
    )
    target = str(tmp_path / "replica")
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=n_b)

    # corrupt one bucket: rewrite one key's value in place
    victim = spark.read.parquet(target).limit(1).collect()[0]
    vb = int(victim["bucket"])
    bdir = f"{target}/bucket={vb}"
    corrupted = (
        spark.read.parquet(bdir)
        .withColumn(
            "row",
            F.when(
                F.col("_pk") == victim["_pk"],
                F.map_from_arrays(
                    F.array(F.lit("id"), F.lit("v")),
                    F.array(F.element_at("row", "id"), F.lit("CORRUPT")),
                ),
            ).otherwise(F.col("row")),
        )
        .localCheckpoint(eager=True)
    )
    shutil.rmtree(bdir)
    corrupted.write.parquet(bdir)

    bucket_fn = F.pmod(F.xxhash64(F.col("_pk")), F.lit(n_b)).cast("int")

    def cksum(df):
        flat = df.select(
            "_pk",
            F.element_at("row", "id").alias("id"),
            F.element_at("row", "v").alias("v"),
        )
        return table_checksum(flat, "_pk", ["_pk", "id", "v"], chunk=bucket_fn)

    expected = latest_image_per_pk(env, "id").filter(~F.col("is_delete"))
    diff = checksum_diff(
        cksum(expected), cksum(spark.read.parquet(target))
    ).collect()
    assert [r.chunk for r in diff] == [vb]

    repair_buckets(spark, target, env, pk="id", buckets=[vb], num_buckets=n_b)
    assert (
        checksum_diff(cksum(expected), cksum(spark.read.parquet(target))).count()
        == 0
    )
    fixed = {r._pk: dict(r.row) for r in spark.read.parquet(target).collect()}
    assert len(fixed) == 60 and fixed[victim["_pk"]]["v"] != "CORRUPT"


def test_bucket_lost_mid_swap_is_restored_on_read(spark, tmp_path):
    """A crash between swap_dir's two renames leaves a bucket existing
    only as its HIDDEN backup — invisible to partition discovery, and
    absent from os.listdir so nothing would ever retry it. Readers must
    restore it; its rows must not silently vanish."""
    from wing_binlog_go_spark.streaming.maintenance import backup_path

    env = _env(spark, tmp_path)
    target = str(tmp_path / "t")
    upsert_parquet_bucketed(env, target, pk="id", num_buckets=4)
    before = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    victim = next(
        d for d in sorted(os.listdir(target)) if d.startswith("bucket=")
    )
    vdir = os.path.join(target, victim)
    os.rename(vdir, backup_path(vdir))  # simulate the mid-swap crash
    assert not os.path.exists(vdir)
    after = sorted(
        (r._pk, r.event_index) for r in read_bucketed_table(spark, target).collect()
    )
    assert after == before  # restored, nothing lost
    assert os.path.exists(vdir)
