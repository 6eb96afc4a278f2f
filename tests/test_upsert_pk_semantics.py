"""PK semantics of the upsert materializer (ADVICE round 1):

- a MySQL UPDATE that changes the primary key must tombstone the old
  key (canal delivers the before/after pair in one event, rows.go:17-27;
  the materialized replica must not keep both images);
- composite keys must be injective: ('1', NULL) vs ('1', '') are
  different keys, and separator bytes inside values cannot re-align
  component boundaries.
"""

from __future__ import annotations

from wing_binlog_go_spark.streaming.pipeline import (
    latest_image_per_pk,
    pk_str,
    upsert_parquet,
)

ENV_SCHEMA = (
    "event_type string, event_index long, "
    "event struct<data:map<string,string>, old_data:map<string,string>, "
    "new_data:map<string,string>>"
)


def _env(spark, rows):
    return spark.createDataFrame(rows, ENV_SCHEMA)


def test_pk_change_update_tombstones_old_key(spark, tmp_path):
    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            # UPDATE changes the PK: id 1 → 2
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "2", "v": "b"})),
        ],
    )
    target = str(tmp_path / "t")
    upsert_parquet(env, target, pk="id")
    final = {r._pk: dict(r.row) for r in spark.read.parquet(target).collect()}
    assert set(final) == {pk_str("2")}  # old key removed, not duplicated
    assert final[pk_str("2")]["v"] == "b"


def test_pk_change_then_reinsert_old_key(spark, tmp_path):
    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "2", "v": "b"})),
            # the old key is later legitimately reused
            ("insert", 3, ({"id": "1", "v": "new"}, None, None)),
        ],
    )
    target = str(tmp_path / "t")
    upsert_parquet(env, target, pk="id")
    final = {r._pk: dict(r.row) for r in spark.read.parquet(target).collect()}
    assert set(final) == {pk_str("1"), pk_str("2")}
    assert final[pk_str("1")]["v"] == "new"  # re-insert beats the tombstone


def test_non_pk_update_emits_no_tombstone(spark):
    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("update", 2, (None, {"id": "1", "v": "a"}, {"id": "1", "v": "b"})),
        ],
    )
    out = latest_image_per_pk(env, pk="id").collect()
    assert len(out) == 1 and not out[0].is_delete and out[0].row["v"] == "b"


def test_null_vs_empty_composite_components_distinct(spark):
    env = _env(
        spark,
        [
            ("insert", 1, ({"a": "1", "v": "null-b"}, None, None)),  # b absent ⇒ NULL
            ("insert", 2, ({"a": "1", "b": "", "v": "empty-b"}, None, None)),
        ],
    )
    out = {r._pk: r.row["v"] for r in latest_image_per_pk(env, pk=["a", "b"]).collect()}
    assert len(out) == 2
    assert out[pk_str("1", None)] == "null-b"
    assert out[pk_str("1", "")] == "empty-b"


def test_separator_in_value_cannot_realign_components(spark):
    # ('a\x1fb', 'c') vs ('a', 'b\x1fc') — same concatenation without
    # length prefixes
    env = _env(
        spark,
        [
            ("insert", 1, ({"a": "a\x1fb", "b": "c", "v": "one"}, None, None)),
            ("insert", 2, ({"a": "a", "b": "b\x1fc", "v": "two"}, None, None)),
        ],
    )
    out = latest_image_per_pk(env, pk=["a", "b"]).collect()
    assert len(out) == 2


def test_ddl_added_column_flows_through_replica(spark, tmp_path):
    """Schema evolution: rows are map<string,string> envelopes, so a
    DDL-added column is just a new map key — batch 2 rows carry it,
    batch 1 survivors simply lack it (NULL on lookup), and the upsert
    merge needs no schema migration. This is the replica-side half of
    O8 (DDL → schema refresh): the registry versions the decode, the
    materializer is representation-stable across the ALTER."""
    target = str(tmp_path / "t")
    upsert_parquet(
        _env(spark, [("insert", 1, ({"id": "1", "v": "a"}, None, None))]),
        target,
        pk="id",
    )
    # ALTER TABLE ... ADD COLUMN w happens here; later events carry it
    upsert_parquet(
        _env(
            spark,
            [
                ("insert", 2, ({"id": "2", "v": "b", "w": "W2"}, None, None)),
                ("update", 3, (None, {"id": "1", "v": "a"},
                               {"id": "1", "v": "a2", "w": "W1"})),
            ],
        ),
        target,
        pk="id",
    )
    final = {r.row["id"]: dict(r.row) for r in spark.read.parquet(target).collect()}
    assert final["1"] == {"id": "1", "v": "a2", "w": "W1"}
    assert final["2"] == {"id": "2", "v": "b", "w": "W2"}

    # a pre-ALTER key never touched again keeps its narrow image
    upsert_parquet(
        _env(spark, [("insert", 4, ({"id": "3", "v": "c", "w": "W3"}, None, None))]),
        target,
        pk="id",
    )
    rows = {r.row["id"]: dict(r.row) for r in spark.read.parquet(target).collect()}
    assert "w" not in rows["1"] or rows["1"]["w"] == "W1"
    assert rows["3"]["w"] == "W3"


def test_empty_batch_skips_replica_rewrite(spark, tmp_path):
    """A multi-table replica route calls upsert_parquet per registered
    table per batch; a table with zero events must not pay a full
    read-and-rewrite (staging mtime unchanged == nothing written)."""
    import os

    from wing_binlog_go_spark.streaming.pipeline import upsert_parquet

    env = _env(
        spark,
        [
            ("insert", 1, ({"id": "1", "v": "a"}, None, None)),
            ("insert", 2, ({"id": "2", "v": "b"}, None, None)),
        ],
    )
    target = str(tmp_path / "replica")
    upsert_parquet(env, target, pk="id")
    files_before = {
        f: os.path.getmtime(os.path.join(target, f)) for f in os.listdir(target)
    }
    upsert_parquet(env.filter("1 = 0"), target, pk="id")  # empty batch
    files_after = {
        f: os.path.getmtime(os.path.join(target, f)) for f in os.listdir(target)
    }
    assert files_before == files_after
