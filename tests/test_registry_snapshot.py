"""Schema registry (O8 typed views, §1.3 type mapping) and snapshot
bootstrap (O3 dump-then-stream) semantics."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.envelope import to_envelopes
from wing_binlog_go_spark.functions.schema_registry import (
    ColumnSpec,
    SchemaRegistry,
    TableSpec,
    decode_column,
)
from wing_binlog_go_spark.sources.changelog import read_changelog, write_fixture_changelog
from wing_binlog_go_spark.sources.snapshot import (
    bootstrap_union,
    snapshot_as_changes,
)
from wing_binlog_go_spark.streaming.pipeline import pk_str, upsert_parquet

TYPED_COLUMNS = [
    ColumnSpec("id", "bigint(20)", is_pk=True),
    ColumnSpec("c_utiny", "tinyint(3) unsigned"),
    ColumnSpec("c_uint", "int(10) unsigned"),
    ColumnSpec("c_ubig", "bigint(20) unsigned"),
    ColumnSpec("c_dec", "decimal(12,4)"),
    ColumnSpec("c_date", "date"),
    ColumnSpec("c_year", "year(4)"),
    ColumnSpec("c_enum", "enum('a','b','c')"),
    ColumnSpec("c_set", "set('x','y','z')"),
    ColumnSpec("c_vchar", "varchar(255)"),
    ColumnSpec("c_json", "json"),
]


def test_decode_column_type_mapping(spark):
    """FIXTURES §2 type-edge rows through the §1.3 mapping."""
    df = spark.createDataFrame(
        [
            {"c_utiny": "-1", "c_uint": "-1", "c_ubig": "-1", "c_dec": "3.14159",
             "c_date": "0000-00-00", "c_year": "95", "c_enum": "2", "c_set": "5",
             "c_vchar": "héllo✓", "c_json": '{"a": [1,2]}'},
        ]
    )
    row = df.select(
        *[
            decode_column(F.col(c.name), c.raw_type).alias(c.name)
            for c in TYPED_COLUMNS
            if c.name != "id"
        ]
    ).collect()[0]
    assert row.c_utiny == 255
    assert row.c_uint == 4294967295
    assert int(row.c_ubig) == 18446744073709551615
    assert row.c_dec == Decimal("3.1416")  # decimal(12,4), exact
    assert row.c_date is None  # zero-date → NULL
    assert row.c_year == 1995
    assert row.c_enum == "b"  # 1-based ordinal
    assert row.c_set == "x,z"  # bitmask 5 = bits 0,2
    assert row.c_vchar == "héllo✓"  # multi-byte UTF-8 intact
    assert row.c_json == '{"a": [1,2]}'


def test_typed_view_over_envelopes(spark, tmp_path):
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    env = to_envelopes(read_changelog(spark, str(log)))
    reg = SchemaRegistry()
    reg.register(
        TableSpec("fixtures", "cdc_typed_all",
                  [ColumnSpec("id", "bigint(20)", is_pk=True),
                   ColumnSpec("c_vchar", "varchar(255)"),
                   ColumnSpec("c_int", "int(11)")])
    )
    typed = reg.typed_view(env, "fixtures.cdc_typed_all")
    assert dict(typed.dtypes) == {
        "event_type": "string", "event_index": "bigint",
        "id": "bigint", "c_vchar": "string", "c_int": "int",
    }
    rows = {(r.event_type, r.id): r for r in typed.collect()}
    assert rows[("insert", 1)].c_int == 10
    assert rows[("update", 1)].c_vchar == "row1v2"  # update → new image
    assert reg.get("fixtures.cdc_typed_all").pk_columns == ["id"]


def test_registry_alter_refresh(spark, tmp_path):
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    env = to_envelopes(read_changelog(spark, str(log)))
    reg = SchemaRegistry()
    base_cols = [ColumnSpec("id", "bigint(20)", is_pk=True),
                 ColumnSpec("c_vchar", "varchar(255)")]
    reg.register(TableSpec("fixtures", "cdc_typed_all", base_cols))
    evolved = base_cols + [ColumnSpec("c_new", "varchar(16)")]
    reg.refresh_from_alter_events(env, metadata_fetch=lambda t: evolved)
    spec = reg.get("fixtures.cdc_typed_all")
    assert spec.version == 1  # bumped, not cleared (narrows readme.md:54 window)
    assert [c.name for c in spec.columns] == ["id", "c_vchar", "c_new"]
    typed = reg.typed_view(env, "fixtures.cdc_typed_all")
    post_ddl = [r for r in typed.collect() if r.id == 100][0]
    assert post_ddl.c_new == "x"  # post-DDL insert decodes the new column


def test_snapshot_bootstrap_then_stream(spark, tmp_path):
    """dump-then-stream: snapshot rows apply first, changes win after."""
    snap = spark.createDataFrame(
        [(1, "snap1", 0), (5, "snap5", 0), (77, "snap77", 0)],
        "id long, c_vchar string, c_int int",
    )
    snap_changes = snapshot_as_changes(
        snap, "fixtures", "cdc_typed_all", snapshot_ts="2018-04-19 00:00:00"
    )
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=False)
    stream_changes = read_changelog(spark, str(log)).filter(
        F.col("table") == "cdc_typed_all"
    )
    unioned = bootstrap_union(snap_changes, stream_changes)
    env = to_envelopes(unioned)
    # snapshot coordinates sort first → lowest event_index
    first = env.orderBy("event_index").limit(3).collect()
    assert all(e.binlog_file == "" for e in first)
    target = str(tmp_path / "table")
    upsert_parquet(env, target, pk="id")
    final = {r._pk: dict(r.row) for r in spark.read.parquet(target).collect()}
    assert final[pk_str("77")]["c_vchar"] == "snap77"  # untouched snapshot row survives
    assert final[pk_str("1")]["c_vchar"] == "row1v2"   # stream update beats snapshot
    assert pk_str("5") not in final                    # stream delete beats snapshot


def test_decode_column_modern_mysql_and_edge_types(spark):
    """MySQL 8.0.19+ integer types without display widths must still
    classify (not fall through to string); ENUM/SET labels keep their
    original case; decimal(p) without a scale keeps its precision."""
    # unsigned values arrive on the wire in their SIGNED representation
    # (the binlog row image); widening maps them back
    df = spark.createDataFrame(
        [("-1", "4294967295", "2", "3", "12345678901234567890")],
        "u64: string, u32: string, e: string, s: string, d: string",
    ).select(
        decode_column(F.col("u64"), "bigint unsigned").alias("u64"),
        decode_column(F.col("u32"), "int unsigned").alias("u32"),
        decode_column(F.col("e"), "enum('Active','Disabled')").alias("e"),
        decode_column(F.col("s"), "set('Read','Write')").alias("s"),
        decode_column(F.col("d"), "decimal(20)").alias("d"),
    )
    row = df.collect()[0]
    assert dict(df.dtypes)["u64"] == "decimal(20,0)"
    assert str(row.u64) == "18446744073709551615"
    assert row.u32 == 4294967295 and dict(df.dtypes)["u32"] == "bigint"
    assert row.e == "Disabled"          # original case preserved
    assert row.s == "Read,Write"        # bitmask 3 → both labels
    assert str(row.d) == "12345678901234567890"  # no (10,0) shrink
