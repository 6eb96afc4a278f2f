"""Envelope shaping + decode-rule semantics (reference parity):
handler.go:113-184 event shapes, util.go:61-146 field decode,
service/util.go:9-22 filter matching."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.envelope import (
    decode_date,
    decode_enum,
    decode_set,
    decode_year,
    envelope_json,
    match_filters,
    parse_envelope_json,
    table_filter,
    to_envelopes,
    widen_unsigned,
)
from wing_binlog_go_spark.sources.changelog import (
    fixture_records,
    read_changelog,
    write_fixture_changelog,
)


@pytest.fixture(scope="module")
def changes(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("changelog")
    write_fixture_changelog(str(d), split_files=False)
    return read_changelog(spark, str(d)).cache()


@pytest.fixture(scope="module")
def envelopes(changes):
    return to_envelopes(changes).orderBy("event_index").collect()


def test_multirow_insert_explodes_with_consecutive_indexes(envelopes):
    # 3-row insert (one statement) → 3 envelopes, consecutive event_index
    first3 = envelopes[:3]
    assert [e.event_type for e in first3] == ["insert"] * 3
    assert [e.event_index for e in first3] == [1, 2, 3]
    assert first3[0].event.data["c_vchar"] == "row1"
    assert first3[2].event.data["c_vchar"] == "row3"


def test_update_carries_old_and_new(envelopes):
    upds = [e for e in envelopes if e.event_type == "update"]
    assert len(upds) == 2
    assert upds[0].event.old_data["c_vchar"] == "row1"
    assert upds[0].event.new_data["c_vchar"] == "row1v2"
    assert upds[0].event.data is None


def test_delete_carries_removed_row(envelopes):
    d = [e for e in envelopes if e.event_type == "delete"][0]
    assert d.event.data == {"id": "5", "c_vchar": "gone"}
    assert d.event.old_data is None


def test_ddl_becomes_alter_without_event(envelopes):
    a = [e for e in envelopes if e.event_type == "alter"][0]
    assert a.table == "cdc_typed_all"
    assert a.event.data is None and a.event.old_data is None


def test_event_index_is_dense_and_deterministic(changes):
    idx = [e.event_index for e in to_envelopes(changes).orderBy("event_index").collect()]
    assert idx == list(range(1, len(fixture_records()) + 1))
    # re-running the transform yields identical indexes (replay safety)
    idx2 = [e.event_index for e in to_envelopes(changes).orderBy("event_index").collect()]
    assert idx == idx2


def test_index_base_offsets(changes):
    idx = [e.event_index for e in to_envelopes(changes, index_base=100).orderBy("event_index").collect()]
    assert idx[0] == 101


def test_to_envelopes_counted_callable_base(changes, spark):
    # single-pass contract (streaming.pipeline): the count comes out of
    # the dense-index job itself, and a callable base receives it BEFORE
    # the final index column is built — no separate count() job.
    from wing_binlog_go_spark.functions.envelope import to_envelopes_counted

    expected = len(fixture_records())
    seen: list[int] = []

    def base_fn(total: int) -> int:
        seen.append(total)
        return 1000

    env, n = to_envelopes_counted(changes, index_base=base_fn)
    assert n == expected
    assert seen == [expected]  # called exactly once, with the batch count
    idx = [e.event_index for e in env.orderBy("event_index").collect()]
    assert idx == list(range(1001, 1001 + expected))

    # empty input: the callable is never invoked, n is 0
    empty, n0 = to_envelopes_counted(
        changes.filter(F.lit(False)), index_base=seen.append
    )
    assert n0 == 0 and len(seen) == 1
    assert empty.count() == 0


def test_time_is_unix_seconds(envelopes):
    # 2018-04-19 05:21:27 UTC = 1524115287 (examples/subscribe.php payload)
    assert envelopes[0].time == 1524115287


def test_envelope_json_wire_shape(spark, changes):
    env = to_envelopes(changes)
    rows = {
        r.event_type: json.loads(r.j)
        for r in env.select("event_type", envelope_json().alias("j")).collect()
    }
    ins = rows["insert"]
    assert set(ins) == {"database", "table", "event_type", "time", "event_index", "event"}
    assert isinstance(ins["event"]["data"], dict) and "old_data" not in ins["event"]["data"]
    upd = rows["update"]
    assert set(upd["event"]["data"]) == {"old_data", "new_data"}
    alt = rows["alter"]
    assert "event" not in alt  # handler.go:101-110: alter has no event field


def test_envelope_json_roundtrip(spark, changes):
    env = to_envelopes(changes).filter(F.col("event_type") == "insert")
    back = env.select(parse_envelope_json(envelope_json()).alias("e")).select("e.*")
    orig = env.select("database", "table", "event_type", "time", "event_index",
                      F.col("event.data").alias("d")).orderBy("event_index").collect()
    rt = back.select("database", "table", "event_type", "time", "event_index",
                     F.col("event.data").alias("d")).orderBy("event_index").collect()
    assert orig == rt


# ---------------------------------------------------------------------------
# decode rules (util.go:61-146) — the FIXTURES §2 type-edge cases
# ---------------------------------------------------------------------------


def test_unsigned_widening(spark):
    df = spark.createDataFrame(
        [(-1, -1, -1, -1), (5, 5, 5, 5), (-128, -32768, -2147483648, None)],
        "t8 int, t16 int, t32 long, t64 long",
    )
    rows = df.select(
        widen_unsigned("t8", 8).alias("u8"),
        widen_unsigned("t16", 16).alias("u16"),
        widen_unsigned("t32", 32).alias("u32"),
        widen_unsigned("t64", 64).alias("u64"),
    ).collect()
    assert (rows[0].u8, rows[0].u16, rows[0].u32) == (255, 65535, 4294967295)
    assert int(rows[0].u64) == 18446744073709551615  # uint64 wrap of -1
    assert (rows[1].u8, rows[1].u16, rows[1].u32, int(rows[1].u64)) == (5, 5, 5, 5)
    assert (rows[2].u8, rows[2].u16, rows[2].u32) == (128, 32768, 2147483648)


def test_enum_set_decode(spark):
    df = spark.createDataFrame(
        [(1, 0), (3, 1), (0, 5), (2, 7)], "e int, s long"
    )
    rows = df.select(
        decode_enum("e", ["a", "b", "c"]).alias("e"),
        decode_set("s", ["x", "y", "z"]).alias("s"),
    ).collect()
    assert [r.e for r in rows] == ["a", "c", "", "b"]  # 1-based; 0 → ""
    assert [r.s for r in rows] == ["", "x", "x,z", "x,y,z"]  # bitmask → CSV


def test_zero_date_and_year(spark):
    df = spark.createDataFrame(
        [("0000-00-00", 0), ("2024-02-29", 95), ("1970-01-01", 124)],
        "d string, y int",
    )
    rows = df.select(decode_date("d").alias("d"), decode_year("y").alias("y")).collect()
    assert rows[0].d is None and rows[0].y == 0
    assert str(rows[1].d) == "2024-02-29" and rows[1].y == 1995
    assert rows[2].y == 2024


# ---------------------------------------------------------------------------
# filters (O6/O12)
# ---------------------------------------------------------------------------


def test_match_filters_semantics(spark, changes):
    env = to_envelopes(changes)
    # empty filter list ⇒ match-all (service/util.go:14-16)
    assert env.filter(match_filters("full_table", [])).count() == env.count()
    # OR of regexes; SUBJECT matched lowercase (subscribe/node.go:44-53
    # lowercases topics, so patterns are expected lowercase; an
    # uppercase literal in a pattern therefore never matches — and the
    # pattern is NOT lowercased, which would corrupt \D-style classes)
    only = env.filter(match_filters("full_table", [r"^fixtures\.cdc_.*$"]))
    assert only.select("full_table").distinct().collect()[0].full_table == "fixtures.cdc_typed_all"
    upper = env.filter(match_filters("full_table", [r"^FIXTURES\.cdc_.*$"]))
    assert upper.count() == 0


def test_table_include_exclude(spark, changes):
    env = to_envelopes(changes)
    kept = table_filter(env, include=["^fixtures\\..*"], exclude=[".*\\.other_table$"])
    tables = {r.full_table for r in kept.select("full_table").distinct().collect()}
    assert tables == {"fixtures.cdc_typed_all"}


def test_decode_enum_and_set_preserve_null(spark):
    """SQL NULL ordinal/bitmask must stay NULL — conflating nil with
    the zero value ('' / empty set) is a go-mysql semantic the decoders
    mirror (util.go:96-113 never receives nil; our columns can)."""
    df = spark.createDataFrame(
        [(None, None), (0, 0), (2, 3)], "e: int, s: int"
    ).select(
        decode_enum("e", ["a", "b", "c"]).alias("e"),
        decode_set("s", ["x", "y", "z"]).alias("s"),
    )
    rows = df.collect()
    assert (rows[0].e, rows[0].s) == (None, None)
    assert (rows[1].e, rows[1].s) == ("", "")
    assert (rows[2].e, rows[2].s) == ("b", "x,y")


def test_running_total_partitioned_on_boolean_key(spark):
    """Non-string partition keys: the driver-side offset map must be
    keyed by SPARK's string form, not Python's str() ('true' vs 'True'
    would make element_at miss and NULL the whole output)."""
    from wing_binlog_go_spark.functions.envelope import with_running_total

    df = spark.createDataFrame(
        [(True, 1, 10), (True, 2, 20), (False, 3, 5), (False, 4, 7)],
        "flag: boolean, o: long, v: long",
    )
    out = {
        (r.flag, r.o): r._running
        for r in with_running_total(
            df, ["o"], F.col("v"), partition_cols=["flag"]
        ).collect()
    }
    assert out == {
        (True, 1): 10, (True, 2): 30, (False, 3): 5, (False, 4): 12,
    }
