"""Partition-planned binlog DataSource (O1/O2): offset-aware file
skipping (only new bytes are planned into partitions), torn-line
clamping, and GTID set restart (StartFromGTID, canal.go:180-184)."""

from __future__ import annotations

import json

from wing_binlog_go_spark.sources.binlog import (
    BinlogDataSource,
    GtidSet,
    _complete_size,
    _plan_partitions,
)
from wing_binlog_go_spark.sources.changelog import (
    fixture_records,
    write_fixture_changelog,
)
from tests.streamwait import await_done


def test_gtid_set_parse_and_contains():
    s = GtidSet("3E11FA47-71CA-11E1-9E33-C80AA9429562:1-5:9, aaaa:3")
    u = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
    assert s.contains(f"{u}:1") and s.contains(f"{u}:5") and s.contains(f"{u}:9")
    assert not s.contains(f"{u}:6") and not s.contains(f"{u}:10")
    assert s.contains("AAAA:3") and not s.contains("aaaa:4")
    assert not s.contains(None) and not s.contains("garbage")


def test_partition_planning_reads_only_new_bytes(tmp_path):
    start = {"files": {"a.jsonl": 100}}
    end = {"files": {"a.jsonl": 250, "b.jsonl": 40}}
    parts = _plan_partitions(start, end, None)
    assert [(p.fname, p.start, p.end) for p in parts] == [
        ("a.jsonl", 100, 250),
        ("b.jsonl", 0, 40),
    ]
    # nothing grew → no partitions, no reads at all
    assert _plan_partitions(end, end, None) == []


def test_complete_size_clamps_torn_trailing_line(tmp_path):
    p = tmp_path / "log.jsonl"
    full = json.dumps({"k": 1}) + "\n"
    p.write_text(full + '{"k": 2, "torn')  # writer mid-append
    assert _complete_size(str(p)) == len(full)
    p.write_text(full + json.dumps({"k": 2}) + "\n")
    assert _complete_size(str(p)) == len(p.read_bytes())


def test_stream_resumes_without_rereading_and_sees_appends(spark, tmp_path):
    """Offset-aware skipping end-to-end: run 1 consumes the directory;
    an append arrives; run 2 on the same checkpoint emits ONLY the new
    record."""
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=True)
    spark.dataSource.register(BinlogDataSource)
    out: list = []

    def run():
        q = (
            spark.readStream.format("binlog")
            .option("path", str(log))
            .load()
            .writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)
    run()
    n_fixture = len(fixture_records())
    assert len(out) == n_fixture
    # append one more record to an existing file
    extra = dict(fixture_records()[0])
    extra.update(binlog_file="mysql-bin.000004", binlog_pos=999, row_no=0,
                 after={"id": "500", "c_vchar": "appended", "c_int": "1"})
    with open(log / "mysql-bin.000004.jsonl", "a") as f:
        f.write(json.dumps(extra) + "\n")
    out.clear()
    run()
    assert len(out) == 1 and out[0].after["id"] == "500"


def test_start_gtid_skips_contained_transactions(spark, tmp_path):
    """StartFromGTID semantics: transactions inside the starting set are
    already applied downstream and must not be re-emitted."""
    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=True)
    recs = fixture_records()
    uuid = recs[0]["gtid"].split(":")[0]
    # exclude the first two transactions
    spark.dataSource.register(BinlogDataSource)
    df = (
        spark.read.format("binlog")
        .option("path", str(log))
        .option("start_gtid", f"{uuid}:1-2")
        .load()
    )
    got = df.collect()
    kept = [r for r in recs if int(r["gtid"].split(":")[1]) > 2]
    assert len(got) == len(kept)
    assert {r.gtid for r in got} == {r["gtid"] for r in kept}
    # streaming path honors it too
    out: list = []
    q = (
        spark.readStream.format("binlog")
        .option("path", str(log))
        .option("start_gtid", f"{uuid}:1-2")
        .load()
        .writeStream.foreachBatch(lambda d, b: out.extend(d.collect()))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    assert len(out) == len(kept)


def test_invalid_gtid_set_fails_loudly(spark, tmp_path):
    import pytest

    log = tmp_path / "log"
    write_fixture_changelog(str(log), split_files=True)
    from wing_binlog_go_spark.sources.binlog import BinlogStreamReader

    with pytest.raises(ValueError):
        BinlogStreamReader({"path": str(log), "start_gtid": "no-intervals-here"})


def test_batch_read_of_empty_changelog_dir_returns_zero_rows(spark, tmp_path):
    """pyspark substitutes [None] when partitions() returns [] — the
    reader must treat that as an empty scan, not crash on partition.fname."""
    from wing_binlog_go_spark.sources.binlog import BinlogDataSource

    empty = tmp_path / "changelog"
    empty.mkdir()
    spark.dataSource.register(BinlogDataSource)
    df = spark.read.format("binlog").option("path", str(empty)).load()
    assert df.count() == 0


def test_complete_size_scans_past_window_sized_torn_line(tmp_path):
    """A torn trailing line longer than the 1 MiB scan window must clamp
    to the last complete line, not to 0 (offset regression → replay)."""
    from wing_binlog_go_spark.sources.binlog import _complete_size

    p = tmp_path / "big.jsonl"
    complete = b'{"a": 1}\n'
    torn = b'{"big": "' + b"x" * (3 << 20)  # 3 MiB, no newline
    p.write_bytes(complete + torn)
    assert _complete_size(str(p)) == len(complete)


def test_read_range_names_removed_or_shrunk_file(tmp_path):
    """Append-only contract violations must fail loudly BY NAME, not as
    a generic IOError or a silent short read (ADVICE r2)."""
    import pytest

    from wing_binlog_go_spark.sources.binlog import _read_range

    with pytest.raises(RuntimeError, match="removed.*append-only"):
        list(_read_range(str(tmp_path), "gone.jsonl", 0, 100, None))

    p = tmp_path / "short.jsonl"
    p.write_bytes(b'{"a":1}\n')
    with pytest.raises(RuntimeError, match="shrank.*append-only"):
        list(_read_range(str(tmp_path), "short.jsonl", 0, 4096, None))


def test_to_tuple_converts_nonutc_offsets_to_utc():
    """A +08:00 ts_header must decode to the same naive-UTC instant as
    its Z form (stripping the zone without converting would shift the
    event time by the offset)."""
    from wing_binlog_go_spark.sources.binlog import _to_tuple

    base = {"binlog_file": "f", "binlog_pos": 4, "database": "d",
            "table": "t", "action": "insert"}
    z = _to_tuple({**base, "ts_header": "2018-04-19T05:21:27.000Z"})
    offset = _to_tuple({**base, "ts_header": "2018-04-19T13:21:27.000+08:00"})
    assert z[10] == offset[10]
    assert str(z[10]) == "2018-04-19 05:21:27"
    # unparseable timestamp → NULL, not a dead stream
    bad = _to_tuple({**base, "ts_header": "not-a-time"})
    assert bad[10] is None


def test_malformed_changelog_line_dead_letters_instead_of_killing_stream(
    spark, tmp_path
):
    """A garbage line in the changelog must become a dead-letter row
    (the all-null record run_pipeline's validity filter captures), not
    a permanently failing task: valid events around it still flow."""
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import collecting_writer

    log = tmp_path / "log"
    log.mkdir()
    good = fixture_records()[0]
    with open(log / "mysql-bin.000001.jsonl", "w") as f:
        f.write(json.dumps(good) + "\n")
        f.write("this is { not json at all\n")
        f.write(json.dumps({"no_coordinates": True}) + "\n")
        f.write(json.dumps(dict(good, binlog_pos=77, row_no=1)) + "\n")
    store: list = []
    dl = str(tmp_path / "dead")
    q = run_pipeline(
        spark,
        str(log),
        [Route("rec", collecting_writer(store))],
        str(tmp_path / "ckpt"),
        source="binlog",
        dead_letter_dir=dl,
    )
    await_done(q)
    assert len(store) == 2  # both valid records survived the garbage
    dead = spark.read.parquet(dl)
    assert dead.count() == 2  # the non-JSON line + the coordinate-less one
