"""S5 stateful streaming: state persists across micro-batches and across
query restarts on the same checkpoint."""

from __future__ import annotations

import json

import pytest

try:
    import google.protobuf  # noqa: F401

    _HAS_PROTOBUF = True
except ImportError:
    _HAS_PROTOBUF = False

from wing_binlog_go_spark.streaming.stateful import running_event_counts, sessionize
from tests.streamwait import await_done


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def test_running_counts_across_restart(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [{"full_table": "db.t1"}, {"full_table": "db.t1"},
                                   {"full_table": "db.t2"}])
    schema = "full_table string"
    out: list = []

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            running_event_counts(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)
    run()
    got = {(r.key): r.running_total for r in out}
    assert got == {"db.t1": 2, "db.t2": 1}
    # restart with more data on the SAME checkpoint → totals continue
    _write_jsonl(src / "b.jsonl", [{"full_table": "db.t1"}] * 3)
    out.clear()
    run()
    got2 = {(r.key): r.running_total for r in out}
    assert got2["db.t1"] == 5  # 2 carried in state + 3 new


def test_sessionize_closes_on_gap(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(
        src / "a.jsonl",
        [
            {"user_id": 7, "ts": "2024-01-01T00:00:00.000Z"},
            {"user_id": 7, "ts": "2024-01-01T00:10:00.000Z"},
        ],
    )
    schema = "user_id long, ts timestamp"
    out: list = []

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            sessionize(stream, gap_seconds=1800)
            .writeStream.foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)
    run()
    assert out == []  # session still open
    # next batch 31 minutes later closes the first session
    _write_jsonl(src / "b.jsonl", [{"user_id": 7, "ts": "2024-01-01T00:41:00.000Z"}])
    run()
    assert len(out) == 1
    s = out[0]
    assert s.key == 7 and s.n_events == 2
    assert s.session_end - s.session_start == 600


@pytest.mark.skipif(
    not _HAS_PROTOBUF,
    reason="transformWithState needs protobuf (state-server protocol); not in env",
)
def test_running_counts_tws_across_restart(spark, tmp_path):
    """transformWithState form: same continuity contract as the classic
    API — state survives a restart on the same checkpoint."""
    from wing_binlog_go_spark.streaming.stateful import running_event_counts_tws

    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [{"full_table": "db.t1"}, {"full_table": "db.t1"},
                                   {"full_table": "db.t2"}])
    schema = "full_table string"
    out: list = []

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        q = (
            running_event_counts_tws(stream)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)
    run()
    got = {r.key: r.running_total for r in out}
    assert got == {"db.t1": 2, "db.t2": 1}
    _write_jsonl(src / "b.jsonl", [{"full_table": "db.t1"}] * 3)
    out.clear()
    run()
    got2 = {r.key: r.running_total for r in out}
    assert got2["db.t1"] == 5
