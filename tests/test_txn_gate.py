"""Transaction-atomic visibility: a batch never exposes part of a
transaction; held rows survive the batch boundary (and restarts — state
store) and release when the commit marker arrives."""

from __future__ import annotations

import json

from wing_binlog_go_spark.sources.changelog import fixture_records
from wing_binlog_go_spark.streaming.txn import gate_drain_conf, txn_gate
from tests.streamwait import await_done


def _write_jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r, default=str) + "\n")


def test_txn_gate_holds_split_transaction_until_commit(spark, tmp_path):
    from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA

    src = tmp_path / "src"
    src.mkdir()
    recs = fixture_records()
    f1 = [r for r in recs if r["binlog_file"] == "mysql-bin.000003"]
    f2 = [r for r in recs if r["binlog_file"] == "mysql-bin.000004"]
    # the fixture's final transaction splits across the two files:
    # split-a (no xid) in f1, split-b (xid) in f2
    split_gtid = f1[-1]["gtid"]
    assert f1[-1]["after"]["c_vchar"] == "split-a" and not f1[-1]["xid_commit"]
    assert f2[0]["gtid"] == split_gtid and f2[0]["xid_commit"]

    _write_jsonl(src / "a.jsonl", f1)
    batches: list = []

    def run():
        stream = spark.readStream.schema(CHANGE_SCHEMA).json(str(src))
        with gate_drain_conf(spark):
            q = (
                txn_gate(stream)
                .writeStream.outputMode("append")
                .foreachBatch(lambda df, bid: batches.append(df.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
        await_done(q)
    run()
    released_1 = [r for b in batches for r in b]
    gtids_1 = {r.gtid for r in released_1}
    # every completed transaction released; the split one held back
    assert split_gtid not in gtids_1
    vals = {r.after.get("c_vchar") for r in released_1 if r.after}
    assert "split-a" not in vals
    assert {"row1", "row2", "row3", "committed", "post-ddl"} <= vals
    # DDL is its own implicit commit and must not be held
    assert any(r.action == "ddl" for r in released_1)

    # commit arrives (restart on the same checkpoint = held state reloads)
    _write_jsonl(src / "b.jsonl", f2)
    batches.clear()
    run()
    released_2 = [r for b in batches for r in b]
    got = {r.after.get("c_vchar") for r in released_2 if r.after}
    # BOTH halves of the split transaction release together, atomically
    assert {"split-a", "split-b"} <= got
    assert {r.gtid for r in released_2} == {split_gtid}


def test_txn_gate_passes_null_gtid_through(spark, tmp_path):
    from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA

    src = tmp_path / "src"
    src.mkdir()
    rec = {
        "binlog_file": "f", "binlog_pos": 1, "xid_commit": False,
        "database": "d", "table": "t", "action": "insert", "row_no": 0,
        "before": None, "after": {"id": "1"}, "ddl_query": None,
        "ts_header": "2020-01-01 00:00:00", "gtid": None,
    }
    _write_jsonl(src / "a.jsonl", [rec])
    out: list = []
    stream = spark.readStream.schema(CHANGE_SCHEMA).json(str(src))
    with gate_drain_conf(spark):
        q = (
            txn_gate(stream)
            .writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: out.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
    await_done(q)
    assert len(out) == 1 and out[0].after["id"] == "1"


def test_pipeline_with_txn_atomic_routes_see_closed_transactions(spark, tmp_path):
    """run_pipeline(txn_atomic=True): the route's envelopes never include
    a transaction whose commit hasn't arrived; once it arrives, both
    halves appear and event_index stays gapless in coordinate order."""
    from wing_binlog_go_spark.sources.changelog import fixture_records
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import collecting_writer

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    recs = fixture_records()
    f1 = [r for r in recs if r["binlog_file"] == "mysql-bin.000003"]
    f2 = [r for r in recs if r["binlog_file"] == "mysql-bin.000004"]
    _write_jsonl(log_dir / "a.jsonl", f1)
    got: list = []

    def run():
        q = run_pipeline(
            spark,
            str(log_dir),
            [Route("m", collecting_writer(got))],
            str(tmp_path / "ckpt"),
            txn_atomic=True,
        )
        await_done(q)
    run()
    env_1 = sorted((json.loads(p) for _, p in got), key=lambda e: e["event_index"])
    texts_1 = {
        (e.get("event", {}).get("data") or {}).get("c_vchar") for e in env_1
    }
    assert "split-a" not in texts_1
    n_first = len(env_1)
    assert [e["event_index"] for e in env_1] == list(range(1, n_first + 1))

    _write_jsonl(log_dir / "b.jsonl", f2)
    got.clear()
    run()
    env_2 = sorted((json.loads(p) for _, p in got), key=lambda e: e["event_index"])
    texts_2 = [
        (e.get("event", {}).get("data") or {}).get("c_vchar") for e in env_2
    ]
    assert texts_2 == ["split-a", "split-b"]  # coordinate order preserved
    assert [e["event_index"] for e in env_2] == [n_first + 1, n_first + 2]


def test_txn_gate_times_out_commitless_transaction_loudly(spark, tmp_path):
    """A transaction whose commit marker was malformed (xid_commit
    parsed to NULL) must not strand in keyed state forever: after
    hold_timeout_ms it releases un-closed (visibly wrong beats silently
    absent + unbounded state)."""
    import time

    from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA

    src = tmp_path / "src"
    src.mkdir()
    base = fixture_records()[0]
    orphan = dict(base)
    orphan.update(
        gtid="3e11fa47-71ca-11e1-9e33-c80aa9429562:999",
        xid_commit=None,  # the malformed-marker shape PERMISSIVE yields
        after={"id": "900", "c_vchar": "orphan", "c_int": "1"},
    )
    _write_jsonl(src / "a.jsonl", [orphan])
    batches: list = []

    def run():
        stream = spark.readStream.schema(CHANGE_SCHEMA).json(str(src))
        with gate_drain_conf(spark):
            q = (
                txn_gate(stream, hold_timeout_ms=1500)
                .writeStream.outputMode("append")
                .foreachBatch(lambda df, bid: batches.append(df.collect()))
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
        await_done(q)
    # (the HOLD behavior at the default 10-minute timeout is covered by
    # test_txn_gate_holds_split_transaction_until_commit; here the
    # short timeout may fire within the first availableNow run itself)
    run()
    released = {r.after.get("c_vchar") for b in batches for r in b if r.after}
    if "orphan" not in released:
        time.sleep(2.5)  # let the processing-time timeout expire
        # a later batch (any data) fires expired timeouts
        tick = dict(base)
        tick.update(
            gtid=None, after={"id": "901", "c_vchar": "tick", "c_int": "1"}
        )
        _write_jsonl(src / "b.jsonl", [tick])
        batches.clear()
        run()
        released = {
            r.after.get("c_vchar") for b in batches for r in b if r.after
        }
    assert "orphan" in released  # released despite the missing commit
