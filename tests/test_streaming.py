"""Streaming pipeline e2e (SURVEY §5.2 items 2 & 5): availableNow runs of
the CDC pipeline, route fan-out, event_index continuity across restart,
upsert materialization, custom binlog DataSource, and the S1-S7 windowed
analytics surface."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA
from wing_binlog_go_spark.sources.binlog import BinlogDataSource
from wing_binlog_go_spark.sources.changelog import (
    fixture_records,
    write_fixture_changelog,
)
from wing_binlog_go_spark.streaming.pipeline import (
    Route,
    pk_str,
    run_pipeline,
    upsert_parquet,
)
from wing_binlog_go_spark.streaming.sinks import collecting_writer, jsonl_route_writer
from wing_binlog_go_spark.streaming.windows import (
    session_counts,
    tumbling_counts,
)
from tests.streamwait import await_done


def test_pipeline_fanout_and_filters(spark, tmp_path):
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    all_events: list = []
    typed_only: list = []
    routes = [
        Route("all", collecting_writer(all_events)),  # empty filters ⇒ match-all
        Route("typed", collecting_writer(typed_only), filters=[r"^fixtures\.cdc_.*$"]),
    ]
    q = run_pipeline(
        spark, str(log_dir), routes, checkpoint_dir=str(tmp_path / "ckpt"),
        exclude=[r"^ignored_db\..*"],
    )
    await_done(q)
    n_fixture = len(fixture_records())
    assert len(all_events) == n_fixture - 1  # ignored_db excluded pre-decode
    payloads = [json.loads(p) for _, p in typed_only]
    assert {p["table"] for p in payloads} == {"cdc_typed_all"}
    # multicast: typed route events are a subset of the all route (O13)
    assert {p for _, p in typed_only} <= {p for _, p in all_events}


def test_pipeline_index_continuity_across_restart(spark, tmp_path):
    log_dir = tmp_path / "log"
    ckpt = str(tmp_path / "ckpt")
    log_dir.mkdir()
    # first file only
    recs = fixture_records()
    f1 = [r for r in recs if r["binlog_file"] == "mysql-bin.000003"]
    f2 = [r for r in recs if r["binlog_file"] == "mysql-bin.000004"]
    with open(log_dir / "a.jsonl", "w") as f:
        for r in f1:
            f.write(json.dumps(r) + "\n")
    got: list = []
    q = run_pipeline(spark, str(log_dir), [Route("m", collecting_writer(got))], ckpt)
    await_done(q)
    idx_first = [json.loads(p)["event_index"] for _, p in got]
    assert idx_first == list(range(1, len(f1) + 1))
    # "restart": new file arrives, new query same checkpoint
    with open(log_dir / "b.jsonl", "w") as f:
        for r in f2:
            f.write(json.dumps(r) + "\n")
    got2: list = []
    q2 = run_pipeline(spark, str(log_dir), [Route("m", collecting_writer(got2))], ckpt)
    await_done(q2)
    idx_second = [json.loads(p)["event_index"] for _, p in got2]
    # continues after the persisted base — no reuse, no gaps (O10/O11)
    assert idx_second == list(range(len(f1) + 1, len(f1) + len(f2) + 1))


def test_upsert_materialization(spark, tmp_path):
    """insert/update/delete sequence → final table state (O25/S8)."""
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    target = str(tmp_path / "table")

    def materialize(env, batch_id):
        upsert_parquet(
            env.filter(F.col("full_table") == "fixtures.cdc_typed_all"), target, pk="id"
        )

    q = run_pipeline(
        spark, str(log_dir), [Route("mat", materialize)], str(tmp_path / "ckpt")
    )
    await_done(q)
    final = {r._pk: r.row for r in spark.read.parquet(target).collect()}
    # id=1,2 updated to v2; id=3 plain; id=5 deleted; 99,100,200,201 inserted
    assert final[pk_str("1")]["c_vchar"] == "row1v2"
    assert final[pk_str("2")]["c_vchar"] == "row2v2"
    assert final[pk_str("3")]["c_vchar"] == "row3"
    assert pk_str("5") not in final
    assert final[pk_str("100")]["c_new"] == "x"
    assert set(final) == {pk_str(k) for k in ("1", "2", "3", "99", "100", "200", "201")}


def test_upsert_replay_is_idempotent(spark, tmp_path):
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    target = str(tmp_path / "table")
    from wing_binlog_go_spark.functions.envelope import to_envelopes
    from wing_binlog_go_spark.sources.changelog import read_changelog

    env = to_envelopes(read_changelog(spark, str(log_dir)))

    def snapshot():
        return sorted(
            ((r._pk, r.row, r.event_index) for r in spark.read.parquet(target).collect()),
            key=lambda t: (str(t[0]), t[2]),
        )

    upsert_parquet(env, target, pk="id")
    state1 = snapshot()
    upsert_parquet(env, target, pk="id")  # replay the same batch (O19)
    assert snapshot() == state1


def test_binlog_datasource_batch_and_stream(spark, tmp_path):
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=True)
    spark.dataSource.register(BinlogDataSource)
    # batch read
    df = spark.read.format("binlog").option("path", str(log_dir)).load()
    assert df.schema == CHANGE_SCHEMA
    assert df.count() == len(fixture_records())
    # streaming read with checkpointed offsets
    out: list = []

    def sink(batch_df, batch_id):
        out.extend(batch_df.collect())

    q = (
        spark.readStream.format("binlog")
        .option("path", str(log_dir))
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    assert len(out) == len(fixture_records())
    # ordered by binlog coordinates (file, pos, row)
    coords = [(r.binlog_file, r.binlog_pos, r.row_no) for r in out]
    assert coords == sorted(coords)


def test_pipeline_over_binlog_source(spark, tmp_path):
    """Full path: custom DataSource → envelopes → routed sink."""
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=True)
    got: list = []
    q = run_pipeline(
        spark,
        str(log_dir),
        [Route("m", collecting_writer(got))],
        str(tmp_path / "ckpt"),
        source="binlog",
    )
    await_done(q)
    payloads = [json.loads(p) for _, p in got]
    assert len(payloads) == len(fixture_records())
    idx = sorted(p["event_index"] for p in payloads)
    assert idx == list(range(1, len(payloads) + 1))


def test_binlog_datasource_mysql_hook_fails_loudly(spark, tmp_path):
    from wing_binlog_go_spark.sources.binlog import BinlogStreamReader

    with pytest.raises(NotImplementedError):
        BinlogStreamReader({"path": str(tmp_path), "mysql_host": "db.example"})


# ---------------------------------------------------------------------------
# S1-S7 windowed analytics (golden values computed offline)
# ---------------------------------------------------------------------------


@pytest.fixture()
def late_events(spark):
    rows = [
        # (event_id, ts, user_id, event_type, value, props)
        (1, "2024-01-01 00:01:00", 1, "a", 1.0, "{}"),
        (2, "2024-01-01 00:02:00", 1, "a", 2.0, "{}"),
        (3, "2024-01-01 00:07:00", 2, "a", 3.0, "{}"),
        (4, "2024-01-01 00:03:30", 1, "a", 4.0, "{}"),  # late but in watermark
        (5, "2024-01-01 00:12:00", 2, "a", 5.0, "{}"),
        (6, "2024-01-01 00:58:00", 1, "a", 6.0, "{}"),  # 29-min gap: same session?
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.to_timestamp("ts"))
    return df


def test_tumbling_counts_batch_semantics(late_events):
    got = {
        (str(r.win_start), r.cnt, r.sum_value)
        for r in tumbling_counts(late_events, window="5 minutes").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 3, 7.0),   # events 1,2,4
        ("2024-01-01 00:05:00", 1, 3.0),   # event 3
        ("2024-01-01 00:10:00", 1, 5.0),   # event 5
        ("2024-01-01 00:55:00", 1, 6.0),   # event 6
    }


def test_session_window_gap_boundary(spark):
    # gaps of exactly 29 vs 31 minutes around a 30-minute session gap
    rows = [
        (1, "2024-01-01 00:00:00", 7),
        (2, "2024-01-01 00:29:00", 7),   # 29 min later → same session
        (3, "2024-01-01 01:00:00", 7),   # 31 min later → NEW session
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    sess = session_counts(df, gap="30 minutes").orderBy("win_start").collect()
    assert [s.cnt for s in sess] == [2, 1]


def test_streaming_window_agg_with_watermark(spark, tmp_path, late_events):
    """Run tumbling agg as an actual stream with late rows (S1/S7)."""
    src = tmp_path / "events"
    src.mkdir()
    late_events.coalesce(1).write.mode("overwrite").json(str(src))
    stream = spark.readStream.schema(late_events.schema).json(str(src))
    agg = tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
    q = (
        agg.writeStream.format("memory")
        .queryName("tumbles")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    # append mode emits only windows sealed by the watermark: max ts 00:58
    # − 10 min = 00:48 ⇒ the 00:55 window stays open and is NOT emitted
    got = {
        (str(r.win_start), r.cnt) for r in spark.sql("SELECT * FROM tumbles").collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", 3),
        ("2024-01-01 00:05:00", 1),
        ("2024-01-01 00:10:00", 1),
    }


def test_stream_static_join_enrichment(spark, tmp_path):
    """S6: streaming events enriched against a static dimension."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "a.jsonl", "w") as f:
        for uid, v in [(1, 10.0), (2, 20.0), (99, 30.0)]:
            f.write(_json.dumps({"user_id": uid, "value": v}) + "\n")
    stream = spark.readStream.schema("user_id long, value double").json(str(src))
    dim = spark.createDataFrame([(1, "gold"), (2, "silver")], "user_id long, tier string")
    from wing_binlog_go_spark.streaming.windows import stream_static_join

    joined = stream_static_join(stream, dim, "user_id", "left")
    q = (
        joined.writeStream.format("memory")
        .queryName("enriched")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = {
        (r.user_id, r.tier)
        for r in spark.sql("SELECT user_id, tier FROM enriched").collect()
    }
    assert got == {(1, "gold"), (2, "silver"), (99, None)}


def test_stream_stream_interval_join(spark, tmp_path):
    """Two live streams joined on key within a time interval."""
    import json as _json

    from wing_binlog_go_spark.streaming.windows import stream_stream_interval_join

    lsrc, rsrc = tmp_path / "l", tmp_path / "r"
    lsrc.mkdir(), rsrc.mkdir()
    with open(lsrc / "a.jsonl", "w") as f:
        f.write(_json.dumps({"k": 1, "ts": "2024-01-01T00:10:00.000Z"}) + "\n")
        f.write(_json.dumps({"k": 2, "ts": "2024-01-01T00:10:00.000Z"}) + "\n")
    with open(rsrc / "a.jsonl", "w") as f:
        # k=1: one within 10 min, one too old; k=3: wrong key
        f.write(_json.dumps({"k": 1, "rts": "2024-01-01T00:05:00.000Z", "v": "in"}) + "\n")
        f.write(_json.dumps({"k": 1, "rts": "2024-01-01T23:55:00.000Z", "v": "old"}) + "\n")
        f.write(_json.dumps({"k": 3, "rts": "2024-01-01T00:09:00.000Z", "v": "other"}) + "\n")
    l = spark.readStream.schema("k long, ts timestamp").json(str(lsrc))
    r = spark.readStream.schema("k long, rts timestamp, v string").json(str(rsrc))
    joined = stream_stream_interval_join(l, r, "k", within="10 minutes")
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = [(r.k, r.v) for r in spark.sql("SELECT k, v FROM ssj").collect()]
    assert got == [(1, "in")]


def test_late_event_beyond_watermark_dropped(spark, tmp_path):
    """S7/FIXTURES §4: a row arriving after the watermark passed its
    window must be dropped. Two sequential runs on one checkpoint: run 1
    advances the watermark far past the victim window; run 2 delivers a
    too-late row for it."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    emitted: list = []

    def run():
        stream = spark.readStream.schema(schema).json(str(src))
        agg = tumbling_counts(stream, window="5 minutes", watermark="10 minutes")
        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(lambda df, bid: emitted.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        await_done(q)
    def write(name, rows):
        with open(src / name, "w") as f:
            for r in rows:
                f.write(_json.dumps(r) + "\n")

    write("a.jsonl", [
        {"event_id": 1, "ts": "2024-01-01T00:01:00.000Z", "user_id": 1,
         "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T02:00:00.000Z", "user_id": 1,
         "event_type": "a", "value": 1.0, "props": "{}"},  # watermark → 01:50
    ])
    run()
    # run 2: a row for the long-sealed 00:00 window — beyond watermark
    write("b.jsonl", [
        {"event_id": 3, "ts": "2024-01-01T00:02:00.000Z", "user_id": 1,
         "event_type": "a", "value": 99.0, "props": "{}"},
        {"event_id": 4, "ts": "2024-01-01T02:06:00.000Z", "user_id": 1,
         "event_type": "a", "value": 1.0, "props": "{}"},  # advances stream
    ])
    run()
    per_window: dict = {}
    for r in emitted:
        per_window.setdefault(str(r.win_start), []).append(r.cnt)
    # the 00:00 window was emitted once with cnt=1 and never revised:
    # the late event_id=3 was dropped, not merged or re-emitted
    assert per_window.get("2024-01-01 00:00:00") == [1]


def test_dedupe_within_watermark_stream(spark, tmp_path):
    """S4: duplicate event_index rows collapse to one (replay dedupe)."""
    rows = [
        {"event_index": 1, "ts": "2024-01-01T00:00:00.000Z", "v": "a"},
        {"event_index": 1, "ts": "2024-01-01T00:00:01.000Z", "v": "a-dup"},
        {"event_index": 2, "ts": "2024-01-01T00:00:02.000Z", "v": "b"},
    ]
    src = tmp_path / "src"
    src.mkdir()
    with open(src / "data.jsonl", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    schema = "event_index long, ts timestamp, v string"
    stream = spark.readStream.schema(schema).json(str(src))
    from wing_binlog_go_spark.streaming.windows import dedupe_within_watermark

    deduped = dedupe_within_watermark(stream, "ts", ["event_index"], "1 minute")
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    await_done(q)
    got = spark.sql("SELECT event_index FROM dedup ORDER BY event_index").collect()
    assert [r.event_index for r in got] == [1, 2]


def test_upsert_delta_matches_parquet_semantics(spark, tmp_path):
    """Delta MERGE materializer — activates when delta-spark exists;
    must produce the same final table as upsert_parquet on the fixture
    sequence (incl. PK-move tombstones and replay idempotence)."""
    pytest.importorskip("delta")
    from wing_binlog_go_spark.streaming.pipeline import upsert_delta

    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    target = str(tmp_path / "delta_table")

    def materialize(env, batch_id):
        upsert_delta(
            env.filter(F.col("full_table") == "fixtures.cdc_typed_all"),
            target,
            pk="id",
        )

    q = run_pipeline(
        spark, str(log_dir), [Route("mat", materialize)], str(tmp_path / "ckpt")
    )
    await_done(q)
    final = {r._pk: r.row for r in spark.read.format("delta").load(target).collect()}
    assert final[pk_str("1")]["c_vchar"] == "row1v2"
    assert pk_str("5") not in final
    assert set(final) == {pk_str(k) for k in ("1", "2", "3", "99", "100", "200", "201")}


def test_pipeline_max_files_per_trigger_controls_batching(spark, tmp_path):
    """The backpressure knob (O18) is honored: 4 changelog files at
    max_files_per_trigger=2 produce 2 non-empty micro-batches; at the
    default they collapse into 1."""
    import json as _json

    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi in range(4):
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            rec = {
                "binlog_file": f"mysql-bin.{fi:06d}", "binlog_pos": 4,
                "xid_commit": True, "database": "d", "table": "t",
                "action": "insert", "row_no": 0, "before": None,
                "after": {"id": str(fi)}, "ddl_query": None,
                "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
            }
            f.write(_json.dumps(rec) + "\n")

    seen: list[int] = []

    def recorder(env, batch_id):
        seen.append(env.count())

    q = run_pipeline(
        spark, str(log_dir), [Route("rec", recorder)],
        str(tmp_path / "ckpt2"), max_files_per_trigger=2,
    )
    await_done(q)
    assert sorted(seen) == [2, 2]

    seen.clear()
    q = run_pipeline(
        spark, str(log_dir), [Route("rec", recorder)], str(tmp_path / "ckpt10"),
    )
    await_done(q)
    assert seen == [4]


def test_pipeline_dead_letter_captures_malformed_records(spark, tmp_path):
    """Malformed lines (unparseable JSON → all-NULL PERMISSIVE rows,
    unknown actions, missing coordinates) land in the dead-letter table
    tagged with their batch; valid rows flow through with continuous
    event_index; nothing is silently dropped."""
    import json as _json

    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    good = {
        "binlog_file": "mysql-bin.000001", "binlog_pos": 4,
        "xid_commit": True, "database": "d", "table": "t",
        "action": "insert", "row_no": 0, "before": None,
        "after": {"id": "1"}, "ddl_query": None,
        "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
    }
    with open(log_dir / "f.jsonl", "w") as f:
        f.write(_json.dumps(good) + "\n")
        f.write("this is not json at all\n")  # → all-NULL row
        f.write(_json.dumps({**good, "binlog_pos": 8, "after": {"id": "2"}}) + "\n")
        f.write(_json.dumps({**good, "binlog_pos": 12, "action": "truncate"}) + "\n")
        f.write(_json.dumps({**good, "binlog_pos": None}) + "\n")

    captured = []

    def recorder(env, batch_id):
        captured.extend(env.select("event_index", "event_type").collect())

    dlq = str(tmp_path / "dlq")
    q = run_pipeline(
        spark, str(log_dir), [Route("rec", recorder)],
        str(tmp_path / "ckpt"), dead_letter_dir=dlq,
    )
    await_done(q)
    # two valid inserts, consecutive indexes (1-based within the batch)
    assert sorted(r.event_index for r in captured) == [1, 2]
    assert all(r.event_type == "insert" for r in captured)
    dead = spark.read.parquet(dlq)
    assert dead.count() == 3
    actions = sorted((r.action or "") for r in dead.collect())
    # corrupt line → all-NULL row; unknown action; null-pos insert
    assert actions == ["", "insert", "truncate"]
    assert "batch_id" in dead.columns  # partition column from the dir layout


def test_pipeline_without_dead_letter_keeps_old_behavior(spark, tmp_path):
    import json as _json

    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline

    log_dir = tmp_path / "log"
    log_dir.mkdir()
    rec = {
        "binlog_file": "mysql-bin.000001", "binlog_pos": 4,
        "xid_commit": True, "database": "d", "table": "t",
        "action": "insert", "row_no": 0, "before": None,
        "after": {"id": "1"}, "ddl_query": None,
        "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
    }
    with open(log_dir / "f.jsonl", "w") as f:
        f.write(_json.dumps(rec) + "\n")
    seen = []

    def recorder(env, batch_id):
        seen.append(env.count())

    q = run_pipeline(spark, str(log_dir), [Route("rec", recorder)], str(tmp_path / "ckpt"))
    await_done(q)
    assert seen == [1]


def test_dedup_corpus_route_end_to_end(spark, tmp_path):
    """CDC inserts of documents flow through the pipeline into the
    incremental-dedup store: a cross-batch near-copy and a same-batch
    exact copy are dropped, distinct docs survive, and replaying the
    whole changelog under a fresh checkpoint leaves the corpus
    unchanged."""
    import json as _json

    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        dedup_corpus_writer,
        read_dedup_corpus,
    )

    base = ("the quick brown fox jumps over the lazy dog while the patient "
            "grey owl watches from a very tall oak tree near the river")
    texts = {
        1: base,
        2: "entirely unrelated prose about columnar execution and shuffles "
           "with partition pruning and adaptive planning at large scale",
        3: base.replace("dog", "cat"),   # near-copy of 1, later batch
        4: "entirely unrelated prose about columnar execution and shuffles "
           "with partition pruning and adaptive planning at large scale",  # = 2
    }
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(1, 2), (3, 4)]):  # two files → two batches
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, did in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "crawl", "table": "documents",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(did), "text": texts[did]},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    store = str(tmp_path / "corpus")
    route = Route("corpus", dedup_corpus_writer(store, "crawl.documents", threshold=0.7))
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    corpus = {r.doc_id: r.text for r in read_dedup_corpus(spark, store).collect()}
    assert set(corpus) == {1, 2}
    assert corpus[1] == base

    # full replay under a fresh checkpoint: ids already committed → no-op
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    assert read_dedup_corpus(spark, store).count() == 2


def test_semantic_dedup_corpus_route_end_to_end(spark, tmp_path):
    """Streaming SEMANTIC dedup as a pipeline route: CDC inserts carry
    embeddings (JSON arrays on the wire); a batch-2 near-identical copy
    of a batch-1 embedding is dropped against the persisted
    centroid+vector store, distinct embeddings survive, and a full
    changelog replay under a fresh checkpoint leaves the corpus
    unchanged."""
    import json as _json

    import numpy as np

    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        read_semantic_corpus,
        semantic_dedup_corpus_writer,
    )

    rng = np.random.RandomState(21)
    vecs = {i: rng.normal(0, 1, 16) for i in (1, 2, 3)}
    vecs[4] = vecs[1] + rng.normal(0, 1e-5, 16)  # near-copy of 1, batch 2
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(1, 2), (3, 4)]):  # two files → two batches
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, vid in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "ml", "table": "embeddings",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(vid),
                              "embedding": _json.dumps([float(x) for x in vecs[vid]])},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    store = str(tmp_path / "semcorpus")
    route = Route(
        "semcorpus",
        semantic_dedup_corpus_writer(
            store, "ml.embeddings", threshold=0.97, n_clusters=2
        ),
    )
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    corpus = {r.vec_id for r in read_semantic_corpus(spark, store).collect()}
    assert corpus == {1, 2, 3}  # 4 dropped as near-dup of 1

    # full replay under a fresh checkpoint: ids already committed → no-op
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    assert read_semantic_corpus(spark, store).count() == 3


def test_pq_index_route_end_to_end(spark, tmp_path):
    """CDC inserts carrying embeddings maintain a queryable PQ ANN
    index: batch 1 trains + creates the store, batch 2 appends under
    the frozen codebooks, a full changelog replay is a no-op, and a
    query through the index returns its own exact vector first."""
    import json as _json

    import numpy as np

    from wing_binlog_go_spark.operators.similarity import (
        load_pq_index,
        pq_topk,
    )
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import pq_index_writer

    rng = np.random.RandomState(33)
    vecs = {i: rng.normal(0, 1, 32) for i in range(1, 9)}
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(1, 2, 3, 4), (5, 6, 7, 8)]):
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, vid in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "ml", "table": "vectors",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(vid),
                              "embedding": _json.dumps([float(x) for x in vecs[vid]])},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    store = str(tmp_path / "pqstore")
    route = Route(
        "pqindex",
        pq_index_writer(store, "ml.vectors", m=8, n_codes=8),
    )
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    idx = load_pq_index(spark, store)
    assert idx[0].count() == 8

    # replay under a fresh checkpoint: ids already coded → no growth
    with open(f"{store}/codebooks.json") as f:
        books1 = _json.load(f)["books"]
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    idx2 = load_pq_index(spark, store)
    assert idx2[0].count() == 8
    with open(f"{store}/codebooks.json") as f:
        assert _json.load(f)["books"] == books1  # never retrained

    # querying with a stored vector: its own id must rank first
    queries = spark.createDataFrame(
        [(101, [float(x) for x in vecs[6]])], ["query_id", "embedding"]
    )
    top = pq_topk(None, queries, k=1, refine=8, index=idx2).collect()
    assert top[0].vec_id == 6 and top[0].rnk == 1


def test_ivfpq_index_route_end_to_end(spark, tmp_path):
    """CDC inserts maintain the list-partitioned IVF-PQ store: batch 1
    trains + creates it, batch 2 appends under frozen quantizers, a
    full replay is a no-op (quantizers byte-identical, no growth), and
    a stored vector queried through the index ranks itself first."""
    import json as _json
    import os

    import numpy as np

    from wing_binlog_go_spark.operators.similarity import (
        ivfpq_topk,
        load_ivfpq_index,
    )
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import ivfpq_index_writer

    rng = np.random.RandomState(34)
    vecs = {i: rng.normal(0, 1, 32) for i in range(1, 9)}
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(1, 2, 3, 4), (5, 6, 7, 8)]):
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, vid in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "ml", "table": "vectors",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(vid),
                              "embedding": _json.dumps([float(x) for x in vecs[vid]])},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    store = str(tmp_path / "ivfpqstore")
    route = Route(
        "ivfpqindex",
        ivfpq_index_writer(store, "ml.vectors", n_centroids=4, m=8, n_codes=8),
    )
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    idx = load_ivfpq_index(spark, store)
    assert idx[0].count() == 8
    # the on-disk layout is the inverted index
    assert any(d.startswith("_list=") for d in os.listdir(f"{store}/codes"))

    with open(f"{store}/quantizers.json") as f:
        q1 = _json.load(f)
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    idx2 = load_ivfpq_index(spark, store)
    assert idx2[0].count() == 8
    with open(f"{store}/quantizers.json") as f:
        q2 = _json.load(f)
    assert q2["coarse"] == q1["coarse"] and q2["books"] == q1["books"]

    queries = spark.createDataFrame(
        [(101, [float(x) for x in vecs[6]])], ["query_id", "embedding"]
    )
    top = ivfpq_topk(
        None, queries, k=1, n_probe=4, refine=8, index=idx2
    ).collect()
    assert top[0].vec_id == 6 and top[0].rnk == 1


def test_dedup_corpus_route_with_quality_gate(spark, tmp_path):
    """The corpus route's optional quality prefilter: low-quality docs
    (fail the Gopher rules) never enter the store or the corpus;
    passing docs flow through dedup as before."""
    import json as _json

    from wing_binlog_go_spark.functions.text import gopher_quality_flags
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        dedup_corpus_writer,
        read_dedup_corpus,
    )

    good = "the quick brown fox jumps over that lazy dog " * 7
    bad = "1234 5678 " * 30 + "the"  # fails the alpha-ratio rule
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    with open(log_dir / "f0.jsonl", "w") as f:
        for i, text in [(1, good.strip()), (2, bad.strip()), (3, good.strip())]:
            rec = {
                "binlog_file": "mysql-bin.000001", "binlog_pos": 4 + i * 50,
                "xid_commit": True, "database": "crawl", "table": "docs",
                "action": "insert", "row_no": 0, "before": None,
                "after": {"id": str(i), "text": text}, "ddl_query": None,
                "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
            }
            f.write(_json.dumps(rec) + "\n")

    def gate(docs):
        keep = gopher_quality_flags(docs, min_stopword_hits=1).filter("keep")
        return docs.join(keep.select("doc_id"), "doc_id", "left_semi")

    store = str(tmp_path / "corpus")
    route = Route(
        "corpus",
        dedup_corpus_writer(store, "crawl.docs", quality_filter=gate),
    )
    q = run_pipeline(spark, str(log_dir), [route], str(tmp_path / "ckpt"))
    await_done(q)
    ids = sorted(r.doc_id for r in read_dedup_corpus(spark, store).collect())
    assert ids == [1]  # 2 failed quality; 3 (exact copy) deduped against 1


def test_curation_stats_route_end_to_end(spark, tmp_path):
    """The curation funnel route writes ONE stats row per micro-batch
    (arrivals, keeps, per-rule failure counts) and is replay-idempotent:
    re-running the whole changelog under a fresh checkpoint leaves the
    stats table unchanged."""
    import json as _json

    from wing_binlog_go_spark.functions.text import gopher_quality_flags
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        curation_stats_writer,
        read_curation_stats,
    )

    texts = {
        1: "the quick brown fox and a dog run over green grass today",  # keep
        2: "the tiny doc",                       # fails min-words
        3: "### ### ### ### ### ###",            # fails symbols+alpha+stopwords
    }
    log_dir = tmp_path / "log"
    log_dir.mkdir()
    for fi, ids in enumerate([(1, 2), (3,)]):  # two files → two batches
        with open(log_dir / f"f{fi}.jsonl", "w") as f:
            for ev, did in enumerate(ids):
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50, "xid_commit": True,
                    "database": "crawl", "table": "docs",
                    "action": "insert", "row_no": 0, "before": None,
                    "after": {"id": str(did), "text": texts[did]},
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z", "gtid": None,
                }
                f.write(_json.dumps(rec) + "\n")

    stats_dir = str(tmp_path / "stats")
    route = Route(
        "stats",
        curation_stats_writer(
            stats_dir,
            "crawl.docs",
            flags_fn=lambda d: gopher_quality_flags(
                d, min_words=5, min_stopword_hits=1, with_rules=True
            ),
        ),
    )
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    await_done(q)
    rows = {r.batch_id: r for r in read_curation_stats(spark, stats_dir).collect()}
    assert set(rows) == {0, 1}
    b0 = rows[0]
    assert (b0.n_docs, b0.n_keep) == (2, 1)
    assert (b0.fail_words, b0.fail_word_len) == (1, 0)
    assert (b0.fail_symbols, b0.fail_alpha, b0.fail_stopwords) == (0, 0, 0)
    b1 = rows[1]
    assert (b1.n_docs, b1.n_keep) == (1, 0)
    assert b1.fail_words == 0
    assert (b1.fail_symbols, b1.fail_alpha, b1.fail_stopwords) == (1, 1, 1)

    # full replay, fresh checkpoint: batch partitions exist → no-op
    q = run_pipeline(
        spark, str(log_dir), [route], str(tmp_path / "ckpt2"),
        max_files_per_trigger=1,
    )
    await_done(q)
    assert read_curation_stats(spark, stats_dir).count() == 2


def test_five_route_fanout_composes_end_to_end(spark, tmp_path):
    """O13 composition at full width: ONE changelog feeds seven routes
    in one pipeline — typed replica, SCD2 history, PIT enrichment,
    deduped corpus, curation stats, maintained join view, search index
    — and every sink is simultaneously correct. This is the
    reference's fan-out story (one binlog, many consumers) exercised
    as a single integration path instead of seven isolated tests."""
    import json as _json

    from wing_binlog_go_spark.functions.schema_registry import (
        ColumnSpec,
        SchemaRegistry,
        TableSpec,
    )
    from wing_binlog_go_spark.functions.text import gopher_quality_flags
    from wing_binlog_go_spark.streaming.joinview import (
        joinview_writer,
        read_joinview,
    )
    from wing_binlog_go_spark.streaming.searchindex import (
        bm25_over_index,
        search_index_writer,
    )
    from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
    from wing_binlog_go_spark.streaming.sinks import (
        curation_stats_writer,
        dedup_corpus_writer,
        pit_enrich_writer,
        read_curation_stats,
        read_dedup_corpus,
        read_pit_enriched,
        read_scd2_history,
        read_typed_replica,
        scd2_history_writer,
        typed_replica_writer,
    )

    reg = SchemaRegistry()
    reg.register(TableSpec("shop", "customer",
                           [ColumnSpec("id", "bigint(20)", is_pk=True),
                            ColumnSpec("tier", "varchar(16)")]))
    reg.register(TableSpec("shop", "orders",
                           [ColumnSpec("id", "bigint(20)", is_pk=True),
                            ColumnSpec("cust_id", "bigint(20)"),
                            ColumnSpec("amount", "int(11)")]))
    uuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

    def rec(pos, table, action, before, after):
        return {
            "binlog_file": "mysql-bin.000001", "binlog_pos": pos,
            "xid_commit": True, "database": "shop", "table": table,
            "action": action, "row_no": 0, "before": before,
            "after": after, "ddl_query": None,
            "ts_header": "2018-04-19T05:21:27.000Z", "gtid": f"{uuid}:1",
        }

    good = ("the quick brown fox jumps over that lazy dog while the "
            "patient grey owl watches from a very tall oak tree")
    events = [
        rec(100, "customer", "insert", None, {"id": "1", "tier": "bronze"}),
        rec(200, "orders", "insert", None,
            {"id": "10", "cust_id": "1", "amount": "5"}),
        rec(300, "customer", "update", {"id": "1", "tier": "bronze"},
            {"id": "1", "tier": "gold"}),
        rec(400, "orders", "insert", None,
            {"id": "11", "cust_id": "1", "amount": "7"}),
        # documents table feeds corpus + stats routes
        rec(500, "docs", "insert", None, {"id": "1", "text": good}),
        rec(600, "docs", "insert", None, {"id": "2", "text": good}),  # dup
        rec(700, "docs", "insert", None, {"id": "3", "text": "tiny"}),
    ]
    log = tmp_path / "log"
    log.mkdir()
    with open(log / "part-0000.jsonl", "w") as f:
        for e in events:
            f.write(_json.dumps(e) + "\n")

    replica = str(tmp_path / "replica")
    scd2 = str(tmp_path / "scd2")
    enriched = str(tmp_path / "enriched")
    corpus = str(tmp_path / "corpus")
    stats = str(tmp_path / "stats")
    jv = str(tmp_path / "jv")
    idx = str(tmp_path / "idx")
    routes = [
        Route("replica", typed_replica_writer(
            reg, ["shop.customer", "shop.orders"], replica)),
        Route("scd2", scd2_history_writer(reg, ["shop.customer"], scd2)),
        Route("enrich", pit_enrich_writer(
            reg, "shop.orders", "shop.customer", "cust_id", scd2, enriched)),
        Route("corpus", dedup_corpus_writer(corpus, "shop.docs",
                                            threshold=0.7)),
        Route("stats", curation_stats_writer(
            stats, "shop.docs",
            flags_fn=lambda d: gopher_quality_flags(
                d, min_words=5, min_stopword_hits=1, with_rules=True))),
        Route("jv", joinview_writer(
            jv, "orders", "customer", "cust_id", "id")),
        Route("search", search_index_writer(idx, "shop.docs")),
    ]
    q = run_pipeline(spark, str(log), routes, str(tmp_path / "ckpt"))
    await_done(q)
    # replica: latest customer state + both orders
    cust = {r.id: r.tier for r in
            read_typed_replica(spark, reg, "shop.customer", replica).collect()}
    assert cust == {1: "gold"}
    orders = {r.id: r.amount for r in
              read_typed_replica(spark, reg, "shop.orders", replica).collect()}
    assert orders == {10: 5, 11: 7}
    # scd2: two versions of customer 1
    hist = sorted(
        (r.version_n, r.tier, bool(r.is_current))
        for r in read_scd2_history(spark, reg, "shop.customer", scd2).collect()
    )
    assert hist == [(1, "bronze", False), (2, "gold", True)]
    # enrichment: each order saw the tier current at its event
    enr = {r.id: r.dim_tier for r in read_pit_enriched(spark, enriched).collect()}
    assert enr == {10: "bronze", 11: "gold"}
    # corpus: the exact duplicate was dropped; the distinct (if tiny)
    # doc survives — this route is dedup-only, quality lives in stats
    assert sorted(
        r.doc_id for r in read_dedup_corpus(spark, corpus).collect()
    ) == [1, 3]
    # stats: one batch row, 3 arrivals, 2 keeps (doc 3 fails min-words;
    # the duplicate still counts as an arrival and a keep — dedup is a
    # separate route, stats measure the QUALITY funnel)
    s = read_curation_stats(spark, stats).collect()
    assert len(s) == 1
    assert (s[0].n_docs, s[0].n_keep, s[0].fail_words) == (3, 2, 1)
    # join view: both orders paired with the customer's LATEST image
    # (the view is current-state, unlike the PIT enrichment above)
    jv_pairs = {
        (r.row_l["id"], r.row_r["id"], r.row_r["tier"])
        for r in read_joinview(spark, jv).collect()
    }
    assert jv_pairs == {("10", "1", "gold"), ("11", "1", "gold")}
    # search index: both good docs rank above the tiny one for a query
    # from their shared text; all three docs present (total ranking)
    scores = {
        r.doc_id: r.bm25
        for r in bm25_over_index(spark, idx, ["quick", "owl"]).collect()
    }
    assert set(scores) == {1, 2, 3}
    assert scores[1] > 0 and scores[2] > 0 and scores[3] == 0.0
