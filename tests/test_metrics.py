"""Batch metrics listener: one JSONL record per micro-batch with row
counts and throughput — the engine-side form of the reference client's
events/sec counter."""

from __future__ import annotations

import json

from wing_binlog_go_spark.sources.changelog import write_fixture_changelog
from wing_binlog_go_spark.streaming.metrics import PipelineMetrics, summarize
from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline
from wing_binlog_go_spark.streaming.sinks import collecting_writer
from tests.streamwait import await_done


def test_metrics_listener_records_batches(spark, tmp_path):
    log_dir = tmp_path / "log"
    write_fixture_changelog(str(log_dir), split_files=False)
    metrics_path = str(tmp_path / "metrics.jsonl")
    listener = PipelineMetrics(metrics_path)
    spark.streams.addListener(listener)
    try:
        got: list = []
        q = run_pipeline(
            spark,
            str(log_dir),
            [Route("m", collecting_writer(got))],
            str(tmp_path / "ckpt"),
        )
        await_done(q)
        qid = str(q.id)
        # the listener bus delivers events asynchronously; progress for
        # an availableNow query can land after awaitTermination returns
        import time

        deadline = time.time() + 20
        while time.time() < deadline:
            try:
                with open(metrics_path) as f:
                    if any(
                        json.loads(ln)["kind"] == "batch" for ln in f if ln.strip()
                    ):
                        break
            except OSError:
                pass
            time.sleep(0.2)
    finally:
        spark.streams.removeListener(listener)
    assert got, "pipeline produced envelopes"
    with open(metrics_path) as f:
        recs = [json.loads(ln) for ln in f]
    kinds = {r["kind"] for r in recs}
    assert "start" in kinds and "batch" in kinds
    batches = [r for r in recs if r["kind"] == "batch" and r["id"] == qid]
    assert batches and all(r["batch_duration_ms"] > 0 for r in batches)
    # the fixture changelog rows all arrive through the recorded batches
    assert sum(r["input_rows"] for r in batches) >= len(got)
    summary = summarize(metrics_path)
    assert summary[qid]["rows"] == sum(r["input_rows"] for r in batches)
    assert summary[qid]["rows_per_sec"] > 0
