"""Streaming throughput micro-bench — the engine-side analog of the
reference's only performance metric, the demo client's events/sec log
line (`src/library/client/tcp.go:436-443`; the reference never records
it, so there is no wire number to beat — this harness creates the
recorded baseline the rounds compare against).

Pushes N synthetic changelog events (CHANGE_SCHEMA JSONL, split across
files so availableNow produces multiple micro-batches) through the full
CDC pipeline — envelope shaping, monotonic event_index, route fan-out —
into a parquet sink, with the PipelineMetrics listener recording
per-batch durations. Prints ONE JSON line:

  {"metric": "cdc_stream_events_per_sec", "value": N, "unit": "events/sec",
   "events": ..., "wall_sec": ..., "cold_first_batch_ms": ...,
   "warm_batch_ms_p50": ..., "warm_batch_ms_p95": ..., ...}

and persists it to BENCH_STREAM.json (first run creates the baseline;
later runs add "vs_baseline", same contract as bench.py) plus a
per-round BENCH_STREAM_r{NN}.json (NN = latest driver CORRECTNESS
round + 1) so streaming perf is trendable round-over-round like the
query bench.

Cold/warm split: the FIRST batch pays one-time plan compilation +
stream start-up and used to dominate p95 (r4: p95 3.9× p50, all
start-up). It is reported separately as ``cold_first_batch_ms``;
``warm_*`` percentiles and ``steady_events_per_sec`` cover batches
2..N only — the steady state a regression would actually move.

``value`` is end-to-end (includes stream start-up, which amortizes with
N); ``steady_events_per_sec`` is the median per-batch rate — the number
to compare against the reference's client-side counter, which also
measured mid-stream.

Env knobs: SPARK_GRAFT_STREAM_EVENTS (default 400_000),
SPARK_GRAFT_STREAM_FILES (default 40 → 4 micro-batches at
maxFilesPerTrigger=10), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wing_binlog_go_spark.session import get_spark
from wing_binlog_go_spark.streaming.metrics import PipelineMetrics, summarize
from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline

SERVER_UUID = "3e11fa47-71ca-11e1-9e33-c80aa9429562"


def synth_events(n: int, n_files: int, out_dir: str) -> None:
    """Deterministic synthetic change stream: 60% insert / 30% update /
    10% delete across 8 tables, one transaction per 10 events. Written
    as ``n_files`` JSONL files so maxFilesPerTrigger yields several
    micro-batches (per-batch p50/p95 need more than one sample)."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n + n_files - 1) // n_files
    ev = 0
    for fi in range(n_files):
        with open(os.path.join(out_dir, f"part-{fi:04d}.jsonl"), "w") as f:
            for _ in range(min(per, n - ev)):
                ev += 1
                kind = "insert" if ev % 10 < 6 else ("update" if ev % 10 < 9 else "delete")
                row = {"id": str(ev), "v": f"val-{ev}", "n": str(ev % 997)}
                rec = {
                    "binlog_file": f"mysql-bin.{fi:06d}",
                    "binlog_pos": 4 + ev * 50,
                    "xid_commit": ev % 10 == 0,
                    "database": "bench",
                    "table": f"t{ev % 8}",
                    "action": kind,
                    "row_no": 0,
                    "before": row if kind in ("update", "delete") else None,
                    "after": {**row, "v": f"val-{ev}b"} if kind == "update"
                             else (row if kind == "insert" else None),
                    "ddl_query": None,
                    "ts_header": "2018-04-19T05:21:27.000Z",
                    "gtid": f"{SERVER_UUID}:{1 + ev // 10}",
                }
                f.write(json.dumps(rec) + "\n")


def _pct(sorted_vals: list[float], q: float) -> float:
    if not sorted_vals:
        return 0.0
    i = min(len(sorted_vals) - 1, int(round(q * (len(sorted_vals) - 1))))
    return sorted_vals[i]


def gateway_events_per_sec(n: int = 200_000, payload_len: int = 200) -> float:
    """Client-side receive rate through the TCP gateway — the EXACT
    metric the reference's demo client computes (client/tcp.go:436-443:
    received events / elapsed, logged every 5 s). Publisher thread
    floods ``send_all``; the clock runs on the subscriber from first
    event to last."""
    import threading

    from wing_binlog_go_spark.streaming.subscribe import (
        SubscribeClient,
        SubscribeServer,
    )

    server = SubscribeServer(keepalive_sec=5.0)
    try:
        client = SubscribeClient(*server.address)
        client.subscribe(r"bench\.t")
        payload = b"x" * payload_len

        def publish():
            for _ in range(n):
                server.send_all("bench.t", payload)

        t = threading.Thread(target=publish, daemon=True)
        t.start()
        first = client.events(1, timeout=30)
        t0 = time.perf_counter()
        client.events(n - len(first), timeout=300)
        elapsed = time.perf_counter() - t0
        t.join(30)
        client.close()
        return round((n - 1) / elapsed, 1)
    finally:
        server.close()


def one_pipeline_run(spark, n_events: int, n_files: int) -> dict:
    """One timed pipeline pass in a fresh work dir with its own metrics
    listener; returns the per-run metric dict (no artifact I/O)."""
    work = tempfile.mkdtemp(prefix="bench-stream-")
    log_dir = os.path.join(work, "changelog")
    sink_dir = os.path.join(work, "sink")
    ckpt = os.path.join(work, "ckpt")
    metrics_path = os.path.join(work, "metrics.jsonl")
    synth_events(n_events, n_files, log_dir)

    listener = PipelineMetrics(metrics_path)
    spark.streams.addListener(listener)

    def parquet_writer(env, batch_id):
        env.write.mode("append").parquet(sink_dir)

    # Timed section = the pipeline run only (synthesis/session excluded):
    # this is the number the reference's client-side counter measures.
    try:
        t0 = time.perf_counter()
        q = run_pipeline(
            spark,
            log_dir,
            [Route("sink", parquet_writer)],
            ckpt,
            max_files_per_trigger=int(
                os.environ.get("SPARK_GRAFT_STREAM_MAXFILES", "10")
            ),
        )
        q.awaitTermination(600)
        wall = time.perf_counter() - t0

        out_rows = spark.read.parquet(sink_dir).count()
        if out_rows != n_events:
            raise SystemExit(f"sink rows {out_rows} != input events {n_events}")

        batches = [
            rec
            for rec in map(json.loads, open(metrics_path))
            if rec.get("kind") == "batch" and rec.get("input_rows", 0) > 0
        ]  # metrics.jsonl is append-ordered → batches[0] is the cold one
    finally:
        spark.streams.removeListener(listener)
        shutil.rmtree(work, ignore_errors=True)
    cold_ms = batches[0]["batch_duration_ms"] if batches else 0.0
    warm = batches[1:]
    warm_ms = sorted(b["batch_duration_ms"] for b in warm)
    warm_rates = sorted(
        b["input_rows"] / (b["batch_duration_ms"] / 1000.0)
        for b in warm
        if b["batch_duration_ms"] > 0
    )
    all_ms = sorted(b["batch_duration_ms"] for b in batches)
    return {
        "value": round(n_events / wall, 1),
        "steady_events_per_sec": round(_pct(warm_rates, 0.50), 1),
        "wall_sec": round(wall, 3),
        "batches": len(all_ms),
        # cold/warm split: first batch = plan compilation + start-up
        "cold_first_batch_ms": cold_ms,
        "warm_batch_ms_p50": _pct(warm_ms, 0.50),
        "warm_batch_ms_p95": _pct(warm_ms, 0.95),
        # whole-run percentiles kept for continuity with r1-r4 artifacts
        "batch_ms_p50": _pct(all_ms, 0.50),
        "batch_ms_p95": _pct(all_ms, 0.95),
    }


def _dist(vals: list[float]) -> dict:
    vs = sorted(vals)
    return {
        "min": vs[0],
        "median": round(_pct(vs, 0.50), 1),
        "max": vs[-1],
    }


def main() -> None:
    """n-run form (r5 verdict ask #3): a single sample cannot separate
    machine noise from a real regression on this box (NOTES.md records
    2-3x swings under load), so each round now records the
    DISTRIBUTION of SPARK_GRAFT_STREAM_RUNS (default 3) quiet runs —
    {min, median, max} per metric under "dist" — with the headline
    top-level fields set to the medians. vs_baseline compares the
    median against the recorded single-run baseline."""
    n_events = int(os.environ.get("SPARK_GRAFT_STREAM_EVENTS", "400000"))
    n_files = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "40"))
    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_RUNS", "3")))

    spark = get_spark("wing-binlog-go-spark-bench-stream")
    runs = [one_pipeline_run(spark, n_events, n_files) for _ in range(n_runs)]
    gateway_runs = [gateway_events_per_sec() for _ in range(n_runs)]

    result = {
        "metric": "cdc_stream_events_per_sec",
        "unit": "events/sec",
        "events": n_events,
        "files": n_files,
        "runs": n_runs,
    }
    # headline fields = per-metric medians (continuity with r1-r5)
    for key in runs[0]:
        result[key] = _dist([r[key] for r in runs])["median"]
    result["gateway_events_per_sec"] = _dist(gateway_runs)["median"]
    result["dist"] = {
        key: _dist([r[key] for r in runs]) for key in runs[0]
    }
    result["dist"]["gateway_events_per_sec"] = _dist(gateway_runs)

    here = os.path.dirname(os.path.abspath(__file__))
    bench_path = os.path.join(here, "BENCH_STREAM.json")
    if not os.path.exists(bench_path):
        with open(bench_path, "w") as f:
            json.dump(result, f, indent=1)
    else:
        with open(bench_path) as f:
            baseline = json.load(f)
        if baseline.get("events") == result["events"] and baseline.get("value"):
            result["vs_baseline"] = round(result["value"] / baseline["value"], 3)
    # per-round artifact numbered like bench.py's dist file: the build
    # round = latest driver CORRECTNESS round + 1, so repeated runs in
    # one round overwrite the same file instead of minting max+1 each
    # invocation (r7's scheme; it mislabeled reruns as future rounds)
    import re as _re

    taken = [
        int(m.group(1))
        for fn in os.listdir(here)
        if (m := _re.fullmatch(r"CORRECTNESS_r(\d+)\.json", fn))
    ]
    n_round = max(taken, default=0) + 1
    with open(os.path.join(here, f"BENCH_STREAM_r{n_round:02d}.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
