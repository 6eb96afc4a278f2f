"""End-to-end CDC demo: changelog directory → envelope pipeline →
(gateway push + parquet replica + incremental aggregate + anomaly log),
with the transaction gate and metrics listener on.

    python examples/cdc_pipeline.py /path/to/changelog /path/to/out

Writes the fixture changelog if the directory is empty, so it runs
self-contained. The reference equivalent is wiring `main.go` with the
subscribe/http services; here every piece is a Route on one
checkpointed stream.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from wing_binlog_go_spark.session import get_spark
from wing_binlog_go_spark.sources.changelog import write_fixture_changelog
from wing_binlog_go_spark.streaming.aggregate import (
    anomaly_writer,
    incremental_agg_writer,
    read_anomalies,
)
from wing_binlog_go_spark.streaming.metrics import PipelineMetrics, summarize
from wing_binlog_go_spark.streaming.pipeline import Route, run_pipeline, upsert_parquet
from wing_binlog_go_spark.streaming.subscribe import SubscribeServer, subscribe_route_writer


def main() -> None:
    changelog = sys.argv[1] if len(sys.argv) > 1 else "/tmp/wbg-demo/changelog"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/wbg-demo/out"
    if not os.path.isdir(changelog) or not os.listdir(changelog):
        write_fixture_changelog(changelog, split_files=False)
        print(f"wrote fixture changelog to {changelog}")

    spark = get_spark("wbg-demo", shuffle_partitions=8)
    gateway = SubscribeServer()
    print(f"TCP pub/sub gateway on {gateway.address[0]}:{gateway.address[1]}")
    metrics_path = os.path.join(out, "metrics.jsonl")
    os.makedirs(out, exist_ok=True)
    listener = PipelineMetrics(metrics_path)
    spark.streams.addListener(listener)

    def replica(env, batch_id):
        upsert_parquet(
            env.filter(F.col("full_table") == "fixtures.cdc_typed_all"),
            os.path.join(out, "replica"),
            pk="id",
        )

    q = run_pipeline(
        spark,
        changelog,
        [
            Route("gateway", subscribe_route_writer(gateway)),
            Route("replica", replica),
            Route("agg", incremental_agg_writer(os.path.join(out, "agg"), "c_vchar", "c_int")),
            # flags values z-scored against pre-batch history (tiny
            # fixture: min_n=1 so the demo produces rows)
            Route("anom", anomaly_writer(
                os.path.join(out, "anom_state"), os.path.join(out, "anom"),
                "c_vchar", "c_int", z=1.0, min_n=1)),
        ],
        os.path.join(out, "ckpt"),
        txn_atomic=True,
    )
    q.awaitTermination(120)
    print("replica rows:", spark.read.parquet(os.path.join(out, "replica")).count())
    print("aggregate:", spark.read.parquet(os.path.join(out, "agg")).orderBy("grp").show(truncate=False))
    print("anomalies flagged:", read_anomalies(spark, os.path.join(out, "anom")).count())
    print("throughput:", summarize(metrics_path))
    gateway.close()


if __name__ == "__main__":
    main()
