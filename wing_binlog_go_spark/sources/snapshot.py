"""Snapshot bootstrap (O3): initial full table scan unioned ahead of the
change stream.

Reference parity: canal shells out to mysqldump, parses rows, and
re-injects them as ``insert`` events before streaming from the marked
position (vendor/.../canal/dump.go:26-74,100-135); a `--where` clause
pushes predicates into the dump (canal/config.go:28-29).

Spark-first: the snapshot is ``spark.read.format("jdbc")`` (predicate
pushdown via ``predicates=`` / ``dbtable=(select ...)``) or any batch
DataFrame; ``snapshot_as_changes`` re-shapes it into the same
CHANGE_SCHEMA records the binlog source emits — binlog coordinates sort
before every real binlog file, so envelope event_index puts snapshot
rows first, and the upsert materializer needs no special bootstrap mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from wing_binlog_go_spark.functions.envelope import CHANGE_SCHEMA

SNAPSHOT_FILE = ""  # sorts before any real "mysql-bin.NNNNNN"


def jdbc_snapshot(
    spark: SparkSession,
    url: str,
    table: str,
    where: str | None = None,
    partition_column: str | None = None,
    num_partitions: int = 32,
    lower_bound=None,
    upper_bound=None,
) -> DataFrame:
    """Parallel JDBC snapshot with predicate pushdown (the `--where`
    equivalent). Untestable without a database here; the reader options
    are the production-correct ones."""
    dbtable = f"(SELECT * FROM {table} WHERE {where}) snap" if where else table
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", dbtable)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            # str(None) would reach the JDBC reader as the literal
            # "None" and die later in a NumberFormatException — fail at
            # the call site with the actual requirement instead
            raise ValueError(
                "jdbc_snapshot: partition_column requires lower_bound "
                "and upper_bound (SELECT MIN(col), MAX(col) upfront)"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    return reader.load()


def snapshot_as_changes(
    snapshot: DataFrame,
    database: str,
    table: str,
    snapshot_ts: str | None = None,
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Batch rows → CHANGE_SCHEMA ``insert`` records (dump.go semantics:
    every dumped row re-enters the pipeline as an insert event).

    Values are stringified into the envelope's map<string,string> the
    same way binlog row images are.

    ``order_cols``: a UNIQUE key subset to derive the deterministic row
    numbering from — pass the primary key. Defaults to every column
    (always correct), but on a wide table that makes the whole ROW the
    range-sort key (multi-KB composites through the shuffle); the PK
    gives identical determinism at a fraction of the cost.
    """
    from wing_binlog_go_spark.functions.envelope import with_dense_index

    cols = snapshot.columns
    kv = []
    for c in cols:
        kv.extend([F.lit(c), F.col(c).cast("string")])
    ts = (
        F.lit(snapshot_ts).cast("timestamp")
        if snapshot_ts
        else F.current_timestamp()
    )
    # parallel dense numbering (range-partitioned zipWithIndex) — a plain
    # global Window here would single-partition the entire snapshot,
    # defeating the parallel JDBC read
    ordered = with_dense_index(
        snapshot, list(order_cols) if order_cols else cols, out="_row_order"
    ).select(
        F.create_map(*kv).alias("after"), F.col("_row_order").alias("_rn")
    )
    return ordered.select(
        F.lit(SNAPSHOT_FILE).alias("binlog_file"),
        F.col("_rn").cast("long").alias("binlog_pos"),
        F.lit(False).alias("xid_commit"),
        F.lit(database).alias("database"),
        F.lit(table).alias("table"),
        F.lit("insert").alias("action"),
        F.lit(0).alias("row_no"),
        F.lit(None).cast("map<string,string>").alias("before"),
        F.col("after"),
        F.lit(None).cast("string").alias("ddl_query"),
        ts.alias("ts_header"),
        # a mysqldump-style snapshot has no replication coordinates
        F.lit(None).cast("string").alias("gtid"),
    ).select(*[f.name for f in CHANGE_SCHEMA.fields])


def bootstrap_union(snapshot_changes: DataFrame, stream_changes: DataFrame) -> DataFrame:
    """Snapshot-then-stream as ONE BATCH DataFrame, totally ordered by
    binlog coordinates (snapshot file "" < any real binlog file).

    Both inputs must be batch: Spark cannot union batch with streaming.
    For a live stream, apply the snapshot FIRST (e.g. upsert_parquet of
    ``snapshot_as_changes`` envelopes), then start the streaming query —
    the materializer's last-writer-wins makes the sequencing safe.
    """
    if snapshot_changes.isStreaming or stream_changes.isStreaming:
        raise ValueError(
            "bootstrap_union is batch-only (Spark cannot union batch with "
            "streaming); apply the snapshot before starting the stream"
        )
    return snapshot_changes.unionByName(stream_changes)
