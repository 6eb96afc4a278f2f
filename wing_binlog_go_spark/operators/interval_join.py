"""Interval overlap join: which intervals intersect which.

The temporal-join member of the join family (SURVEY Q12/Q15 siblings):
given two sets of [start, end] intervals, emit the pairs that overlap.
The naive formulation is a theta-join (``s1 <= e2 AND s2 <= e1``) that
Spark can only execute as a nested-loop product — the classic
scale-killer for temporal workloads. The scalable form here is TIME
BUCKETING: every interval explodes into the fixed-width chunks it
covers, candidates come from a chunk EQUI-join (two overlapping
intervals must co-occupy at least one chunk — the pigeonhole that makes
recall exactly 1), and the exact predicate verifies. Fan-out per
interval is its length over the chunk width, so pick ``chunk`` near the
typical interval length (cost formula in ``interval_overlap_pairs``).

Registered query (q143): overlapping user SESSIONS — sessionize events
per user (same 30-min-gap rule as q68, which is oracle-green), then
self-join sessions of DIFFERENT users for co-presence. Durations stay
in integer microseconds end to end (unix_micros ↔ DuckDB epoch_us, the
q107 lesson), so the aggregate is hash-stable across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}

_US = 1_000_000


def interval_overlap_pairs(
    left: DataFrame,
    right: DataFrame,
    chunk_seconds: int = 3600,
) -> DataFrame:
    """Overlapping pairs of [start_us, end_us] intervals (inclusive
    ends; touching counts with overlap_us = 0). Inputs carry
    (id, start_us, end_us); output is (id_a, id_b, overlap_us) with
    every (left, right) overlapping pair exactly once.

    Cost: an interval of length L explodes into ⌈L/chunk⌉+1 rows and a
    pair co-occupying c chunks appears c times before the distinct —
    chunk ≈ median interval length keeps both near 1. Skewed hot chunks
    (everyone online at 9am) fan out as the product of the two sides'
    chunk populations; that is the true candidate count of bucketing,
    and AQE's skew split keeps the tasks balanced.
    """
    if chunk_seconds <= 0:
        raise ValueError(f"chunk_seconds must be positive, got {chunk_seconds}")
    w = chunk_seconds * _US

    def chunked(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"id_{side}"),
            F.col("start_us").alias(f"s_{side}"),
            F.col("end_us").alias(f"e_{side}"),
            F.explode(
                F.sequence(
                    # floor, not cast: cast truncates toward zero, which
                    # mis-buckets pre-1970 (negative-epoch) intervals and
                    # breaks the pigeonhole guarantee.
                    F.floor(F.col("start_us") / w).cast("long"),
                    F.floor(F.col("end_us") / w).cast("long"),
                )
            ).alias("chunk"),
        )

    a, b = chunked(left, "a"), chunked(right, "b")
    return (
        a.join(b, "chunk")
        .filter((F.col("s_a") <= F.col("e_b")) & (F.col("s_b") <= F.col("e_a")))
        .select("id_a", "id_b", "s_a", "e_a", "s_b", "e_b")
        .distinct()
        .select(
            "id_a",
            "id_b",
            (
                F.least("e_a", "e_b") - F.greatest("s_a", "s_b")
            ).alias("overlap_us"),
        )
    )


def session_intervals(events: DataFrame, gap_seconds: int = 1800) -> DataFrame:
    """(user_id, session_no, start_us, end_us): the q68 sessionization
    rule (new session when the gap exceeds ``gap_seconds``), collapsed
    to one interval per session. Entity-keyed windows only."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    new_sess = (
        F.when(F.unix_timestamp("ts") - F.unix_timestamp(prev) > gap_seconds, 1)
        .when(prev.isNull(), 1)
        .otherwise(0)
    )
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        events.withColumn("new_session", new_sess)
        .withColumn("session_no", F.sum("new_session").over(run).cast("bigint"))
        .groupBy("user_id", "session_no")
        .agg(
            F.min(F.unix_micros(F.col("ts").cast("timestamp"))).alias("start_us"),
            F.max(F.unix_micros(F.col("ts").cast("timestamp"))).alias("end_us"),
        )
    )


def _q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_table(spark, sf_dir, "events")
    sess = session_intervals(ev).select(
        F.concat_ws("#", "user_id", "session_no").alias("id"),
        F.col("user_id"),
        "start_us",
        "end_us",
    )
    pairs = interval_overlap_pairs(
        sess.select("id", "start_us", "end_us"), sess.select("id", "start_us", "end_us")
    )
    ua = F.split(F.col("id_a"), "#").getItem(0).cast("long")
    ub = F.split(F.col("id_b"), "#").getItem(0).cast("long")
    return (
        pairs.select(ua.alias("user_a"), ub.alias("user_b"), "overlap_us")
        .filter(F.col("user_a") < F.col("user_b"))
        .groupBy("user_a", "user_b")
        .agg(
            F.count("*").alias("n_overlaps"),
            F.sum("overlap_us").alias("overlap_us_total"),
        )
        .orderBy("user_a", "user_b")
    )


_INTERVAL_ORACLE = """
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800
                OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no,
         ts
  FROM gaps
), iv AS (
  SELECT user_id, session_no,
         MIN(epoch_us(ts)) AS start_us, MAX(epoch_us(ts)) AS end_us
  FROM sess GROUP BY user_id, session_no
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       COUNT(*) AS n_overlaps,
       CAST(SUM(LEAST(a.end_us, b.end_us) - GREATEST(a.start_us, b.start_us))
            AS BIGINT) AS overlap_us_total
FROM iv a JOIN iv b
  ON a.user_id < b.user_id
 AND a.start_us <= b.end_us AND b.start_us <= a.end_us
GROUP BY a.user_id, b.user_id
ORDER BY user_a, user_b
"""

QUERIES["q143_interval_overlap"] = QuerySpec(_q_interval_overlap, _INTERVAL_ORACLE)
