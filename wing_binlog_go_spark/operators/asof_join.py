"""As-of join (Q15): latest right-side row at-or-before each left event.

Spark has no native as-of join. Two formulations:

1. ``plans.relational.q15`` — equi-join + range filter + MAX-dedupe.
   Correct, but the equi-join fans out every (event, order) pair for a
   key before aggregating: with K orders per customer the intermediate
   is K× the event count. Fine for moderate K, quadratic-ish for hot keys.
2. ``asof_join`` here — the merge formulation: union both sides tagged,
   one sort per key by (time, side), and a running ``last(ignorenulls)``
   window carries the latest right values forward onto left rows. The
   intermediate is |left| + |right| rows — ONE shuffle, no fan-out, skew
   bounded by the biggest single key's row count. This is the 100 TB
   plan shape.

Both produce identical results (same DuckDB oracle in the registry).
Reference analog: none — the reference (wing-binlog-go) has no join
operator at all; this is part of the declared analytics surface
(readme.md:40-43 "Realtime analytics" delegated to consumers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from wing_binlog_go_spark.plans.relational import QuerySpec
from wing_binlog_go_spark.plans.relational import QUERIES as _REL_QUERIES
from wing_binlog_go_spark.tables import read_table

QUERIES: dict[str, QuerySpec] = {}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    right_values: list[str],
    inclusive: bool = True,
    tolerance: str | None = None,
) -> DataFrame:
    """For each left row: the right row with max right_time ≤ left_time
    (or < if inclusive=False) within the same key. Left rows with no
    match carry NULLs.

    ``tolerance`` (a SQL interval body, e.g. ``"30 DAYS"``) bounds how
    stale a match may be: a carried right row older than
    ``left_time - tolerance`` is treated as no-match (NULLs) — the
    sensor-fusion form ("pair each reading with the calibration from
    the last hour, else flag it"). The merge plan is unchanged; the
    staleness test is a post-window projection, so the 100 TB shape
    (|L|+|R| rows, one shuffle) is identical.
    """
    lcols = [c for c in left.columns]
    # ALL right values travel as ONE struct: last(ignorenulls) then picks
    # the whole latest right ROW atomically — per-column carries would
    # skip a NULL member and stitch together values from different rows.
    # The right timestamp rides along as _rt for the tolerance test.
    rv_struct = F.struct(
        F.col(right_time).alias("_rt"), *[F.col(c) for c in right_values]
    )
    rv_type = right.select(rv_struct.alias("_rv")).schema["_rv"].dataType.simpleString()
    l = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in lcols],
        F.lit(None).cast(rv_type).alias("_rv"),
    )
    r = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_side"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        rv_struct.alias("_rv"),
    )
    # side order breaks time ties: right first ⇒ a right row AT the left
    # timestamp is visible (inclusive); flip for exclusive. The trailing
    # struct ordering makes ties among IDENTICAL (key, time) right rows
    # deterministic (max value tuple wins) instead of partition-order
    # dependent.
    tie = F.asc("_side") if inclusive else F.desc("_side")
    w = (
        Window.partitionBy("_k")
        .orderBy(F.asc("_t"), tie, F.asc("_rv"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l.unionByName(r).select(
        "*", F.last("_rv", ignorenulls=True).over(w).alias("_asof")
    )
    picked = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        fresh = F.col("_asof._rt") >= F.col("_t") - F.expr(f"INTERVAL {tolerance}")
        return picked.select(
            *lcols,
            *[
                F.when(fresh, F.col(f"_asof.{c}")).alias(c)
                for c in right_values
            ],
        )
    return picked.select(
        *lcols,
        *[F.col(f"_asof.{c}").alias(c) for c in right_values],
    )


def _q_asof_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    o = read_table(spark, sf_dir, "orders")
    joined = asof_join(
        e.select("event_id", "user_id", "ts"),
        o.select("o_custkey", "o_orderdate"),
        left_on="user_id",
        right_on="o_custkey",
        left_time="ts",
        right_time="o_orderdate",
        right_values=["o_orderdate"],
    )
    return (
        joined.filter(F.col("o_orderdate").isNotNull())  # inner-join parity
        .select("event_id", F.col("o_orderdate").alias("last_orderdate"))
        .orderBy("event_id")
        .limit(100)
    )


# identical semantics to q15 → same oracle; proves the merge formulation
QUERIES["q15b_asof_merge"] = QuerySpec(_q_asof_merge, _REL_QUERIES["q15_asof_join"].oracle)


def _q_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Bounded-staleness as-of over the event stream itself: each
    # purchase pairs with the same user's latest CLICK in the preceding
    # hour — clicks older than the tolerance are no-match (NULL), the
    # "attribute the purchase to a recent click, else organic" shape.
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    joined = asof_join(
        purchases,
        clicks,
        left_on="user_id",
        right_on="c_user",
        left_time="ts",
        right_time="c_ts",
        right_values=["click_id"],
        tolerance="6 HOURS",
    )
    return (
        joined.select("event_id", "click_id")
        .orderBy("event_id")
        .limit(300)
    )


_ASOF_TOL_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id,
       (SELECT c.click_id FROM c
         WHERE c.user_id = p.user_id
           AND c.ts <= p.ts
           AND c.ts >= p.ts - INTERVAL 6 HOURS
         ORDER BY c.ts DESC, c.click_id DESC LIMIT 1) AS click_id
FROM p ORDER BY p.event_id LIMIT 300
"""

QUERIES["q116_asof_tolerance"] = QuerySpec(_q_asof_tolerance, _ASOF_TOL_ORACLE)
