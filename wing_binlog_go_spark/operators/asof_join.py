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
) -> DataFrame:
    """For each left row: the right row with max right_time ≤ left_time
    (or < if inclusive=False) within the same key. Left rows with no
    match carry NULLs.
    """
    lcols = [c for c in left.columns]
    # ALL right values travel as ONE struct: last(ignorenulls) then picks
    # the whole latest right ROW atomically — per-column carries would
    # skip a NULL member and stitch together values from different rows.
    rv_struct = F.struct(*[F.col(c) for c in right_values])
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
    return (
        carried.filter(F.col("_side") == 1)
        .select(
            *lcols,
            *[F.col(f"_asof.{c}").alias(c) for c in right_values],
        )
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
