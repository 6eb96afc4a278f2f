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
    direction: str = "backward",
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

    ``direction`` (pandas ``merge_asof`` parity): ``"backward"``
    (default, above), ``"forward"`` (FIRST right row at-or-after — or
    strictly after if inclusive=False), ``"nearest"`` (closer of the
    two; exact tie → backward, the pandas rule; inclusive only).
    Forward/nearest reuse the SAME single sort: the backward carry is
    a running last() and the forward carry a running first() over two
    frames of one window ordering — still |L|+|R| rows, one shuffle.
    Determinism on (key, time)-identical right rows: backward picks
    the MAX value struct, forward the MIN (first in ascending order) —
    mirror the same rule in any oracle.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    if direction == "nearest" and not inclusive:
        raise ValueError(
            "asof_join: direction='nearest' supports inclusive=True only "
            "(the single-sort plan cannot exclude exact matches from just "
            "one side of the nearest comparison)"
        )
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
    if direction == "backward":
        tie = F.asc("_side") if inclusive else F.desc("_side")
    else:
        # rights sort BEFORE lefts at equal time: the backward frame
        # sees them (exact matches), the forward frame (currentRow →)
        # is strictly-after — forward-inclusive recovers exact matches
        # from the backward carry below
        tie = F.asc("_side")
    order = [F.asc("_t"), tie, F.asc("_rv")]
    w_back = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r)
    if direction == "backward":
        carried = merged.select(
            "*", F.last("_rv", ignorenulls=True).over(w_back).alias("_asof")
        )
    else:
        w_fwd = (
            Window.partitionBy("_k")
            .orderBy(*order)
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        back = F.last("_rv", ignorenulls=True).over(w_back)
        fwd = F.first("_rv", ignorenulls=True).over(w_fwd)
        if direction == "forward":
            asof = (
                F.when(back.getField("_rt") == F.col("_t"), back).otherwise(fwd)
                if inclusive
                else fwd
            )
        else:  # nearest: closer wins, exact tie → backward (pandas rule)
            db = F.col("_t").cast("timestamp").cast("double") - back.getField(
                "_rt"
            ).cast("timestamp").cast("double")
            df_ = fwd.getField("_rt").cast("timestamp").cast(
                "double"
            ) - F.col("_t").cast("timestamp").cast("double")
            asof = (
                F.when(back.isNull(), fwd)
                .when(fwd.isNull(), back)
                .when(df_ < db, fwd)
                .otherwise(back)
            )
        carried = merged.select("*", asof.alias("_asof"))
    picked = carried.filter(F.col("_side") == 1)
    if tolerance is not None:
        lo = F.col("_t") - F.expr(f"INTERVAL {tolerance}")
        hi = F.col("_t") + F.expr(f"INTERVAL {tolerance}")
        if direction == "backward":
            fresh = F.col("_asof._rt") >= lo
        elif direction == "forward":
            fresh = F.col("_asof._rt") <= hi
        else:
            fresh = F.col("_asof._rt").between(lo, hi)
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


def _q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    # "what does the user do NEXT after a purchase" — each purchase
    # pairs with the same user's FIRST click at-or-after it
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
        direction="forward",
    )
    return joined.select("event_id", "click_id").orderBy("event_id").limit(300)


# tie rules mirrored from the implementation: an exact-time match is
# the minimum >= t so it always wins; among several exact matches the
# MAX id is picked (backward-carry determinism), among strictly-after
# ties the MIN id (forward first())
_ASOF_FWD_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id,
       (SELECT c.click_id FROM c
         WHERE c.user_id = p.user_id AND c.ts >= p.ts
         ORDER BY c.ts ASC,
                  CASE WHEN c.ts = p.ts THEN -c.click_id
                       ELSE c.click_id END ASC
         LIMIT 1) AS click_id
FROM p ORDER BY p.event_id LIMIT 300
"""

QUERIES["q136_asof_forward"] = QuerySpec(_q_asof_forward, _ASOF_FWD_ORACLE)


def _q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    # nearest click on EITHER side of each purchase (tie → backward,
    # the pandas merge_asof rule), staleness-bounded to ±6 hours
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
        direction="nearest",
        tolerance="6 HOURS",
    )
    return joined.select("event_id", "click_id").orderBy("event_id").limit(300)


# nearest = min |Δt|; exact tie prefers the backward side; id ties
# mirror the carries (backward MAX id, forward MIN id at the chosen ts)
_ASOF_NEAREST_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id,
       (SELECT c.click_id FROM c
         WHERE c.user_id = p.user_id
           AND c.ts BETWEEN p.ts - INTERVAL 6 HOURS
                        AND p.ts + INTERVAL 6 HOURS
         ORDER BY abs(epoch(c.ts) - epoch(p.ts)) ASC,
                  (c.ts > p.ts) ASC,
                  CASE WHEN c.ts <= p.ts THEN -c.click_id
                       ELSE c.click_id END ASC
         LIMIT 1) AS click_id
FROM p ORDER BY p.event_id LIMIT 300
"""

QUERIES["q137_asof_nearest"] = QuerySpec(_q_asof_nearest, _ASOF_NEAREST_ORACLE)
